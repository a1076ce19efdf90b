"""Transit price-verdict builder
(server/routes/smart-search/handlers/transit-verdict.ts:1-288).

Pure fold over transit search-result rows: price/provider extraction
(provider-name patterns, plain-amount fallback with domain
attribution), per-provider-per-leg dedup keeping the lowest price,
booking-site preference, round-trip totals only when both legs have
real data, confidence tiers and caveats — the same pure-logic-in-a-
route-handler class as the r5 selective-evidence port.  Batch face: a
verdict per (query, result-set) group over a search-results table.
Reference suite (19 cases) ported in tests/test_transit_verdict_ref.py.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

# transit-verdict.ts:19-24
BOOKING_DOMAINS = frozenset((
    "wanderu.com", "flixbus.com", "greyhound.com", "busbud.com",
    "amtrak.com", "rome2rio.com", "megabus.com", "ourbus.com",
    "gotobus.com", "trailways.com", "peterpanbus.com", "coachrun.com",
))

# transit-verdict.ts:27-42
PROVIDER_NAMES = {
    "flixbus": "FlixBus", "greyhound": "Greyhound", "megabus": "Megabus",
    "amtrak": "Amtrak", "ourbus": "OurBus", "wanderu": "Wanderu",
    "busbud": "Busbud", "rome2rio": "Rome2Rio",
    "peterpanbus": "Peter Pan Bus", "peterpan": "Peter Pan Bus",
    "gotobus": "GotoBus", "coachrun": "CoachRun",
    "trailways": "Trailways", "boltbus": "BoltBus", "vamoose": "Vamoose",
}

_PROVIDER_KEYS = "|".join(PROVIDER_NAMES)
_PROVIDER_PRICE_RE = re.compile(
    r"(?:(%s)[^$]{0,30}\$(\d+(?:\.\d{1,2})?))"
    r"|(?:\$(\d+(?:\.\d{1,2})?)[^\n]{0,30}(%s))"
    % (_PROVIDER_KEYS, _PROVIDER_KEYS), re.I)
_PLAIN_PRICE_RE = re.compile(r"\$(\d+(?:\.\d{1,2})?)")


def _title_case(s: str) -> str:
    """transit-verdict.ts:128-133."""
    return " ".join(p[:1].upper() + p[1:] for p in s.split() if p)


def extract_prices_from_source(source: Dict[str, Any],
                               leg: str) -> List[Dict[str, Any]]:
    """transit-verdict.ts:71-126."""
    prices: List[Dict[str, Any]] = []
    text = f"{source['title']} {source['snippet']} {source['content']}"
    is_booking = source["domain"] in BOOKING_DOMAINS
    domain_provider = re.sub(r"\.com$|\.net$|\.org$", "",
                             source["domain"])
    fallback = PROVIDER_NAMES.get(domain_provider,
                                  _title_case(domain_provider))
    for m in _PROVIDER_PRICE_RE.finditer(text):
        provider_key = (m.group(1) or m.group(4) or "").lower()
        price = float(m.group(2) or m.group(3))
        if 0 < price < 1000 and provider_key in PROVIDER_NAMES:
            prices.append({"provider": PROVIDER_NAMES[provider_key],
                           "price": price, "currency": "USD",
                           "url": source["url"],
                           "isBookingSite": is_booking, "leg": leg})
    if not prices:
        for m in _PLAIN_PRICE_RE.finditer(text):
            price = float(m.group(1))
            if 0 < price < 1000:
                prices.append({"provider": fallback, "price": price,
                               "currency": "USD", "url": source["url"],
                               "isBookingSite": is_booking, "leg": leg})
    return prices


def _dedup(prices: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """transit-verdict.ts:138-149 — lowest per (provider, leg), price
    ascending."""
    by_key: Dict[str, Dict[str, Any]] = {}
    for p in prices:
        key = f"{p['provider'].lower()}|{p['leg']}"
        existing = by_key.get(key)
        if existing is None or p["price"] < existing["price"]:
            by_key[key] = p
    return sorted(by_key.values(), key=lambda p: p["price"])


def build_transit_verdict(inp: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    """transit-verdict.ts:166-288 — TransactionalVerdict dict or None
    when no usable prices exist."""
    sources = inp["transitSources"]
    pq = inp["parsedQuery"]
    origin, destination = pq["origin"], pq["destination"]
    is_round_trip, mode = pq["isRoundTrip"], pq["mode"]
    depart_date, return_date = pq["departDate"], pq["returnDate"]
    if not sources:
        return None

    all_prices: List[Dict[str, Any]] = []
    for src in sources:
        reverse = (f"{destination.lower()} to {origin.lower()}"
                   if origin and destination else None)
        is_return = src.get("legHint") == "return" or (
            bool(origin and destination)
            and (reverse in src["content"].lower()
                 or reverse in src["title"].lower()))
        leg = src.get("legHint") or (
            "return" if is_return
            else ("outbound" if origin and destination else "unknown"))
        all_prices.extend(extract_prices_from_source(src, leg))
    if not all_prices:
        return None

    unique = _dedup(all_prices)
    outbound = [p for p in unique if p["leg"] in ("outbound", "unknown")]
    return_leg = [p for p in unique if p["leg"] == "return"]

    def to_option(p: Dict[str, Any]) -> Dict[str, Any]:
        return {
            "provider": p["provider"], "price": p["price"],
            "currency": p["currency"],
            "route": (f"{_title_case(origin)} → {_title_case(destination)}"
                      if origin and destination else None),
            "url": p["url"],
            "notes": ("Booking site" if p["isBookingSite"]
                      else "Price from search results"),
        }

    booking = [p for p in outbound if p["isBookingSite"]]
    best = booking[0] if booking else (outbound[0] if outbound else None)
    if best is None:
        return None

    best_option = to_option(best)
    max_alt = max(best["price"] * 3, best["price"] + 75)
    alternatives = [
        to_option(p) for p in outbound
        if not (p["provider"] == best["provider"]
                and p["price"] == best["price"])
        and p["price"] <= max_alt
    ][:5]

    route_label = (f"{_title_case(origin)} → {_title_case(destination)}"
                   if origin and destination else "this route")
    headline = (f"Cheapest I found is ${best['price']:.2f} on "
                f"{best['provider']} for {route_label}")

    totals = None
    if is_round_trip:
        totals = {"oneWayLowest": best["price"], "currency": "USD"}
        if return_leg:
            totals["returnLowest"] = return_leg[0]["price"]
            totals["roundTripLowest"] = best["price"] + \
                return_leg[0]["price"]

    booking_provider_count = len(
        {p["provider"].lower() for p in unique if p["isBookingSite"]})
    if booking_provider_count >= 2 and len(unique) >= 3:
        confidence = "HIGH"
    elif booking_provider_count >= 1 or len(unique) >= 2:
        confidence = "MEDIUM"
    else:
        confidence = "LOW"

    caveats = ["Prices may vary by date and availability. Book directly "
               "for confirmed pricing."]
    if not depart_date:
        caveats.append("No specific date detected — prices shown are "
                       "general/representative.")
    if is_round_trip and not return_leg:
        caveats.append("Could not find separate return leg pricing. "
                       "Round-trip total unavailable.")
    if booking_provider_count == 0:
        caveats.append("No booking site prices found — prices extracted "
                       "from search snippets only.")

    out = {
        "vertical": "transit", "headline": headline,
        "confidence": confidence, "bestOption": best_option,
        "alternatives": alternatives, "caveats": caveats,
        "query": {
            "origin": origin or None, "destination": destination or None,
            "departDate": depart_date or None,
            "returnDate": return_date or None,
            "isRoundTrip": is_round_trip, "mode": mode,
        },
    }
    if totals is not None:
        out["totals"] = totals
    return out
