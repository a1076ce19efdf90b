"""Zillow extractor (ee/extractors/zillow.ts:150-302 port) — Zillow
blocks bots, so the reference redirects users to Redfin (same MLS
data).  The live-listings enrichment (fetchRedfinListings,
zillow.ts:43-64) calls Redfin's network API at fetch time; a batch
engine over stored pages cannot make executor-side network calls, so
this port takes the reference's no-payload path — exactly what the
reference emits when the API returns null.  ``format_redfin_listings``
(zillow.ts:66-148) is the pure formatter for a fetched payload, ported
for parity and exercised with fixture payloads in tests."""

from __future__ import annotations

import re
from urllib.parse import parse_qs, urlsplit

from .shared_util import encode_uri_component, js_number_locale

_CITY_STATE_RE = re.compile(r"^([a-z][a-z-]*[a-z])-([a-z]{2})$", re.I)
_HOMEDETAILS_RE = re.compile(r"homedetails/(.+?)/(\d+)_zpid")

# zillow.ts:176-189 — Redfin city region ids for the live-API branch;
# kept for parity with the redfin extractor's marketKey lookup.
CITY_REGION_MAP = {
    "NY-New-York": 30749, "NY-Brooklyn": 30749, "NY-Queens": 30749,
    "NY-Bronx": 30749, "NY-Staten-Island": 30749, "NY-Manhattan": 30749,
    "CA-Los-Angeles": 11203, "CA-San-Francisco": 17151,
    "CA-San-Diego": 18142, "CA-San-Jose": 17420,
    "TX-Houston": 30772, "TX-Dallas": 35799, "TX-Austin": 30818,
    "FL-Miami": 10201, "FL-Orlando": 13140, "FL-Tampa": 18280,
    "IL-Chicago": 29470, "WA-Seattle": 16163, "MA-Boston": 1826,
    "AZ-Phoenix": 14240, "PA-Philadelphia": 13364, "GA-Atlanta": 30756,
    "CO-Denver": 11093, "MN-Minneapolis": 18959, "OR-Portland": 14941,
    "NV-Las-Vegas": 32820, "NC-Charlotte": 3105, "OH-Columbus": 8528,
}


def _cap(w: str) -> str:
    """JS `w.charAt(0).toUpperCase() + w.slice(1)`."""
    return (w[:1].upper() + w[1:]) if w else w


def zillow_extractor(html: str, url: str):
    from . import DomainExtractResult

    try:
        u = urlsplit(url)
        raw_path = re.sub(r"^/", "", u.path)
        raw_path = re.sub(r"/$", "", raw_path)
        path_parts = [p for p in raw_path.split("/") if p]
        city_state_part = path_parts[0] if path_parts else ""

        # ── Pattern 1: /city-state/ (zillow.ts:160) ──────────────────
        m = _CITY_STATE_RE.match(city_state_part)
        if m:
            city_slug = m.group(1).lower()
            state_code = m.group(2).upper()
            city_name = " ".join(_cap(w) for w in city_slug.split("-"))
            city_for_url = "-".join(_cap(w) for w in city_slug.split("-"))

            qs = parse_qs(u.query)
            price_max = (qs.get("price_max") or [""])[0]
            price_min = (qs.get("price_min") or [""])[0]

            redfin_city_url = f"https://www.redfin.com/{state_code}/{city_for_url}"
            location_label = f"{city_name}, {state_code}"

            # zillow.ts:191-206: with a known marketId the reference
            # fetches live Redfin listings here; no network in batch →
            # the reference's API-null fallback below (zillow.ts:208+)
            lines = [
                f"# 🏠 Real Estate — {location_label}",
                "",
                "*This URL was fetched via Redfin instead — same MLS "
                "data, better access.*",
                "",
                f"**Location:** {location_label}",
                (f"**Max Price:** ${js_number_locale(price_max)}"
                 if price_max else ""),
                (f"**Min Price:** ${js_number_locale(price_min)}"
                 if price_min else ""),
                "",
                "## 🔗 Search Redfin Directly",
                "",
                f"- **[{city_name} listings on Redfin]({redfin_city_url})**",
                "- [Redfin home page](https://www.redfin.com)",
                "",
                "### How to get live listings:",
                "```",
                f'webpeel "https://www.redfin.com/city/30749/{state_code}/'
                f'{city_for_url}"',
                "```",
                "",
                "*MLS data sourced from Redfin — covers the same "
                "properties as competing real estate portals.*",
                "",
                "---",
                f"*Original URL: [View]({url})*",
            ]
            # zillow.ts:236 .filter(Boolean) — drops the unset price lines
            # (and, faithfully, any other empty line)
            lines = [l for l in lines if l]

            structured = {
                "originalUrl": url,
                "redirectUrl": redfin_city_url,
                "city": city_name,
                "state": state_code,
            }
            if price_max:
                structured["priceMax"] = _js_number(price_max)
            if price_min:
                structured["priceMin"] = _js_number(price_min)

            return DomainExtractResult(
                domain="zillow.com",
                type="redirect-to-redfin",
                structured=structured,
                clean_content="\n".join(lines),
            )

        # ── Pattern 2: /homedetails/ADDRESS/ZPID_zpid/ (zillow.ts:252) ─
        dm = _HOMEDETAILS_RE.search(u.path)
        if dm:
            address_slug = dm.group(1)
            address_readable = address_slug.replace("-", " ")
            redfin_search_url = ("https://www.redfin.com/search#query="
                                 + encode_uri_component(address_readable))
            clean_content = "\n".join([
                f"# 🏠 Property — {address_readable}",
                "",
                "*Redirected from Zillow to Redfin — same MLS data, "
                "better access.*",
                "",
                f"**Address:** {address_readable}",
                "",
                f"**[Search this property on Redfin]({redfin_search_url})**",
                "",
                "---",
                f"*Original Zillow URL: [Open Zillow]({url})*",
            ])
            return DomainExtractResult(
                domain="zillow.com",
                type="redirect-to-redfin",
                structured={
                    "originalUrl": url,
                    "redirectUrl": redfin_search_url,
                    "address": address_readable,
                    "zpid": dm.group(2),
                },
                clean_content=clean_content,
            )

        # ── Fallback (zillow.ts:281) ─────────────────────────────────
        clean_content = "\n".join([
            "# 🏠 Zillow — Real Estate Search",
            "",
            "> ⚠️ Zillow restricts automated access. Use Redfin for the "
            "same MLS data.",
            "",
            "**Better alternatives (same MLS data):**",
            "- [Redfin](https://www.redfin.com) — scrape-friendly, live "
            "MLS listings",
            "- [Realtor.com](https://www.realtor.com) — MLS-powered",
            "- [Homes.com](https://www.homes.com) — newer platform",
            "",
            f"**Original URL:** [Zillow]({url})",
        ])
        return DomainExtractResult(
            domain="zillow.com",
            type="blocked",
            structured={"originalUrl": url, "blocked": True},
            clean_content=clean_content,
        )
    except Exception:
        return None


def _js_number(s: str):
    """JS Number(str) for structured fields (int when integral)."""
    try:
        f = float(s)
    except (TypeError, ValueError):
        return None
    return int(f) if f == int(f) else f


def _fmt(n) -> str:
    """zillow.ts:67 — `$${n.toLocaleString()}` or 'N/A'."""
    return f"${js_number_locale(n)}" if n is not None else "N/A"


def _fmt_num(n) -> str:
    return js_number_locale(n) if n is not None else "N/A"


def format_redfin_listings(homes: list, location_label: str,
                           source_url: str, median_data: dict = None):
    """zillow.ts:66-148 — pure formatter for a Redfin API payload
    (dict-shaped like RedfinHome).  The fetch itself is N/A in batch;
    this is the formatting contract, tested against fixture payloads."""
    from . import DomainExtractResult

    def g(d, *path):
        for k in path:
            if not isinstance(d, dict):
                return None
            d = d.get(k)
        return d

    lines = [
        f"# 🏠 Redfin — {location_label}",
        "",
        f"*Live MLS listings via Redfin · {len(homes)} properties shown*",
        "",
    ]
    if median_data:
        lines.append("## 📊 Market Summary")
        lines.append(f"- **Median Price:** {_fmt(median_data.get('price'))}")
        if median_data.get("sqFt"):
            lines.append(f"- **Median Sq Ft:** {_fmt_num(median_data['sqFt'])}")
        if median_data.get("pricePerSqFt"):
            lines.append(
                f"- **Median $/sqft:** {_fmt(median_data['pricePerSqFt'])}")
        if median_data.get("beds"):
            lines.append(f"- **Median Beds:** {median_data['beds']}")
        if median_data.get("dom"):
            lines.append(f"- **Median Days on Market:** {median_data['dom']}")
        lines.append("")

    lines += ["## 🏡 Listings", ""]

    for h in homes[:20]:
        addr = g(h, "streetLine", "value") or "Address unknown"
        city_state = ", ".join(
            x for x in (h.get("city"), h.get("state"), h.get("zip")) if x)
        price = _fmt(g(h, "price", "value"))
        beds = f"{h['beds']}bd" if h.get("beds") is not None else ""
        baths = f"{h['baths']}ba" if h.get("baths") is not None else ""
        sqft_v = g(h, "sqFt", "value")
        sqft = f"{_fmt_num(sqft_v)} sqft" if sqft_v is not None else ""
        specs = " · ".join(x for x in (beds, baths, sqft) if x)
        status = h.get("mlsStatus") or "Active"
        dom_v = g(h, "dom", "value")
        dom = f"{dom_v} days on market" if dom_v is not None else ""
        badge = ", ".join(
            s.get("sashTypeName") for s in (h.get("sashes") or [])
            if s.get("sashTypeName")) or ""
        prop_url = (f"https://www.redfin.com{h['url']}"
                    if h.get("url") else "")

        lines.append(f"### {addr}")
        if city_state:
            lines.append(f"**{city_state}**")
        lines.append(f"**Price:** {price}  ·  {specs}")
        if status != "Active":
            lines.append(f"**Status:** {status}")
        if dom:
            lines.append(f"**{dom}**")
        if badge:
            lines.append(f"*{badge}*")
        remarks = h.get("listingRemarks")
        if remarks:
            lines.append("")
            tail = "…" if len(remarks) > 200 else ""
            lines.append(f"> {remarks[:200].replace(chr(10), ' ')}{tail}")
        if prop_url:
            lines.append(f"[View on Redfin]({prop_url})")
        lines.append("")

    lines.append("---")
    lines.append(f"*Source: [Redfin]({source_url}) · Data from MLS via "
                 f"Redfin internal API*")

    return DomainExtractResult(
        domain="redfin.com",
        type="real-estate-search",
        structured={
            "location": location_label,
            "count": len(homes),
            "listings": [{
                "address": g(h, "streetLine", "value"),
                "city": h.get("city"),
                "state": h.get("state"),
                "zip": h.get("zip"),
                "price": g(h, "price", "value"),
                "beds": h.get("beds"),
                "baths": h.get("baths"),
                "sqFt": g(h, "sqFt", "value"),
                "yearBuilt": g(h, "yearBuilt", "value"),
                "daysOnMarket": g(h, "dom", "value"),
                "status": h.get("mlsStatus"),
                "url": (f"https://www.redfin.com{h['url']}"
                        if h.get("url") else None),
            } for h in homes[:20]],
            "median": median_data,
        },
        clean_content="\n".join(lines),
    )
