"""Google Flights extractor (ee/extractors/google-flights.ts:1-187
port).  Google Flights is a SPA; the reference parses the
readability-processed markdown/text representation with a line-oriented
state machine (depart time anchors a look-ahead window for arrival,
airline, duration, airports, stops, bags, price)."""

from __future__ import annotations

import re
from urllib.parse import parse_qs, urlsplit

from .shared_util import encode_uri_component, js_parse_int_commas

AIRLINES = ["United", "Delta", "American", "JetBlue", "Spirit", "Frontier",
            "Southwest", "Breeze", "Alaska", "Hawaiian", "Sun Country",
            "Avelo"]

_BOOKING_URLS = {
    "United": "https://www.united.com",
    "Delta": "https://www.delta.com",
    "JetBlue": "https://www.jetblue.com",
    "American": "https://www.aa.com",
    "Spirit": "https://www.spirit.com",
    "Frontier": "https://www.flyfrontier.com",
    "Southwest": "https://www.southwest.com",
    "Breeze": "https://www.flybreeze.com",
    "Alaska": "https://www.alaskaair.com",
    "Hawaiian": "https://www.hawaiianairlines.com",
    "Sun Country": "https://www.suncountry.com",
    "Avelo": "https://www.aveloair.com",
}

_DEPART_RE = re.compile(r"^(?:-\s+)?(\d{1,2}:\d{2}\s*[AP]M)$")
_DATE_RE = re.compile(r"on\s+(\w+,\s+\w+\s+\d+)")
_ARR_DASH_RE = re.compile(r"^[–\-—]\s*(\d{1,2}:\d{2}\s*[AP]M)$")
_ARR_ON_RE = re.compile(r"^(\d{1,2}:\d{2}\s*[AP]M)\s+on\s")
_DURATION_RE = re.compile(r"^\d+\s+hr\s+\d+\s+min$")
_AIRPORT_RE = re.compile(r"^[A-Z]{3}$")
_STOPS_RE = re.compile(r"^\d+\s+stop")
_PRICE_RE = re.compile(r"^\$(\d[\d,]*)$")


def strip_html_to_lines_text(text: str) -> str:
    """google-flights.ts:26-37 — raw-HTML → newline-separated text."""
    text = re.sub(r"<script[^>]*>[\s\S]*?</script>", "", text, flags=re.I)
    text = re.sub(r"<style[^>]*>[\s\S]*?</style>", "", text, flags=re.I)
    text = re.sub(r"<[^>]+>", "\n", text)
    text = (text.replace("&amp;", "&").replace("&lt;", "<")
                .replace("&gt;", ">"))
    text = re.sub(r"&#\d+;", "", text)
    text = re.sub(r"\n{2,}", "\n", text)
    return text


def _booking_url(airline: str, from_ap: str, to_ap: str, date_str: str) -> str:
    """google-flights.ts:123-145."""
    if airline in _BOOKING_URLS:
        return _BOOKING_URLS[airline]
    q = f"{airline} flights {from_ap.upper()} to {to_ap.upper()} {date_str}"
    return ("https://www.google.com/travel/flights?q="
            + encode_uri_component(q))


def google_flights_extractor(html: str, url: str):
    from . import DomainExtractResult

    if "/travel/flights" not in url:
        return None

    text = html
    if "<!DOCTYPE" in text or "<html" in text:
        text = strip_html_to_lines_text(text)

    lines = [l.strip() for l in text.split("\n") if l.strip()]

    flights = []
    for i, line in enumerate(lines):
        dm = _DEPART_RE.match(line)
        if not dm:
            continue
        depart_time = dm.group(1)
        depart_date = arrive_time = airline = duration = ""
        from_airport = to_airport = stops = bags = ""
        price = 0

        for j in range(i + 1, min(i + 45, len(lines))):
            l = lines[j]

            date_m = _DATE_RE.search(l)
            if date_m and not depart_date:
                depart_date = date_m.group(1)
                continue

            arr_m = _ARR_DASH_RE.match(l) or _ARR_ON_RE.match(l)
            if arr_m and not arrive_time and depart_time:
                arrive_time = arr_m.group(1)
                continue

            if not airline:
                for a in AIRLINES:
                    if (l == a or l.startswith(a + "Operated")
                            or l.startswith(a + " ")):
                        airline = a
                        break
                if airline:
                    continue

            if not duration and _DURATION_RE.match(l):
                duration = l
                continue

            if _AIRPORT_RE.match(l) and not from_airport:
                from_airport = l
                continue
            if (_AIRPORT_RE.match(l) and from_airport and not to_airport
                    and l != from_airport):
                to_airport = l
                continue

            if not stops and (l == "Nonstop" or _STOPS_RE.match(l)):
                stops = l
                continue

            if "carry-on bag" in l and not bags:
                bags = ("Carry-on NOT included (extra fee)"
                        if "not included" in l else "Carry-on included")
                continue

            pm = _PRICE_RE.match(l)
            if pm and not price:
                price = js_parse_int_commas(pm.group(1))
                break

        if depart_time and arrive_time and airline and price:
            flights.append({
                "departTime": depart_time, "arriveTime": arrive_time,
                "departDate": depart_date, "airline": airline,
                "duration": duration, "fromAirport": from_airport,
                "toAirport": to_airport, "stops": stops or "Unknown",
                "price": price, "priceStr": f"${price}", "bags": bags,
            })

    seen = set()
    unique = []
    for f in flights:
        key = f"{f['departTime']}-{f['airline']}-{f['price']}"
        if key in seen:
            continue
        seen.add(key)
        unique.append(f)

    if not unique:
        return None
    unique.sort(key=lambda f: f["price"])

    u = urlsplit(url)
    q_raw = (parse_qs(u.query).get("q") or [""])[0]
    # JS .replace without /g: first match only
    query = re.sub(r"Flights?\s+(from\s+)?", "", q_raw, count=1,
                   flags=re.I)
    query = re.sub(r"\s+one\s+way", "", query, count=1, flags=re.I).strip()

    md = [
        f"# ✈️ Flights — {query or 'Search Results'}",
        "",
        f"*{len(unique)} flights found · Source: [Google Flights]({url})*",
        "*Prices include taxes + fees for 1 adult. Book directly via "
        "airline.*",
        "",
    ]
    for idx, f in enumerate(unique):
        booking_url = _booking_url(f["airline"], f["fromAirport"],
                                   f["toAirport"], f["departDate"])
        md.append(f"## {idx + 1}. {f['airline']} — {f['priceStr']}")
        date_part = f" · {f['departDate']}" if f["departDate"] else ""
        md.append(f"🕐 Depart **{f['departTime']}** → Arrive "
                  f"**{f['arriveTime']}**{date_part}")
        md.append(f"🛫 {f['fromAirport']} → {f['toAirport']} · "
                  f"{f['duration']} · {f['stops']}")
        if f["bags"]:
            md.append(f"🧳 {f['bags']}")
        md.append(f"🔍 [See price on Google Flights]({url})")
        md.append(f"🛒 [Book on {f['airline']}]({booking_url})")
        md.append("")

    md.append("---")
    md.append(f"📌 *All prices verified via [Google Flights]({url}). "
              f'Click "See price" to confirm, then book directly with '
              f"the airline.*")

    return DomainExtractResult(
        domain="google.com/travel/flights",
        type="flights",
        structured={"flights": unique, "route": query,
                    "source": "Google Flights", "sourceUrl": url},
        clean_content="\n".join(md),
    )
