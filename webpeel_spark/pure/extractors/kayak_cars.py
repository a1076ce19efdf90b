"""Kayak car-rental extractor (ee/extractors/kayak-cars.ts:1-292 port).
Line-oriented parse of the readability-processed page text: an
"or similar {Class}" line anchors each listing (car name on the line
before), with a look-ahead window for location, rating, company,
cancellation and the "$NNN / Total" price pair."""

from __future__ import annotations

import re
from datetime import date
from urllib.parse import unquote, urlsplit

from .google_flights import strip_html_to_lines_text
from .shared_util import js_parse_int_commas

RENTAL_COMPANY_URLS = {
    "Hertz": "https://www.hertz.com",
    "Budget": "https://www.budget.com",
    "Avis": "https://www.avis.com",
    "Enterprise": "https://www.enterprise.com",
    "National": "https://www.nationalcar.com",
    "Alamo": "https://www.alamo.com",
    "Dollar": "https://www.dollar.com",
    "Thrifty": "https://www.thrifty.com",
    "Sixt": "https://www.sixt.com",
    "Fox": "https://www.foxrentacar.com",
    "Payless": "https://www.paylesscar.com",
    "Turn": "https://www.turn.com",
    "EconomyBookings": "https://www.economybookings.com",
    "Priceline": "https://www.priceline.com",
    "Expedia": "https://www.expedia.com",
    "Turo": "https://www.turo.com",
    "KAYAK": "https://www.kayak.com",
    "Booking.com": "https://www.booking.com",
    "DiscoverCars": "https://www.discovercars.com",
    "RentalCars": "https://www.rentalcars.com",
    "Car Rental 8": "https://www.carrental8.com",
    "Hotwire": "https://www.hotwire.com",
}

KNOWN_COMPANIES = list(RENTAL_COMPANY_URLS)

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

_DATES_RE = re.compile(r"/cars/([^/]+)/(\d{4}-\d{2}-\d{2})/(\d{4}-\d{2}-\d{2})")
_OR_SIMILAR_RE = re.compile(r"^or similar\s+(.+)$")
_PICKUP_RE = re.compile(r"Pick-up (?:city|airport):\s*(.+)")
_DIST_RE = re.compile(r"^([\d.]+)\s+mi\s+from\s+city\s+center")
_RATING_RE = re.compile(r"^(\d+\.\d+)$")
_OFFER_RE = re.compile(r"offer from (.+)$")
_PRICE_RE = re.compile(r"^\$(\d[\d,]*)$")
_INLINE_PRICE_RE = re.compile(r"\$(\d[\d,]*)\s*Total")
_OR_SIMILAR_MARK_RE = re.compile(r"^or similar\s")
_RESULTS_RE = re.compile(r"^(\d+)\s+results?$")
_CARS_FOUND_RE = re.compile(r"(\d+)\s+cars?\s+found")


def _format_date_range(from_s: str, to_s: str) -> str:
    """kayak-cars.ts:57-68 (e.g. 'Apr 1–3')."""
    if not from_s or not to_s:
        return ""
    fd = date.fromisoformat(from_s)
    td = date.fromisoformat(to_s)
    fm, tm = _MONTHS[fd.month - 1], _MONTHS[td.month - 1]
    if fm == tm:
        return f"{fm} {fd.day}–{td.day}"
    return f"{fm} {fd.day}–{tm} {td.day}"


def _format_location(loc: str) -> str:
    """kayak-cars.ts:216-221 ('Punta-Gorda,FL-c34451' → 'Punta Gorda, FL')."""
    loc = re.sub(r"-c\d+$", "", loc)
    loc = loc.replace("-", " ")
    return re.sub(r",(\S)", r", \1", loc)


def kayak_car_rental_extractor(html: str, url: str):
    from . import DomainExtractResult

    if "/cars/" not in url:
        return None

    num_days = 1
    pickup_date = dropoff_date = location_name = ""
    dm = _DATES_RE.search(url)
    if dm:
        location_name = unquote(dm.group(1))
        pickup_date, dropoff_date = dm.group(2), dm.group(3)
        delta = (date.fromisoformat(dropoff_date)
                 - date.fromisoformat(pickup_date)).days
        num_days = max(1, delta)

    text = html
    if "<!DOCTYPE" in text or "<html" in text:
        text = strip_html_to_lines_text(text)
    lines = [l.strip() for l in text.split("\n") if l.strip()]

    listings = []
    for i, line in enumerate(lines):
        osm = _OR_SIMILAR_RE.match(line)
        if not osm:
            continue
        car_class = osm.group(1).strip()
        car_name = lines[i - 1] if i > 0 else ""
        if not car_name or len(car_name) > 60:
            continue

        location = distance = company = cancellation = ""
        rating = None
        total_price = 0

        for j in range(i + 1, min(i + 30, len(lines))):
            l = lines[j]

            if not location and l.startswith("Pick-up"):
                lm = _PICKUP_RE.search(l)
                if lm:
                    location = lm.group(1).strip()
                continue

            if not distance:
                dist_m = _DIST_RE.match(l)
                if dist_m:
                    distance = f"{dist_m.group(1)} mi from city center"
                    continue

            if rating is None:
                rm = _RATING_RE.match(l)
                if rm:
                    rating = float(rm.group(1))
                    continue

            if not company:
                om = _OFFER_RE.search(l)
                if om:
                    company = om.group(1).strip()
                    continue
                for c in KNOWN_COMPANIES:
                    if l == c:
                        company = c
                        break
                if company:
                    continue

            if not cancellation and ("Free cancellation" in l
                                     or "No free cancellation" in l):
                cancellation = l
                continue

            pm = _PRICE_RE.match(l)
            if pm:
                next_line = lines[j + 1] if j + 1 < len(lines) else ""
                if next_line == "Total" or "Total" in next_line:
                    total_price = js_parse_int_commas(pm.group(1))
                    break

            ipm = _INLINE_PRICE_RE.search(l)
            if ipm:
                total_price = js_parse_int_commas(ipm.group(1))
                break

            if _OR_SIMILAR_MARK_RE.match(l) or l == "Show more results":
                break

        if car_name and total_price > 0:
            # JS String.replace: first occurrence only
            normalized_class = car_class.replace("Full size", "Full-size", 1)
            listings.append({
                "name": car_name,
                "carClass": normalized_class,
                "totalPrice": total_price,
                # JS Math.round — half away from zero for positives
                "perDayPrice": int(total_price / num_days + 0.5),
                "company": company or "Unknown",
                "location": location or "See booking",
                "distanceFromCenter": distance,
                "rating": rating,
                "cancellation": cancellation,
                "isTuro": False,
            })

    by_key = {}
    for c in listings:
        key = f"{c['name'].lower()}-{c['totalPrice']}"
        existing = by_key.get(key)
        if existing is None:
            by_key[key] = c
        elif existing["company"] == "Unknown" and c["company"] != "Unknown":
            by_key[key] = c
    unique = list(by_key.values())

    if not unique:
        return None

    known = [c for c in unique if c["company"] != "Unknown"]
    final = known if known else unique
    final.sort(key=lambda c: c["totalPrice"])

    total_found = len(unique)
    for l in lines:
        m = _RESULTS_RE.match(l)
        if m:
            total_found = int(m.group(1))
            break
        m2 = _CARS_FOUND_RE.search(l)
        if m2:
            total_found = int(m2.group(1))
            break

    date_range = _format_date_range(pickup_date, dropoff_date)
    display_location = _format_location(location_name)
    days_label = "1 day" if num_days == 1 else f"{num_days} days"

    md = [
        f"# 🚗 Car Rentals — {display_location} · {date_range} "
        f"({days_label})",
        "",
        f"*{total_found} cars found · Source: [Kayak]({url})*",
        "*Free cancellation available on most rentals*",
        "",
    ]
    for idx, c in enumerate(final):
        md.append(f"## {idx + 1}. {c['name']} ({c['carClass']}) — "
                  f"${c['totalPrice']} total · ${c['perDayPrice']}/day")
        if c["distanceFromCenter"]:
            md.append(f"📍 {c['distanceFromCenter']}")
        elif c["location"] and c["location"] != "See booking":
            md.append(f"📍 {c['location']}")
        rating_str = (f" · Rating: {_js_num_str(c['rating'])}"
                      if c["rating"] is not None else "")
        md.append(f"🏪 via {c['company']}{rating_str}")
        if c["cancellation"]:
            md.append(f"✅ {c['cancellation']}")
        md.append(f"🔍 [See price on Kayak]({url})")
        md.append(f"🛒 [Book on {c['company']}]"
                  f"({RENTAL_COMPANY_URLS.get(c['company'], 'https://www.kayak.com')})")
        md.append("")

    md.append("---")
    md.append(f"📌 *Prices verified via [Kayak]({url}). Click \"See "
              f"price\" to confirm current rate, then book with the "
              f"rental company.*")

    return DomainExtractResult(
        domain="kayak.com/cars",
        type="car-rental",
        structured={
            "cars": final,
            "location": display_location,
            "pickupDate": pickup_date,
            "dropoffDate": dropoff_date,
            "numDays": num_days,
            "totalFound": total_found,
            "source": "Kayak",
            "sourceUrl": url,
        },
        clean_content="\n".join(md),
    )


def _js_num_str(f: float) -> str:
    """JS template interpolation of a number: 9.0 → '9', 9.2 → '9.2'."""
    return str(int(f)) if f == int(f) else str(f)
