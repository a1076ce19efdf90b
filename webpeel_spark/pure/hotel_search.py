"""Hotel-search pure helpers (hotel-search.ts:60-360).

The multi-site search itself is fetch-driven (peel + extract-listings
over live travel sites — N/A), but everything around the fetches is
pure and reference-suite-tested: relative date parsing, source-URL
construction, price/rating display parsing, cross-source dedup (keep
the richer entry, lower price tiebreak) and the three sort orders.
Batch face: the same normalization/dedup pipeline over a scraped
listings table (the corpus-side of what the live tool assembles
per-query).  Reference suite's 45 pure cases ported in
tests/test_hotel_search_ref.py.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Any, Dict, List, Optional

from .extractors.shared_util import encode_uri_component

_WEEKDAYS = ["sunday", "monday", "tuesday", "wednesday", "thursday",
             "friday", "saturday"]


def _to_iso(d: _dt.date) -> str:
    return f"{d.year:04d}-{d.month:02d}-{d.day:02d}"


def parse_date(value: str, base_date: Optional[_dt.date] = None) -> str:
    """hotel-search.ts:73-114 — ISO passthrough, today/tomorrow,
    'next <weekday>' (same weekday → +7), generic-date fallback,
    else raises ValueError with the reference's message."""
    base = base_date or _dt.date.today()
    normalised = value.strip().lower()
    if normalised == "today":
        return _to_iso(base)
    if normalised == "tomorrow":
        return _to_iso(base + _dt.timedelta(days=1))
    m = re.fullmatch(
        r"next\s+(monday|tuesday|wednesday|thursday|friday|saturday"
        r"|sunday)", normalised)
    if m:
        target = _WEEKDAYS.index(m.group(1))
        current = (base.weekday() + 1) % 7  # JS getDay: Sunday=0
        days_until = target - current
        if days_until <= 0:
            days_until += 7
        return _to_iso(base + _dt.timedelta(days=days_until))
    if re.fullmatch(r"\d{4}-\d{2}-\d{2}", value.strip()):
        return value.strip()
    # generic fallback ≈ new Date(input): ISO datetime prefixes and the
    # common display formats (with and without commas) that JS parses
    stripped = value.strip()
    if re.match(r"^\d{4}-\d{2}-\d{2}[T ]", stripped):
        try:
            return _to_iso(_dt.date.fromisoformat(stripped[:10]))
        except ValueError:
            pass
    for fmt in ("%B %d, %Y", "%b %d, %Y", "%B %d %Y", "%b %d %Y",
                "%m/%d/%Y", "%Y/%m/%d", "%d %B %Y", "%d %b %Y"):
        try:
            return _to_iso(_dt.datetime.strptime(stripped, fmt).date())
        except ValueError:
            continue
    raise ValueError(f'Unrecognized date format: "{value}"')


def add_days(iso_date: str, days: int) -> str:
    """hotel-search.ts:124-132."""
    d = _dt.date.fromisoformat(iso_date) + _dt.timedelta(days=days)
    return _to_iso(d)


def to_kayak_slug(destination: str) -> str:
    """hotel-search.ts:140-145 — 'Manhattan, New York' →
    'Manhattan,New-York'."""
    return ",".join(re.sub(r"\s+", "-", part.strip())
                    for part in destination.split(","))


def build_source_urls(destination: str, checkin: str,
                      checkout: str) -> List[Dict[str, str]]:
    """hotel-search.ts:155-183 — kayak/booking/google/expedia search
    URLs (encodeURIComponent for booking/expedia, '+' for google)."""
    kayak_slug = to_kayak_slug(destination)
    enc = encode_uri_component(destination)
    google_dest = re.sub(r"\s+", "+", destination)
    return [
        {"name": "kayak",
         "url": f"https://www.kayak.com/hotels/{kayak_slug}/{checkin}/"
                f"{checkout}?sort=price_a"},
        {"name": "booking",
         "url": f"https://www.booking.com/searchresults.html?ss={enc}"
                f"&checkin={checkin}&checkout={checkout}&order=price"},
        {"name": "google",
         "url": f"https://www.google.com/travel/hotels/{google_dest}"},
        {"name": "expedia",
         "url": f"https://www.expedia.com/Hotel-Search?destination={enc}"
                f"&startDate={checkin}&endDate={checkout}"
                f"&sort=PRICE_LOW_TO_HIGH"},
    ]


def parse_price(raw: str) -> Optional[float]:
    """hotel-search.ts:199-208 — '$1,299' → 1299, 'US$200' → 200,
    'From $89/night' → 89, None when unparseable."""
    if not raw:
        return None
    cleaned = re.sub(r"US\$|[$£€¥₹]", "", raw).replace(",", "").strip()
    m = re.search(r"(\d+(?:\.\d+)?)", cleaned)
    if not m:
        return None
    return float(m.group(1))


def parse_rating(raw: str) -> Optional[float]:
    """hotel-search.ts:221-243 — 'Scored 8.4' / '4.2/5 (1.4K)' /
    'Very Good 8.6' → the rating number, None when unparseable."""
    if not raw:
        return None
    m = re.search(r"(\d+(?:\.\d+)?)\s*/\s*\d", raw)
    if m:
        return float(m.group(1))
    nums = re.findall(r"(\d+(?:\.\d+)?)", raw)
    if not nums:
        return None
    for n in reversed(nums):
        v = float(n)
        if 0 <= v <= 10:
            return v
    return None


def normalise_to_hotel_result(item: Dict[str, Any],
                              source_name: str) -> Optional[Dict[str, Any]]:
    """hotel-search.ts:249-275 — extracted listing item → HotelResult
    dict, None without a name."""
    name = (item.get("title") or "").strip()
    if not name:
        return None
    price_display = item.get("price") or ""
    rating_display = item.get("rating") or ""
    return {
        "name": name,
        "price": parse_price(price_display),
        "priceDisplay": price_display,
        "rating": parse_rating(rating_display),
        "ratingDisplay": rating_display,
        "source": source_name,
        "link": item.get("link") or "",
        "location": (item.get("description") or "").strip() or None,
        "image": item.get("image") or None,
    }


def deduplicate_hotels(hotels: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """hotel-search.ts:279-310 — by normalized name; keep the entry
    with more data, lower price as tiebreak."""
    by_name: Dict[str, Dict[str, Any]] = {}
    for hotel in hotels:
        key = re.sub(r"\s+", " ", hotel["name"].lower()).strip()
        existing = by_name.get(key)
        if existing is None:
            by_name[key] = hotel
            continue
        score_new = ((hotel["price"] is not None)
                     + (hotel["rating"] is not None))
        score_old = ((existing["price"] is not None)
                     + (existing["rating"] is not None))
        if score_new > score_old:
            by_name[key] = hotel
        elif score_new == score_old:
            if hotel["price"] is not None and (
                    existing["price"] is None
                    or hotel["price"] < existing["price"]):
                by_name[key] = hotel
    return list(by_name.values())


def sort_hotels(hotels: List[Dict[str, Any]],
                sort: str) -> List[Dict[str, Any]]:
    """hotel-search.ts:316-358 — price asc / rating desc / value
    (rating/price) desc, nulls last, input not mutated."""
    out = list(hotels)
    if sort == "price":
        out.sort(key=lambda h: (h["price"] is None,
                                h["price"] if h["price"] is not None else 0))
    elif sort == "rating":
        out.sort(key=lambda h: (h["rating"] is None,
                                -(h["rating"]
                                  if h["rating"] is not None else 0)))
    elif sort == "value":
        def value_of(h):
            if h["price"] is None or h["price"] == 0 \
                    or h["rating"] is None:
                return None
            return h["rating"] / h["price"]

        out.sort(key=lambda h: ((v := value_of(h)) is None,
                                -(v if v is not None else 0)))
    return out
