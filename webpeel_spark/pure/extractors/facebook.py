"""Facebook Marketplace extractor (ee/extractors/facebook.ts:1-59 port):
login-wall fallback.  Pure function of the URL."""

from __future__ import annotations

import re
from urllib.parse import parse_qs, urlsplit

from .shared_util import encode_uri_component

_LOCATION_RE = re.compile(r"/marketplace/([^/]+)(?:/|$)")


def facebook_marketplace_extractor(html: str, url: str):
    from . import DomainExtractResult

    u = urlsplit(url)
    if "/marketplace" not in u.path:
        return None

    qs = parse_qs(u.query)
    query = (qs.get("query") or [""])[0]
    max_price = (qs.get("maxPrice") or [""])[0]
    min_price = (qs.get("minPrice") or [""])[0]

    loc_m = _LOCATION_RE.search(u.path)
    location = ""
    if loc_m and loc_m.group(1) not in ("search", "category"):
        location = loc_m.group(1)

    price_range = " – ".join(
        p for p in (f"${min_price}" if min_price else "",
                    f"${max_price}" if max_price else "") if p)

    lines = [
        "# 🛒 Facebook Marketplace",
        "",
        f"**Search:** {query or 'Browse all'}",
    ]
    if location:
        lines.append(f"**Location:** {location}")
    if price_range:
        lines.append(f"**Price range:** {price_range}")
    lines += [
        "",
        "> ⚠️ Facebook Marketplace requires authentication. WebPeel "
        "cannot access listings directly.",
        "",
        "**Alternative searches that work:**",
    ]

    if query:
        cl_url = ("https://newyork.craigslist.org/search/sss?query="
                  + encode_uri_component(query)
                  + (f"&max_price={max_price}" if max_price else ""))
        cars_url = ("https://www.cars.com/shopping/results/?keyword="
                    + encode_uri_component(query)
                    + f"&list_price_max={max_price or ''}"
                    + "&zip=10001&stock_type=used")
        ebay_url = ("https://www.ebay.com/sch/i.html?_nkw="
                    + encode_uri_component(query)
                    + (f"&_udhi={max_price}" if max_price else "")
                    + "&LH_BIN=1")
        lines += [
            f'- `webpeel "{cl_url}"` — Craigslist',
            f'- `webpeel "{cars_url}"` — Cars.com',
            f'- `webpeel "{ebay_url}"` — eBay',
        ]

    lines += ["", "*Tip: Craigslist and Cars.com return full structured "
                  "results with WebPeel.*"]

    return DomainExtractResult(
        domain="facebook.com",
        type="blocked",
        structured={
            "query": query,
            "location": location,
            "minPrice": min_price,
            "maxPrice": max_price,
            "reason": "authentication required",
            "alternatives": ["craigslist", "cars.com", "ebay"],
        },
        clean_content="\n".join(lines),
    )
