"""Etsy extractor (ee/extractors/etsy.ts:1-60 port): bot-block fallback
with Google site-search suggestion.  Pure function of the URL."""

from __future__ import annotations

import re
from urllib.parse import parse_qs, unquote, urlsplit

from .shared_util import encode_uri_component

_SEARCH_PATH_RE = re.compile(r"/search/([^?#]+)")
_SHOP_RE = re.compile(r"^/shop/([^/?#]+)")


def etsy_extractor(html: str, url: str):
    from . import DomainExtractResult

    u = urlsplit(url)
    qs = parse_qs(u.query)
    query = (qs.get("q") or [""])[0]
    if not query:
        m = _SEARCH_PATH_RE.search(u.path)
        if m:
            # etsy.ts:15 — hyphens → spaces BEFORE percent-decoding
            query = unquote(m.group(1).replace("-", " "))
    shop_m = _SHOP_RE.match(u.path)
    shop_name = shop_m.group(1) if shop_m else ""

    if not query and not shop_name:
        return None

    target = query if query else shop_name
    google_url = ("https://www.google.com/search?q=site:etsy.com+"
                  + encode_uri_component(target))
    etsy_search_url = (
        "https://www.etsy.com/search?q=" + encode_uri_component(query)
        if query else url
    )
    display_title = f'"{query}"' if query else f"Shop: {shop_name}"

    lines = [
        f"# 🎨 Etsy — {display_title}",
        "",
        "> ⚠️ Etsy blocks automated access. WebPeel cannot scrape "
        "listings directly.",
        "",
        "**Alternatives that work:**",
        f'- `webpeel "{google_url}"` — Google site:etsy.com results',
        f"- Direct link: [etsy.com/search?q="
        f"{encode_uri_component(query or shop_name)}]({etsy_search_url})",
        "",
    ]
    if query:
        lines += [
            "**Similar items on open marketplaces:**",
            f'- `webpeel "https://www.ebay.com/sch/i.html?_nkw='
            f'{encode_uri_component(query)}&LH_BIN=1"` — eBay',
            f'- `webpeel "https://newyork.craigslist.org/search/sss?query='
            f'{encode_uri_component(query)}"` — Craigslist',
        ]
    lines += [
        "",
        "*Etsy Open API v3 (free key at etsy.com/developers) can unlock "
        "direct access.*",
    ]

    return DomainExtractResult(
        domain="etsy.com",
        type="blocked",
        structured={
            "query": query,
            "shopName": shop_name,
            "reason": "bot-block",
            "googleFallback": google_url,
        },
        clean_content="\n".join(lines),
    )
