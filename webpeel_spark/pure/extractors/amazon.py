"""Amazon product extractor (ee/extractors/amazon.ts:8-91 port).

Pure function of (html, url): JSON-LD Product first, then HTML
selectors (#productTitle, .a-price .a-offscreen, #feature-bullets …),
og: meta fallbacks, ASIN from /dp/ URL.
"""

from __future__ import annotations

import json
import re
from typing import Optional

from ...dom import parse_html, select, select_first


def _try_json(raw: str):
    try:
        return json.loads(raw)
    except Exception:
        return None


def amazon_extractor(html: str, url: str):
    from . import DomainExtractResult

    root = parse_html(html)

    json_ld = None
    for el in select(root, 'script[type="application/ld+json"]'):
        if json_ld is not None:
            break
        parsed = _try_json(el.text() or "")
        if isinstance(parsed, dict) and parsed.get("@type") == "Product":
            json_ld = parsed

    def meta(prop: str) -> str:
        el = select_first(root, f'meta[property="{prop}"]')
        return (el.get("content") or "") if el is not None else ""

    og_title = meta("og:title")
    og_description = meta("og:description")
    og_image = meta("og:image")

    def sel_text(selector: str) -> str:
        el = select_first(root, selector)
        return el.text().strip() if el is not None else ""

    title = (
        (json_ld or {}).get("name")
        or sel_text("#productTitle")
        or sel_text("#title")
        or og_title
    )
    if not title:
        return None

    price = (
        sel_text("#priceblock_ourprice")
        or sel_text(".a-price .a-offscreen")
        or ((select_first(root, "[data-asin-price]") or None) and
            (select_first(root, "[data-asin-price]").get("data-asin-price") or ""))
        or ""
    )

    agg = (json_ld or {}).get("aggregateRating") or {}
    rating = (
        (str(agg.get("ratingValue")) if agg.get("ratingValue") is not None else "")
        or sel_text("#acrPopover .a-size-base.a-color-base")
        or sel_text('span[data-hook="rating-out-of-text"]')
        or ""
    )
    review_count = (
        (str(agg.get("reviewCount")) if agg.get("reviewCount") is not None else "")
        or re.sub(r"[^0-9,]", "", sel_text("#acrCustomerReviewText")).strip()
        or ""
    )

    offers = (json_ld or {}).get("offers") or {}
    availability = ""
    if isinstance(offers, dict) and offers.get("availability"):
        availability = str(offers["availability"]).replace("https://schema.org/", "")
    if not availability:
        availability = sel_text("#availability span")

    feature_items = [
        el.text().strip()
        for el in select(root, "#feature-bullets .a-list-item")
        if el.text().strip()
    ]
    description = (
        (json_ld or {}).get("description")
        or "\n".join(feature_items)
        or sel_text("#productDescription p")
        or og_description
    )

    features = []
    for el in select(root, "#feature-bullets li"):
        text = el.text().strip()
        if text and "Make sure this fits" not in text:
            features.append(text)

    asin_m = re.search(r"/dp/([A-Z0-9]{10})", url, re.I)
    asin = asin_m.group(1) if asin_m else ""

    structured = {
        "title": title, "price": price, "rating": rating,
        "reviewCount": review_count, "availability": availability,
        "description": description, "features": features, "asin": asin,
        "image": og_image, "url": url,
    }

    rating_line = (
        f"\n**Rating:** {rating}" + (f" ({review_count} reviews)" if review_count else "")
        if rating else ""
    )
    price_line = f"\n**Price:** {price}" if price else ""
    avail_line = f"\n**Availability:** {availability}" if availability else ""
    features_section = (
        "\n\n## Features\n\n" + "\n".join(f"- {f}" for f in features)
        if features else ""
    )
    desc_section = f"\n\n## Description\n\n{description[:1000]}" if description else ""

    clean_content = f"# 🛒 {title}{price_line}{rating_line}{avail_line}{desc_section}{features_section}"
    return DomainExtractResult("amazon.com", "product", structured, clean_content)
