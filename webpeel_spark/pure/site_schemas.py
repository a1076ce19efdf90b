"""Schema-based site extraction — port of src/core/schema-extraction.ts.

Bundled per-site CSS schemas (Booking/Amazon/eBay/Yelp/Walmart/HN/
Expedia), URL→schema matching, and the schema execution engine
(text/attribute/html/exists field types, transforms, relative-URL
resolution, title junk-stripping, title+price dedup).  This is the
Crawl4AI-style exact-selector path beside the generic listing
auto-detector (pure/listings.py)."""

from __future__ import annotations

import re
from typing import Dict, List, Optional
from urllib.parse import urlsplit

from .urlfast import whatwg_urljoin

from ..dom import Node, parse_html, select, select_first

# schema-extraction.ts:62-186 — bundled schemas, ported verbatim
BUNDLED_SCHEMAS: List[Dict] = [
    {
        "name": "Booking.com Hotel Search",
        "version": "1.0",
        "domains": ["booking.com", "www.booking.com"],
        "urlPatterns": ["searchresults"],
        "baseSelector": "[data-testid='property-card']",
        "fields": [
            {"name": "title", "selector": "[data-testid='title'], .sr-hotel__name, h3 a", "type": "text"},
            {"name": "price", "selector": "[data-testid='price-and-discounted-price'], .bui-price-display__value, [data-testid='price-for-x-nights']", "type": "text", "transform": "trim"},
            {"name": "rating", "selector": "[data-testid='review-score'] div:first-child, .bui-review-score__badge", "type": "text"},
            {"name": "reviewCount", "selector": "[data-testid='review-score'] div:nth-child(2) div:nth-child(2), .bui-review-score__text", "type": "text"},
            {"name": "location", "selector": "[data-testid='address'], .sr_card_address_line", "type": "text"},
            {"name": "link", "selector": "a[data-testid='title-link'], h3 a, a.hotel_name_link", "type": "attribute", "attribute": "href"},
            {"name": "image", "selector": "img[data-testid='image'], img.hotel_image", "type": "attribute", "attribute": "src"},
            {"name": "stars", "selector": "[data-testid='rating-stars'] span, .bui-star-rating .bui-star-rating__star", "type": "text"},
        ],
    },
    {
        "name": "Amazon Product Search",
        "version": "1.0",
        "domains": ["amazon.com", "www.amazon.com", "amazon.co.uk",
                    "amazon.de", "amazon.fr", "amazon.ca"],
        "urlPatterns": ["/s\\?", "/s/"],
        "baseSelector": "[data-component-type='s-search-result']",
        "fields": [
            {"name": "title", "selector": "h2 a span, h2 span a span", "type": "text"},
            {"name": "price", "selector": ".a-price .a-offscreen", "type": "text"},
            {"name": "originalPrice", "selector": ".a-price.a-text-price .a-offscreen", "type": "text"},
            {"name": "rating", "selector": ".a-icon-star-small .a-icon-alt, .a-icon-star-mini .a-icon-alt", "type": "text"},
            {"name": "reviewCount", "selector": "[data-csa-c-func-deps='aui-da-a-popover'] ~ span span, .a-size-base.s-underline-text", "type": "text"},
            {"name": "link", "selector": "h2 a", "type": "attribute", "attribute": "href"},
            {"name": "image", "selector": ".s-image", "type": "attribute", "attribute": "src"},
            {"name": "sponsored", "selector": ".puis-sponsored-label-text", "type": "exists"},
            {"name": "asin", "selector": "", "type": "attribute", "attribute": "data-asin"},
        ],
    },
    {
        "name": "eBay Search Results",
        "version": "1.0",
        "domains": ["ebay.com", "www.ebay.com"],
        "urlPatterns": ["/sch/"],
        "baseSelector": ".s-item, [data-viewport]",
        "fields": [
            {"name": "title", "selector": ".s-item__title span, .s-item__title", "type": "text"},
            {"name": "price", "selector": ".s-item__price", "type": "text"},
            {"name": "link", "selector": ".s-item__link, a.s-item__link", "type": "attribute", "attribute": "href"},
            {"name": "image", "selector": ".s-item__image-wrapper img, .s-item__image img", "type": "attribute", "attribute": "src"},
            {"name": "condition", "selector": ".SECONDARY_INFO", "type": "text"},
            {"name": "shipping", "selector": ".s-item__shipping, .s-item__freeXDays", "type": "text"},
            {"name": "seller", "selector": ".s-item__seller-info-text", "type": "text"},
        ],
    },
    {
        "name": "Yelp Business Search",
        "version": "1.0",
        "domains": ["yelp.com", "www.yelp.com"],
        "urlPatterns": ["/search"],
        "baseSelector": "[data-testid='serp-ia-card'], li.border-color--default",
        "fields": [
            {"name": "title", "selector": "a[href*='/biz/'] span, h3 a span", "type": "text"},
            {"name": "rating", "selector": "[aria-label*='star rating'], .i-stars", "type": "attribute", "attribute": "aria-label"},
            {"name": "reviewCount", "selector": ".reviewCount, span[class*='css-']", "type": "text"},
            {"name": "price", "selector": ".priceRange, span.priceRange", "type": "text"},
            {"name": "category", "selector": ".priceCategory span, p[class*='css-'] a", "type": "text"},
            {"name": "link", "selector": "a[href*='/biz/']", "type": "attribute", "attribute": "href"},
            {"name": "address", "selector": "address, span[class*='css-']", "type": "text"},
        ],
    },
    {
        "name": "Walmart Product Search",
        "version": "1.0",
        "domains": ["walmart.com", "www.walmart.com"],
        "urlPatterns": ["/search"],
        "baseSelector": "[data-testid='list-view'] > div, [data-item-id]",
        "fields": [
            {"name": "title", "selector": "a[link-identifier] span, [data-automation-id='product-title']", "type": "text"},
            {"name": "price", "selector": "[data-automation-id='product-price'] .f2, [itemprop='price']", "type": "text"},
            {"name": "rating", "selector": "[data-testid='product-ratings'] .w_iUH7, .stars-reviews-count", "type": "text"},
            {"name": "link", "selector": "a[link-identifier], a[href*='/ip/']", "type": "attribute", "attribute": "href"},
            {"name": "image", "selector": "img[data-testid='productTileImage'], img[loading]", "type": "attribute", "attribute": "src"},
            {"name": "seller", "selector": "[data-automation-id='fulfillment-badge']", "type": "text"},
        ],
    },
    {
        "name": "Hacker News",
        "version": "1.0",
        "domains": ["news.ycombinator.com"],
        "baseSelector": "tr.athing",
        "fields": [
            {"name": "title", "selector": ".titleline a", "type": "text"},
            {"name": "link", "selector": ".titleline a", "type": "attribute", "attribute": "href"},
            {"name": "rank", "selector": ".rank", "type": "text"},
            {"name": "site", "selector": ".sitestr", "type": "text"},
        ],
    },
    {
        "name": "Expedia Hotel Search",
        "version": "1.0",
        "domains": ["expedia.com", "www.expedia.com"],
        "urlPatterns": ["Hotel-Search", "hotel-search"],
        "baseSelector": "[data-stid='property-listing'], li.uitk-spacing[class*='uitk-spacing'], [data-stid='lodging-card-responsive']",
        "fields": [
            {"name": "title", "selector": "[data-stid='content-hotel-title'], .uitk-heading-5, .uitk-heading-6, h3[class*='uitk-heading']", "type": "text"},
            {"name": "price", "selector": "[data-stid='price-summary'] .uitk-type-500, [data-stid='price-summary-message-total'], .uitk-type-500", "type": "text", "transform": "trim"},
            {"name": "rating", "selector": "[data-stid='star-rating-msg'], .uitk-badge-base, [aria-label*='out of']", "type": "text"},
            {"name": "reviewCount", "selector": "[data-stid='review-info-text'], .uitk-type-200", "type": "text"},
            {"name": "location", "selector": "[data-stid='location-info'], [data-stid='neighborhood-name']", "type": "text"},
            {"name": "link", "selector": "a[data-stid='open-hotel-information'], a[href*='/h/'], a.uitk-card-link", "type": "attribute", "attribute": "href"},
            {"name": "image", "selector": "img[data-stid='image'], .uitk-image-media img", "type": "attribute", "attribute": "src"},
        ],
    },
]

_TITLE_JUNK_RE = re.compile(
    r"\s*Opens?\s+in\s+(?:a\s+)?new\s+(?:window|tab)"
    r"(?:\s+or\s+(?:window|tab))?", re.I)
_TITLE_PREFIX_RE = re.compile(
    r"^(?:New\s+Listing|Sponsored|Ad)\s*[-–—:·]?\s*", re.I)


def load_bundled_schemas() -> List[Dict]:
    """schema-extraction.ts:252."""
    return list(BUNDLED_SCHEMAS)


def find_schema_for_url(url: str) -> Optional[Dict]:
    """schema-extraction.ts:262-300 — domain match then urlPatterns."""
    try:
        hostname = (urlsplit(url).hostname or "").lower()
    except ValueError:
        return None
    if not hostname:
        return None
    for schema in BUNDLED_SCHEMAS:
        domain_match = any(
            hostname == d.lower()
            or hostname.endswith("." + d.lower())
            or d.lower().endswith("." + hostname)
            for d in schema["domains"]
        )
        if not domain_match:
            continue
        patterns = schema.get("urlPatterns")
        if not patterns:
            return schema
        for pattern in patterns:
            try:
                if re.search(pattern, url):
                    return schema
            except re.error:
                continue
    return None


def _apply_transform(value: str, transform: Optional[str]):
    """schema-extraction.ts:196-211."""
    if not transform:
        return value
    if transform == "trim":
        return value.strip()
    if transform == "number":
        cleaned = re.sub(r"[^\d.]", "", value)
        try:
            return float(cleaned)
        except ValueError:
            return value
    if transform == "stripCurrency":
        return re.sub(r"[^\d.,]", "", value).strip()
    return value


def _resolve_url(href: Optional[str], base_url: Optional[str]) -> Optional[str]:
    """schema-extraction.ts:216-226."""
    if not href:
        return None
    if href.startswith(("data:", "javascript:")):
        return None
    if not base_url:
        return href
    out = whatwg_urljoin(base_url, href, require_http=False)
    return href if out is None else out


def _extract_field(el: Node, field: Dict, base_url: Optional[str]):
    """schema-extraction.ts:231-302 (extractFieldValue)."""
    selector = (field.get("selector") or "").strip()
    use_base = selector == ""
    ftype = field["type"]

    if field.get("multiple") and not use_base:
        results: List[str] = []
        for match in select(el, selector):
            val: Optional[str] = None
            if ftype == "text":
                val = match.text().strip()
            elif ftype == "attribute":
                attr = field.get("attribute")
                val = match.get(attr) if attr else None
                if attr in ("href", "src"):
                    val = _resolve_url(val, base_url)
            elif ftype == "html":
                val = match.inner_html()
            if val:
                results.append(val)
        return results or None

    target = el if use_base else select_first(el, selector)

    if ftype == "exists":
        return True if use_base else (select_first(el, selector) is not None)

    if ftype == "text":
        if not use_base and target is None:
            return None
        text = target.text().strip()
        if text == "":
            return None
        return _apply_transform(text, field.get("transform"))

    if ftype == "attribute":
        attr = field.get("attribute")
        if not attr or target is None:
            return None
        attr_val = target.get(attr)
        if attr_val is None:
            return None
        if attr in ("href", "src"):
            resolved = _resolve_url(attr_val, base_url)
            if not resolved:
                return None
            return _apply_transform(resolved, field.get("transform"))
        return _apply_transform(attr_val, field.get("transform"))

    if ftype == "html":
        if not use_base and target is None:
            return None
        return target.inner_html()

    return None


def extract_with_schema(html: str, schema: Dict,
                        base_url: Optional[str] = None) -> List[Dict]:
    """schema-extraction.ts:312-384 (extractWithSchema)."""
    if not html or not html.strip():
        return []
    root = parse_html(html)
    items: List[Dict] = []

    title_field = next(
        (f["name"] for f in schema["fields"]
         if f["name"] in ("title", "name")), None)

    for el in select(root, schema["baseSelector"]):
        item: Dict = {}
        for field in schema["fields"]:
            value = _extract_field(el, field, base_url)
            if value is not None:
                item[field["name"]] = value

        if title_field is not None and isinstance(item.get(title_field), str):
            title = _TITLE_JUNK_RE.sub("", item[title_field])
            title = _TITLE_PREFIX_RE.sub("", title)
            item[title_field] = title.strip()

        if title_field is not None:
            tv = item.get(title_field)
            if not tv or (isinstance(tv, str) and tv.strip() == ""):
                continue
        if not item:
            continue
        items.append(item)

    if title_field:
        seen = set()
        deduped = []
        for item in items:
            key = f"{item.get(title_field, '')}|{item.get('price', '')}"
            if key in seen:
                continue
            seen.add(key)
            deduped.append(item)
        return deduped
    return items
