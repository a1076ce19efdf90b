"""Craigslist extractor (ee/extractors/craigslist.ts port): individual
post pages (/d/<title>/<id>.html) and search/listing pages."""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from ...dom import parse_html, select, select_first

_POST_RE = re.compile(r"/d/[^/]+/\d+\.html")
_POST_ID_RE = re.compile(r"/\d{10,}\.html")


def craigslist_extractor(html: str, url: str):
    from . import DomainExtractResult

    try:
        root = parse_html(html)
        path = urlsplit(url).path

        if _POST_RE.search(path) or _POST_ID_RE.search(path):
            return _post(root, url, DomainExtractResult)
        return _search(root, url, DomainExtractResult)
    except Exception:
        return None


def _sel_text(root, selector: str) -> str:
    el = select_first(root, selector)
    return el.text().strip() if el is not None else ""


def _post(root, url, DomainExtractResult):
    title = (_sel_text(root, "#titletextonly")
             or _sel_text(root, "span#titletextonly"))
    if not title:
        og = select_first(root, 'meta[property="og:title"]')
        title = (og.get("content") or "") if og is not None else ""
    if not title:
        title = _sel_text(root, "h2.postingtitle")
    if not title:
        return None

    price = (_sel_text(root, ".price") or _sel_text(root, '[class*="price"]'))

    location = _sel_text(root, ".postingtitletext small").replace("(", "").replace(")", "")
    if not location:
        map_el = select_first(root, "#map")
        location = (map_el.get("data-address") or "") if map_el is not None else ""

    post_date = ""
    for sel in ("#display-date time", "time.date", "p.postinginfo time"):
        el = select_first(root, sel)
        if el is not None and el.get("datetime"):
            post_date = el.get("datetime")
            break

    body_el = select_first(root, "#postingbody")
    body_text = ""
    if body_el is not None:
        for junk in select(body_el, ".print-information, .QR-code"):
            junk.remove()
        body_text = body_el.text().strip()
        body_text = body_text.replace("QR Code Link to This Post", "", 1)
        body_text = re.sub(r"\n{3,}", "\n\n", body_text).strip()

    images = []
    for sel in ("img.slide", 'img[id^="ii"]'):
        for el in select(root, sel):
            src = el.get("src") or ""
            if src and src not in images:
                images.append(src)

    attrs = {}
    for el in select(root, ".attrgroup span"):
        text = el.text().strip()
        parts = text.split(":")
        if len(parts) == 2:
            attrs[parts[0].strip()] = parts[1].strip()

    structured = {"title": title, "price": price, "location": location,
                  "postDate": post_date, "bodyText": body_text,
                  "images": images, "attributes": attrs, "url": url}

    price_line = f"\n**Price:** {price}" if price else ""
    location_line = f"\n**Location:** {location}" if location else ""
    date_line = f"\n**Posted:** {post_date.split('T')[0]}" if post_date else ""
    attrs_section = ""
    if attrs:
        attr_lines = "\n".join(f"- **{k}:** {v}" for k, v in attrs.items())
        attrs_section = f"\n\n## Details\n\n{attr_lines}"
    images_line = (f"\n\n📷 {len(images)} image{'s' if len(images) > 1 else ''}"
                   if images else "")

    clean = (f"# 📋 {title}{price_line}{location_line}{date_line}"
             f"{attrs_section}{images_line}\n\n{body_text[:3000]}")
    return DomainExtractResult("craigslist.org", "listing", structured, clean)


def _search(root, url, DomainExtractResult):
    page_title = _sel_text(root, "title")
    if not page_title:
        og = select_first(root, 'meta[property="og:title"]')
        page_title = ((og.get("content") or "") if og is not None else "") \
            or "Craigslist Listings"

    listings = []
    for el in select(root, ".result-row, li.cl-static-search-result, .cl-search-result"):
        title_el = select_first(el, 'a.titlestring, a[class*="title"], .result-title')
        if title_el is None:
            continue
        post_title = title_el.text().strip()
        post_url = title_el.get("href") or ""
        post_price = _sel_text(el, '.result-price, [class*="price"]')
        post_hood = _sel_text(el, '.result-hood, [class*="hood"]').replace("(", "").replace(")", "")
        if post_title:
            listings.append({"title": post_title, "url": post_url,
                             "price": post_price, "location": post_hood})

    if not listings:
        return None

    rows = []
    for i, l in enumerate(listings[:20]):
        line = f"{i + 1}. **{l['title']}**"
        if l["price"]:
            line += f" — {l['price']}"
        if l["location"]:
            line += f" ({l['location']})"
        if l["url"]:
            line += f"\n   {l['url']}"
        rows.append(line)

    return DomainExtractResult(
        "craigslist.org", "search",
        {"pageTitle": page_title, "listings": listings, "url": url},
        f"# 📋 {page_title}\n\n" + "\n\n".join(rows))
