"""eBay extractor (ee/extractors/ebay.ts port): /itm/ item pages and
search-results pages (li[data-listingid] + .s-card__* selectors)."""

from __future__ import annotations

import re
from urllib.parse import parse_qs, urlsplit

from ...dom import matches, parse_html, select, select_first

_CONDITION_KEYWORDS = ["Pre-Owned", "Brand New", "Open Box", "Refurbished",
                       "For Parts"]
_ITM_RE = re.compile(r"(https?://[^/]*/itm/\d+)")


def ebay_extractor(html: str, url: str):
    from . import DomainExtractResult

    try:
        root = parse_html(html)
        u = urlsplit(url)

        if u.path.startswith("/itm/"):
            h1 = select_first(root, "h1")
            title = h1.text().strip() if h1 is not None else ""
            if not title:
                return None
            price = ""
            for el in select(root, '[class*="price"]'):
                if matches(el, '[class*="shipping"]'):
                    continue  # .not('[class*="shipping"]')
                price = el.text().strip()
                break
            cond_el = select_first(root, '[class*="condition"]')
            condition = cond_el.text().strip() if cond_el is not None else ""
            lines = [f"# 🛍 {title}"]
            if price:
                lines.append(f"**Price:** {price}")
            if condition:
                lines.append(f"**Condition:** {condition}")
            lines.append(f"\n[View on eBay]({url})")
            return DomainExtractResult(
                "ebay.com", "listing",
                {"title": title, "price": price, "condition": condition, "url": url},
                "\n".join(lines))

        qs = parse_qs(u.query)
        keyword = (qs.get("_nkw") or [""])[0]
        max_price = (qs.get("_udhi") or [""])[0]
        min_price = (qs.get("_udlo") or [""])[0]

        listings = []
        for el in select(root, "li[data-listingid]"):
            title_el = select_first(el, ".s-card__title")
            title_raw = (title_el.text().strip() if title_el is not None else "")
            title_raw = re.sub(r"Opens in a new window or tab", "", title_raw)
            title_raw = re.sub(r"^New Listing\s*", "", title_raw, flags=re.I).strip()
            if not title_raw or title_raw == "Shop on eBay":
                continue
            price_el = select_first(el, ".s-card__price")
            price = price_el.text().strip() if price_el is not None else ""
            sub_el = select_first(el, ".s-card__subtitle")
            subtitle = sub_el.text().strip() if sub_el is not None else ""
            condition = next((k for k in _CONDITION_KEYWORDS if k in subtitle), "")
            href = ""
            link = select_first(el, 'a[href*="/itm/"]')
            if link is not None:
                m = _ITM_RE.search(link.get("href") or "")
                if m:
                    href = m.group(1)
            listing_id = el.get("data-listingid") or ""
            if not href and listing_id:
                href = f"https://www.ebay.com/itm/{listing_id}"
            listings.append({"title": title_raw, "price": price,
                             "condition": condition, "url": href})

        if not listings:
            return None

        header_lines = [f"# 🛍 eBay — {keyword or 'Search Results'}", ""]
        if keyword:
            header_lines.append(f"**Search:** {keyword}")
        if min_price or max_price:
            header_lines.append(f"**Price:** up to ${max_price}")
        header_lines.append(f"**Results:** {len(listings)} listings")
        header_lines.append("")
        header = "\n".join(header_lines)

        rows = []
        for i, l in enumerate(listings[:20]):
            parts = [f"{i + 1}. **{l['title']}**"]
            if l["price"]:
                parts.append(l["price"])
            if l["condition"]:
                parts.append(f"[{l['condition']}]")
            if l["url"]:
                parts.append(f"[→]({l['url']})")
            rows.append(" · ".join(parts))

        return DomainExtractResult(
            "ebay.com", "search",
            {"keyword": keyword, "minPrice": min_price, "maxPrice": max_price,
             "count": len(listings), "listings": listings},
            header + "\n".join(rows))
    except Exception:
        return None
