"""Cars.com extractor (ee/extractors/carscom.ts port): vehicle detail
pages and search results via fuse-card data-vehicle-details JSON attrs,
with dealer/location regex harvesting matched to listings in order."""

from __future__ import annotations

import json
import re
from urllib.parse import parse_qs, urlsplit

from ...dom import parse_html, select, select_first

_DEALER_RE = re.compile(
    r'"text":"([^"]{3,50})","on_click_interactions":\[\],"text_style":"small","font_color":"grey')
_DEALER_VETO_RE = re.compile(r"^\d|^Used|^New|mi\)|^Review|^\$")
_LOC_RE = re.compile(r"([A-Z][a-z]+(?:\s[A-Z][a-z]+)*,\s[A-Z]{2}\s\(\d+\s*mi\))")


def _fmt_num(v) -> str:
    try:
        return f"{int(v):,}"
    except (TypeError, ValueError):
        return str(v)


def carscom_extractor(html: str, url: str):
    from . import DomainExtractResult

    try:
        root = parse_html(html)
        u = urlsplit(url)
        qs = parse_qs(u.query)
        get = lambda k: (qs.get(k) or [""])[0]
        keyword, max_price, min_price = get("keyword"), get("list_price_max"), get("list_price_min")
        zip_code, stock_type = get("zip"), get("stock_type")

        if "/vehicledetail/" in u.path:
            h1 = select_first(root, "h1")
            title = h1.text().strip() if h1 is not None else ""
            if not title:
                t = select_first(root, "title")
                title = (t.text().strip().split(" | ")[0] if t is not None else "")
            if not title:
                return None
            price_el = select_first(root, '[class*="price"]')
            price = price_el.text().strip() if price_el is not None else ""
            mil_el = select_first(root, '[class*="mileage"]')
            mileage = mil_el.text().strip() if mil_el is not None else ""
            lines = [f"# 🚗 {title}"]
            if price:
                lines.append(f"**Price:** {price}")
            if mileage:
                lines.append(f"**Mileage:** {mileage}")
            lines.append(f"\n[View listing]({url})")
            return DomainExtractResult(
                "cars.com", "listing",
                {"title": title, "price": price, "mileage": mileage, "url": url},
                "\n".join(lines))

        listings = []
        for el in select(root, "fuse-card[data-vehicle-details]"):
            try:
                raw = el.get("data-vehicle-details")
                if not raw:
                    continue
                v = json.loads(raw)
                listing_id = v.get("listingId") or el.get("data-listing-id") or ""
                gallery = select_first(el, "card-gallery")
                card_link = ((gallery.get("card-link") or "") if gallery is not None else "") \
                    or (f"/vehicledetail/{listing_id}/" if listing_id else "")
                title = (f"{v.get('stockType') or 'Used'} {v.get('year')} "
                         f"{v.get('make')} {v.get('model')}"
                         + (f" {v['trim']}" if v.get("trim") else "")).strip()
                price = f"${_fmt_num(v['price'])}" if v.get("price") else ""
                mileage = f"{_fmt_num(v['mileage'])} mi" if v.get("mileage") else ""
                if title and title != "Used":
                    listings.append({
                        "title": title, "price": price, "mileage": mileage,
                        "bodyStyle": v.get("bodyStyle") or "",
                        "fuelType": v.get("fuelType") or "", "url": card_link,
                        "sellerZip": (v.get("seller") or {}).get("zip") or ""})
            except Exception:
                continue  # skip malformed

        if not listings:
            return None

        dealer_names = [m for m in _DEALER_RE.findall(html)
                        if not _DEALER_VETO_RE.match(m)]
        locations = _LOC_RE.findall(html)
        for i, l in enumerate(listings):
            if i < len(dealer_names):
                l["dealer"] = dealer_names[i]
            if i < len(locations):
                l["location"] = locations[i]

        header_lines = [f"# 🚗 Cars.com — {keyword or 'Vehicle Search'}", ""]
        if keyword:
            header_lines.append(f"**Search:** {keyword}")
        if zip_code:
            header_lines.append(f"**Location:** ZIP {zip_code}")
        if min_price or max_price:
            header_lines.append(f"**Price:** up to ${max_price}")
        if stock_type:
            header_lines.append(f"**Stock:** {stock_type}")
        header_lines.append(f"**Results:** {len(listings)} listings")
        header_lines.append("")
        header = "\n".join(header_lines)

        rows = []
        for i, l in enumerate(listings[:20]):
            parts = [p for p in (f"{i + 1}. **{l['title']}**", l["price"],
                                 l["mileage"], l["bodyStyle"]) if p]
            line = " · ".join(parts)
            details = []
            if l.get("location"):
                details.append(f"📍 {l['location']}")
            if l.get("dealer"):
                details.append(f"🏪 {l['dealer']}")
            if l.get("url"):
                details.append(f"🔗 [View listing](https://www.cars.com{l['url']})")
            rows.append(line + ("\n   " + " · ".join(details) if details else ""))

        return DomainExtractResult(
            "cars.com", "search",
            {"keyword": keyword, "zip": zip_code, "minPrice": min_price,
             "maxPrice": max_price, "stockType": stock_type,
             "count": len(listings), "listings": listings},
            header + "\n".join(rows))
    except Exception:
        return None
