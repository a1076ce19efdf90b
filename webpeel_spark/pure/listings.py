"""Auto-extract repeated listing patterns from HTML pages.

Port of /root/reference/src/core/extract-listings.ts (:483-500 public
API; container detection :100-220; item extraction :330-460): find the
largest group of structurally-similar sibling elements (child-tag
signature clustering, Jaccard ≥ 0.5 or subset), re-rank the top 8
candidates by content quality (avg title length × title hit rate ×
structural score), then extract title/price/image/link/rating/
description per item with the marketplace prefix/suffix strippers.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional
from .urlfast import whatwg_urljoin

from ..dom import Node, parse_html, select, select_first

CONTAINER_CHILD_TAGS = {"li", "div", "article", "section", "tr", "a"}

PRICE_RE = re.compile(
    r"(?:[\$£€¥₹])\s*[0-9,]+(?:\.[0-9]{1,2})?"
    r"|[0-9,]+(?:\.[0-9]{1,2})?\s*(?:USD|EUR|GBP|JPY|INR)",  # JS \d = ASCII
    re.I,
)

TITLE_STRIP_PREFIXES = [
    re.compile(r"^New\s+Listing\s*", re.I),
    re.compile(r"^Sponsored\s*", re.I),
    re.compile(r"^Opens\s+in\s+(?:a\s+)?new\s+(?:window|tab)(?:\s+or\s+(?:window|tab))?\s*", re.I),
    re.compile(r"^Advertisement\s*", re.I),
    re.compile(r"^Ad\s*[-–—:·]\s*", re.I),
    re.compile(r"^Promoted\s*[-–—:·]?\s*", re.I),
]

TITLE_STRIP_SUFFIXES = [
    re.compile(r"\s*Opens\s+in\s+(?:a\s+)?new\s+(?:window|tab)(?:\s+or\s+(?:window|tab))?$", re.I),
    re.compile(r"\s*\(opens\s+(?:in\s+)?(?:a\s+)?new\s+(?:window|tab)\)$", re.I),
    re.compile(r"\s*[-–—]\s*New\s+window$", re.I),
    re.compile(r"\s*Sponsored$", re.I),
]

HEADER_WORDS = {
    "results", "sponsored", "related", "advertisement", "shop", "browse",
    "featured", "popular", "trending", "new", "sale", "deals", "more",
    "filters", "sort", "categories", "departments", "navigation",
}


def child_signature(el: Node) -> str:
    """tag:count pairs of direct children, tag-sorted (extract-listings.ts:44-57).

    Collation note: the reference sorts with ``a.localeCompare(b)``
    (CLDR root) where this uses Python's code-point ``sorted``.  For
    the common tag alphabet after toLowerCase — ``[a-z0-9-]`` — the
    two orders coincide (CLDR primary weights run punctuation < digits
    < letters, same as their code points, and there is no case to
    differ on), so the signatures are byte-identical there.  Exception
    (r10 ADVICE): dom/fastparse's tokenizer admits tag names matching
    ``[a-zA-Z][-.a-zA-Z0-9:_]*``, so namespaced/custom tags like
    ``svg:use`` or ``foo_bar`` keep ``:``/``_``/``.`` — characters
    where the orders diverge (code points place ``:``/``_`` after
    digits; CLDR root puts punctuation before digits).  Such tags are
    outside the byte-identity claim; they only perturb signature
    ORDER, and signatures_are_similar is order-insensitive (set
    Jaccard), so grouping is unaffected — see COVERAGE.md's
    collation-class audit."""
    counts: Dict[str, int] = {}
    for c in el.element_children():
        counts[c.tag] = counts.get(c.tag, 0) + 1
    return ",".join(f"{t}:{n}" for t, n in sorted(counts.items()))


def signatures_are_similar(a: str, b: str) -> bool:
    """Jaccard ≥ 0.5 on tag:count pairs, or subset (ts:68-80)."""
    if a == b:
        return True
    if not a or not b:
        return False
    pa, pb = set(a.split(",")), set(b.split(","))
    inter = len(pa & pb)
    union = len(pa | pb)
    return inter == len(pa) or inter == len(pb) or inter / union >= 0.5


def is_header_or_junk(title: str) -> bool:
    if not title:
        return True
    if len(title) <= 3:
        return True
    if re.fullmatch(r"[0-9]+\.?", title):  # JS \d = ASCII
        return True
    if not re.search(r"\s", title) and title.lower() in HEADER_WORDS:
        return True
    return False


def clean_concatenated_title(title: str) -> str:
    cleaned = title
    cleaned = re.sub(r"[\$£€]\d[\d,.]*(?:\s+[A-Z].*|\S+.*)?$", "", cleaned, flags=re.I).strip()
    cleaned = re.sub(r"\d+\.?\d*/5\s*\(.*$", "", cleaned, flags=re.I).strip()
    cleaned = re.sub(r"\s*[·\-–]\s*\d+-?star\s.*$", "", cleaned, flags=re.I).strip()
    cleaned = re.sub(r"(?:Booking|Expedia|Hotels|Kayak|Trivago|Priceline|Agoda)\.com.*$",
                     "", cleaned, flags=re.I).strip()
    return cleaned or title


def strip_title_prefixes(title: str) -> str:
    t = title
    for p in TITLE_STRIP_PREFIXES:
        t = p.sub("", t, count=1)
    for s in TITLE_STRIP_SUFFIXES:
        t = s.sub("", t, count=1)
    return clean_concatenated_title(t.strip())


def _resolve_url(href: Optional[str], base_url: Optional[str]) -> Optional[str]:
    if not href:
        return None
    if href.startswith("data:") or href.startswith("javascript:"):
        return None
    if not base_url:
        return href
    out = whatwg_urljoin(base_url, href, require_http=False)
    return href if out is None else out


def extract_item(el: Node, base_url: Optional[str] = None) -> Dict[str, Optional[str]]:
    """Title/price/image/link/rating/description from one listing element
    (ts:330-460; title priority heading > title-class w/ link > title-class
    linkless (≥8 chars) > first meaningful <a>)."""
    item: Dict[str, Optional[str]] = {}
    title_source: Optional[Node] = None

    heading = select_first(el, "h1, h2, h3, h4, h5, h6")
    if heading is not None and len(heading.text().strip()) >= 3:
        item["title"] = strip_title_prefixes(heading.text().strip())
        title_source = heading
    else:
        candidates = select(
            el, '[class*="title"], [class*="name"], [class*="Title"], [class*="Name"]'
        )
        for tc in candidates:  # pass 1: with inner link
            inner = select_first(tc, "a")
            if inner is None:
                continue
            text = inner.text().strip()
            if len(text) >= 3:
                item["title"] = strip_title_prefixes(text)
                title_source = tc
                break
        if "title" not in item:  # pass 2: linkless, higher threshold
            for tc in candidates:
                if select_first(tc, "a") is not None:
                    continue
                text = tc.text().strip()
                if len(text) >= 8:
                    item["title"] = strip_title_prefixes(text)
                    title_source = tc
                    break
        if "title" not in item:  # fallback: first meaningful <a>
            for a in select(el, "a"):
                text = a.text().strip()
                if len(text) >= 3:
                    item["title"] = strip_title_prefixes(text)
                    title_source = a
                    break

    price_el = select_first(el, '[class*="price"], [class*="Price"], [data-price]')
    if price_el is not None:
        price_text = price_el.text().strip()
        m = PRICE_RE.search(price_text)
        item["price"] = m.group(0) if m else price_text
    else:
        m = PRICE_RE.search(el.text())
        if m:
            item["price"] = m.group(0)

    img = select_first(el, "img")
    if img is not None:
        src = img.get("src") or img.get("data-src") or img.get("data-lazy-src")
        resolved = _resolve_url(src, base_url)
        if resolved:
            item["image"] = resolved

    primary_link: Optional[Node] = None
    if title_source is not None:
        if title_source.tag == "a":
            primary_link = title_source
        else:
            primary_link = select_first(title_source, "a[href]")
    if primary_link is None:
        primary_link = select_first(el, "a[href]")
    if primary_link is not None:
        link = _resolve_url(primary_link.get("href"), base_url)
        if link:
            item["link"] = link
    if "link" not in item and el.tag == "a":
        link = _resolve_url(el.get("href"), base_url)
        if link:
            item["link"] = link

    rating_el = select_first(
        el, '[class*="rating"], [class*="Rating"], [class*="star"], '
            '[class*="Star"], [aria-label*="star"], [aria-label*="rating"]')
    if rating_el is not None:
        rating = rating_el.get("aria-label") or rating_el.text().strip()
        if rating:
            item["rating"] = rating

    used = {v for v in (item.get("title"), item.get("price"), item.get("rating")) if v}
    desc_parts: List[str] = []
    for d in select(el, 'p, span, [class*="desc"], [class*="Desc"], '
                        '[class*="subtitle"], [class*="snippet"]'):
        text = d.text().strip()
        if len(text) > 5 and text not in used and text != item.get("title"):
            desc_parts.append(text)
            used.add(text)
    if desc_parts:
        item["description"] = " ".join(desc_parts[:2])

    return item


def find_listing_container(root: Node):
    """(parent, tag, children, score) of the best repeated-sibling group
    (ts:100-220), or None."""
    candidates = []
    for el in root.iter_elements():
        children = el.element_children()
        if len(children) < 3:
            continue
        by_tag: Dict[str, List[Node]] = {}
        for c in children:
            if c.tag in CONTAINER_CHILD_TAGS:
                by_tag.setdefault(c.tag, []).append(c)
        for tag, tag_children in by_tag.items():
            if len(tag_children) < 3:
                continue
            child_sigs = [(c, child_signature(c)) for c in tag_children]
            with_sig = [(c, s) for c, s in child_sigs if s]
            without_sig = [(c, s) for c, s in child_sigs if not s]
            if not with_sig:
                with_content = [c for c in tag_children if len(c.text().strip()) > 3]
                if len(with_content) >= 3:
                    candidates.append((el, tag, with_content, float(len(with_content))))
                continue
            sig_groups: List[Dict] = []
            for c, s in with_sig:
                placed = False
                for g in sig_groups:
                    if signatures_are_similar(s, g["repr"]):
                        g["children"].append(c)
                        placed = True
                        break
                if not placed:
                    sig_groups.append({"repr": s, "children": [c]})
            largest = max(sig_groups, key=lambda g: len(g["children"])) if sig_groups else None
            for c, _s in without_sig:
                if largest is not None and len(c.text().strip()) > 3:
                    largest["children"].append(c)
            for g in sig_groups:
                if len(g["children"]) < 3:
                    continue
                consistency = len(g["children"]) / len(tag_children)
                score = len(g["children"]) * consistency
                candidates.append((el, tag, g["children"], score))

    if not candidates:
        return None
    candidates.sort(key=lambda c: (-c[3], -len(c[2])))
    top_n = candidates[: min(len(candidates), 8)]
    best = None
    best_content_score = -1.0
    for cand in top_n:
        title_len_sum = 0
        titles_found = 0
        sample = cand[2][:5]
        for child in sample:
            item = extract_item(child)
            t = item.get("title")
            if t and len(t) >= 3:
                title_len_sum += len(t)
                titles_found += 1
        avg_title_len = title_len_sum / titles_found if titles_found else 0.0
        title_rate = titles_found / len(sample) if sample else 0.0
        content_score = avg_title_len * title_rate * cand[3]
        if content_score > best_content_score:
            best_content_score = content_score
            best = cand
    return best


def extract_listings(html: str, url: Optional[str] = None) -> List[Dict]:
    """Public API (ts:483-500): detect + extract, junk titles filtered."""
    if not html or not html.strip():
        return []
    root = parse_html(html)
    container = find_listing_container(root)
    if container is None:
        return []
    items = []
    for child in container[2]:
        item = extract_item(child, url)
        title = item.get("title")
        if not title or len(title) < 3:
            continue
        if is_header_or_junk(title):
            continue
        items.append(item)
    return items
