"""Pagination link discovery — port of src/core/paginate.ts.

Finds the "Next" page URL in a page's HTML by the reference's
priority order: rel=next, aria-label containing 'next', class
containing 'next' (text not 'prev'), then known next-link text
patterns.  In the batch engine this enriches per-page link output
(next-page chains let a downstream frontier builder reconstruct
listing sequences without live crawling)."""

from __future__ import annotations

from typing import Optional
from .urlfast import whatwg_urljoin

from ..dom import parse_html, select

# paginate.ts:17
NEXT_TEXT_EXACT = {
    "next", "next page", "›", "»", ">", ">>", "next ›", "next »",
    "next >", "suivant", "weiter", "siguiente", "次へ",
}

NEXT_ATTR_SUBSTRINGS = ["next"]


def _resolve(href: Optional[str], base: str) -> Optional[str]:
    """paginate.ts:106-112."""
    if not href or href == "#" or href.startswith("javascript:"):
        return None
    return whatwg_urljoin(base, href, require_http=False)


def find_next_page_url(html: str, current_url: str) -> Optional[str]:
    """paginate.ts:48-97 — absolute next-page URL or None."""
    if not html:
        return None
    root = parse_html(html)

    # 1. rel="next" (strongest signal)
    for el in select(root, 'a[rel="next"], link[rel="next"]'):
        resolved = _resolve(el.get("href"), current_url)
        if resolved and resolved != current_url:
            return resolved
        break

    # 2. aria-label containing "next"
    for el in select(root, "a[aria-label]"):
        label = (el.get("aria-label") or "").lower()
        if any(sub in label for sub in NEXT_ATTR_SUBSTRINGS):
            resolved = _resolve(el.get("href"), current_url)
            if resolved and resolved != current_url:
                return resolved
            break

    # 3. class containing "next" + plausible link text (not "prev")
    for el in select(root, 'a[class*="next"], a[class*="Next"]'):
        text = el.text().strip().lower()
        if "prev" in text:
            continue
        resolved = _resolve(el.get("href"), current_url)
        if resolved and resolved != current_url:
            return resolved
        break

    # 4. text-based match over all <a>
    for el in select(root, "a"):
        text = el.text().strip().lower()
        if text in NEXT_TEXT_EXACT:
            resolved = _resolve(el.get("href"), current_url)
            if resolved and resolved != current_url:
                return resolved

    return None
