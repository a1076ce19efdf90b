"""Link extraction as {url, text} pairs (links.ts:17-55).

The envelope's existing link list (metadata.py:314) is url-only; this
is the reference's richer form — deduplicated by resolved URL, anchor
text whitespace-collapsed, skipping anchors / javascript: / mailto: /
tel: / data: hrefs."""

from __future__ import annotations

import re
from typing import Dict, List, Optional
from .urlfast import whatwg_urljoin

from ..dom import parse_html, select

_SKIP_PREFIXES = ("#", "javascript:", "mailto:", "tel:", "data:")
_ABS_RE = re.compile(r"^https?://")
_WS = re.compile(r"\s+")


def extract_link_pairs(html: str,
                       base_url: Optional[str] = None) -> List[Dict[str, str]]:
    """Deduplicated [{url, text}] for every <a href> in document order."""
    if not html:
        return []
    return extract_link_pairs_dom(parse_html(html), base_url)


def extract_link_pairs_dom(root,
                           base_url: Optional[str] = None
                           ) -> List[Dict[str, str]]:
    """DOM form of extract_link_pairs (reuses an existing parse — the
    extraction pipeline parses each page once and shares the root)."""
    return link_pairs_from_anchors(select(root, "a[href]"), base_url)


def link_pairs_from_anchors(anchors,
                            base_url: Optional[str] = None
                            ) -> List[Dict[str, str]]:
    """Pair extraction over a pre-selected anchor list — lets the
    pipeline share ONE a[href] walk with the url-only link extractor
    (both run on every page; the walk is the common cost)."""
    seen = set()
    links: List[Dict[str, str]] = []
    for a in anchors:
        href = a.get("href") or ""
        if not href or href.startswith(_SKIP_PREFIXES):
            continue
        url = href
        if base_url and not _ABS_RE.match(href):
            # links.ts:41 resolves RELATIVE hrefs with new URL(...)
            # (WHATWG normalization); case-sensitively-absolute
            # http(s) hrefs stay verbatim, exactly as the reference's
            # /^https?:\\/\\// guard leaves them
            url = whatwg_urljoin(base_url, href, require_http=False)
            if url is None:
                continue  # skip unresolvable relative URLs
        if url not in seen:
            seen.add(url)
            links.append({"url": url,
                          "text": _WS.sub(" ", a.text().strip())})
    return links
