"""Domain URL-map filtering predicates (map.ts:9-166).

The reference's ``mapDomain`` combines sitemap discovery + homepage
crawling (both network — N/A here; the batch engine gets discovered
URLs from ``sitemap_parse_pages`` / ``extract_link_pairs_pages``) with
three pure pieces ported here:

- ``safe_regex``          (map.ts:10-19 — length-capped user regex)
- ``calculate_relevance`` (map.ts:80-97 — 3/2/1 term weighting)
- ``should_include``      (map.ts:102-117 — exclude → include →
                           content-type extension filter)
- ``map_filter_sort``     (map.ts:120-160 — the dedupe + score-sort
                           over already-discovered URL rows)

``operators/urlmap.py`` is the Catalyst twin for corpus scale.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Pattern, Tuple

_MAX_PATTERN_LEN = 200


def safe_regex(pattern: str) -> Pattern[str]:
    """Compile a user-supplied pattern with the reference's 200-char
    cap; invalid patterns raise ValueError (map.ts:10-19)."""
    if len(pattern) > _MAX_PATTERN_LEN:
        raise ValueError(
            f"Regex pattern too long ({len(pattern)} chars, max 200)")
    try:
        return re.compile(pattern)
    except re.error as exc:
        raise ValueError(f"Invalid regex pattern: {pattern}") from exc


def calculate_relevance(search_terms: List[str], url: str,
                        title: Optional[str] = None,
                        description: Optional[str] = None) -> int:
    """URL-path hits weigh 3, title 2, description 1; no search → all
    URLs score 1 (map.ts:80-97)."""
    if not search_terms:
        return 1
    score = 0
    url_l = url.lower()
    title_l = (title or "").lower()
    desc_l = (description or "").lower()
    for term in search_terms:
        if term in url_l:
            score += 3
        if term in title_l:
            score += 2
        if term in desc_l:
            score += 1
    return score


def should_include(url: str,
                   include: Iterable[Pattern[str]] = (),
                   exclude: Iterable[Pattern[str]] = (),
                   content_types: Iterable[str] = ()) -> bool:
    """Exclude wins; include list (when present) must hit; content
    types match on the final extension OR a '.ext' substring anywhere
    in the URL (map.ts:102-117 — the substring clause is how the
    reference keeps '?format=' style URLs)."""
    include = list(include)
    exclude = list(exclude)
    content_types = list(content_types)
    if any(r.search(url) for r in exclude):
        return False
    if include and not any(r.search(url) for r in include):
        return False
    if content_types:
        # NB reference uses url.split('.').pop(): a dot-free url's
        # "extension" is the whole url (map.ts:108)
        ext = url.rsplit(".", 1)[-1].lower()
        url_l = url.lower()
        for ctype in content_types:
            type_ext = ctype.lstrip(".").lower()
            if ext == type_ext or f".{type_ext}" in url_l:
                break
        else:
            return False
    return True


def map_filter_sort(rows: Iterable[Tuple[str, Optional[str], Optional[str]]],
                    include_patterns: Iterable[str] = (),
                    exclude_patterns: Iterable[str] = (),
                    search: Optional[str] = None,
                    content_types: Iterable[str] = (),
                    max_urls: int = 5000) -> Dict[str, object]:
    """(url, title, description) rows → {urls, total}: dedupe
    first-seen, filter, score, then sort by score desc (only when
    searching) and url asc (map.ts:120-160)."""
    include = [safe_regex(p) for p in include_patterns]
    exclude = [safe_regex(p) for p in exclude_patterns]
    terms = ([t for t in search.lower().split() if t]
             if search else [])
    scored: Dict[str, int] = {}
    for url, title, description in rows:
        if len(scored) >= max_urls:
            break
        if url in scored:
            continue
        if not should_include(url, include, exclude, content_types):
            continue
        scored[url] = calculate_relevance(terms, url, title, description)

    items = sorted(scored.items(),
                   key=(lambda kv: (-kv[1], _locale_key(kv[0]))) if search
                   else (lambda kv: _locale_key(kv[0])))
    return {"urls": [u for u, _ in items], "total": len(scored)}


def _locale_key(url: str) -> Tuple[str, str]:
    """ASCII approximation of map.ts:160's ``localeCompare`` ordering:
    primary case-insensitive (casefold), ties between case variants
    broken lowercase-first (ICU tertiary weight — ``swapcase`` flips
    ASCII case so 'x' sorts before 'X' ordinally).  Known residual
    divergence: ICU's variable punctuation weighting (``_`` < ``-`` <
    ``.`` in ICU vs ordinal ``-`` < ``.`` < ``_``) and non-ASCII
    collation — membership and scores are unaffected either way (the
    cap applies before the sort)."""
    return (url.casefold(), url.swapcase())
