"""Sitemap XML parsing (sitemap.ts:59-108 — the parse core).

The reference's ``discoverSitemap`` fetches candidate locations and
recurses through sitemap index files; the fetch/recursion shell is N/A
here (stored sitemap bytes are table rows; recursion over index
entries is a join against the same table).  ``parse_sitemap_xml``
ports the per-document parse exactly: index detection
(``sitemapindex > sitemap > loc``), urlset entries with
lastmod/changefreq/priority, empty-loc skip, max-url cap.
"""

from __future__ import annotations

from typing import Any, Dict, List

from ..dom import parse_xml, select, select_first


def parse_sitemap_xml(xml: str, max_urls: int = 10000) -> Dict[str, Any]:
    """→ {kind: 'index'|'urlset'|'unknown', sitemaps: [...], urls:
    [{url, lastmod?, changefreq?, priority?}]}."""
    result: Dict[str, Any] = {"kind": "unknown", "sitemaps": [], "urls": []}
    try:
        root = parse_xml(xml)
    except Exception:
        return result

    index_locs = select(root, "sitemapindex > sitemap > loc")
    if index_locs:
        result["kind"] = "index"
        result["sitemaps"] = [t for t in
                              (el.text().strip() for el in index_locs) if t]
        return result

    entries: List[Dict[str, Any]] = []
    url_nodes = select(root, "urlset > url")
    if url_nodes:
        result["kind"] = "urlset"
    for el in url_nodes:
        if len(entries) >= max_urls:
            break
        loc_el = select_first(el, "loc")
        loc = loc_el.text().strip() if loc_el is not None else ""
        if not loc:
            continue
        entry: Dict[str, Any] = {"url": loc}
        lastmod_el = select_first(el, "lastmod")
        changefreq_el = select_first(el, "changefreq")
        priority_el = select_first(el, "priority")
        lastmod = lastmod_el.text().strip() if lastmod_el is not None else ""
        changefreq = (changefreq_el.text().strip()
                      if changefreq_el is not None else "")
        priority = (priority_el.text().strip()
                    if priority_el is not None else "")
        if lastmod:
            entry["lastmod"] = lastmod
        if changefreq:
            entry["changefreq"] = changefreq
        if priority:
            # parseFloat (sitemap.ts:102): numeric-prefix semantics,
            # and a non-numeric value still ASSIGNS (NaN → JSON null);
            # strict float() silently omitted the key on '0.5x'/'high'
            from .jsonld import _js_parse_float
            entry["priority"] = _js_parse_float(priority)
        entries.append(entry)
    result["urls"] = entries
    return result
