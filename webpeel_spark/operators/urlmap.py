"""URL-map filtering at corpus scale (map.ts predicates, Catalyst).

The reference filters a few thousand discovered URLs in one process;
at 100 TB the discovered-URL table (sitemap entries unioned with
extracted link pairs) is itself corpus-sized, so the predicates
become whole-stage-codegen filters and the relevance score a literal
when-chain — no UDF, no shuffle beyond the final ordering.

Java ``rlike`` and JS ``RegExp`` agree on the simple path/extension
patterns the reference feature is used with.  Driver-side validation
via ``pure.urlmap.safe_regex`` enforces the 200-char cap and Python
regex syntax before the plan is built; note this is NOT a full
guarantee for Java — a Python-valid construct Java rejects (e.g.
``(?P<name>…)``) still fails at execution, and a handful of
constructs differ semantically (Java ``$`` matches before a trailing
newline).  For exotic patterns use the pure ``map_filter_sort`` path,
which runs the reference's JS-equivalent ``re`` semantics exactly.
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..pure.urlmap import safe_regex


def _any_rlike(col: Column, patterns: Iterable[str]) -> Optional[Column]:
    exprs = [col.rlike(p) for p in patterns]
    if not exprs:
        return None
    return reduce(lambda a, b: a | b, exprs)


def map_url_candidates(df: DataFrame,
                       include_patterns: Iterable[str] = (),
                       exclude_patterns: Iterable[str] = (),
                       search: Optional[str] = None,
                       content_types: Iterable[str] = (),
                       max_urls: int = 5000,
                       url_col: str = "url") -> DataFrame:
    """(url [, title, description]) → filtered, scored, deduped and
    sorted URL map (map.ts:102-160 semantics).  Output: (url, score)
    ordered score desc (when searching) then url asc, capped at
    ``max_urls`` — a TakeOrdered, not a full sort, at scale.

    Dedup note: the reference keeps the FIRST-seen score for a
    duplicated URL (map.ts:145-147), which has no meaning over an
    unordered distributed table; the deterministic equivalent here is
    max(score) per url."""
    include_patterns = list(include_patterns)
    exclude_patterns = list(exclude_patterns)
    content_types = list(content_types)
    for p in (*include_patterns, *exclude_patterns):
        safe_regex(p)  # driver-side validation, reference error text

    url = F.col(url_col)
    cond = F.lit(True)
    excl = _any_rlike(url, exclude_patterns)
    if excl is not None:
        cond = cond & ~excl
    incl = _any_rlike(url, include_patterns)
    if incl is not None:
        cond = cond & incl
    if content_types:
        url_l = F.lower(url)
        ext = F.lower(F.element_at(F.split(url, r"\."), -1))
        ct = reduce(lambda a, b: a | b, [
            (ext == t.lstrip(".").lower())
            | url_l.contains(f".{t.lstrip('.').lower()}")
            for t in content_types
        ])
        cond = cond & ct

    terms = [t for t in search.lower().split() if t] if search else []
    if terms:
        title = (F.coalesce(F.lower(F.col("title")), F.lit(""))
                 if "title" in df.columns else F.lit(""))
        desc = (F.coalesce(F.lower(F.col("description")), F.lit(""))
                if "description" in df.columns else F.lit(""))
        url_l = F.lower(url)
        score = reduce(lambda a, b: a + b, [
            F.when(url_l.contains(t), 3).otherwise(0)
            + F.when(title.contains(t), 2).otherwise(0)
            + F.when(desc.contains(t), 1).otherwise(0)
            for t in terms
        ])
    else:
        score = F.lit(1)

    out = (df.filter(cond)
             .select(url.alias("url"), score.alias("score"))
             .groupBy("url").agg(F.max("score").alias("score")))
    # localeCompare-approximate collation (pure._locale_key twin):
    # case-insensitive primary, lowercase-first tie-break — a cheap
    # codegen translate(), not a UDF.  ASCII-scoped: for non-ASCII
    # urls this diverges from the pure path (lower() vs casefold —
    # 'ß'→'ss' — and translate() can't swap accented case), so mixed-
    # script corpora may order differently here than map_filter_sort;
    # membership only shifts when the cap truncates inside such a tie
    # region.  Full ICU collation is not worth a UDF in this sort.
    import string as _string
    case_flip = F.translate(
        F.col("url"),
        _string.ascii_lowercase + _string.ascii_uppercase,
        _string.ascii_uppercase + _string.ascii_lowercase)
    url_order = [F.asc(F.lower(F.col("url"))), F.asc(case_flip)]
    order = ([F.desc("score"), *url_order] if terms else url_order)
    return out.orderBy(*order).limit(max_urls)
