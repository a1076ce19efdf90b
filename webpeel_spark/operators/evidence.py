"""Corpus-level selective evidence aggregation.

Distributes ``pure/selective_evidence.py`` (selective-evidence.ts:
310-508) over a table of (query, source) rows: group by query, run
the block selector per group, explode the selected blocks.  The
evidence-selection step a RAG pipeline runs for MANY queries at once
— each group is one query's source set (tens of rows), so the
groupBy shuffle distributes queries across executors and the Python
work per task is bounded by the largest source set, not the corpus.

Scale shape: one shuffle on the query key; skew is bounded because a
query's source list is capped upstream (search top-k).  At 10^12
corpus scale the *sources* table is the big side — join it to the
(query, url) evidence-candidate pairs first, then apply this.

Order note: the reference walks sources in array order and its sort
is stable, so tie-breaks depend on input order; a distributed table
has no row order, so groups are sorted by ``order_col`` (default:
url) before selection — the deterministic equivalent (same protocol
as urlmap's first-seen → max-score note).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "query string, rank int, source_url string, source_title string, "
    "text string, score double, has_structured_signal boolean, "
    "content_mode string, policy_type string, total_candidates int, "
    "sources_used int"
)


def _group_sources(pdf, query_col: str, order_col: str,
                   columns: Iterable[str]):
    """(query, sources-in-deterministic-order) from one pandas group."""
    has_snippet = "snippet" in columns
    has_structured = "structured" in columns
    pdf = pdf.sort_values(order_col, kind="mergesort")
    query = pdf[query_col].iloc[0]
    sources = []
    for _, row in pdf.iterrows():
        sources.append({
            "url": row["url"],
            "title": row.get("title") or "",
            "content": row.get("content") or "",
            "snippet": (row.get("snippet") or "") if has_snippet else "",
            "structured": (row.get("structured") or None)
            if has_structured else None,
        })
    return query, sources


def select_evidence_blocks(df: DataFrame, query_col: str = "query",
                           max_blocks: int = 12, max_chars: int = 6000,
                           policy_override: Optional[Dict[str, Any]] = None,
                           order_col: str = "url") -> DataFrame:
    """(query, url, title, content [, snippet, structured]) rows →
    one row per selected evidence block, ranked per query.

    ``structured`` is a JSON string column (or absent); ``snippet``
    falls back per getBestEvidenceText.  Output: OUTPUT_SCHEMA."""
    import pandas as pd

    cols = list(df.columns)  # NOT df itself — a DataFrame in the
    # closure drags SparkContext into the worker pickle (SPARK-5063)

    def run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        from webpeel_spark.pure.selective_evidence import select_evidence

        query, sources = _group_sources(pdf, query_col, order_col, cols)
        r = select_evidence(query, sources, max_blocks=max_blocks,
                            max_chars=max_chars,
                            policy_override=policy_override)
        out = [(query, i + 1, b.source_url, b.source_title, b.text,
                b.score, b.has_structured_signal, b.content_mode,
                r.policy.type, r.total_candidates, r.sources_used)
               for i, b in enumerate(r.blocks)]
        return pd.DataFrame(out, columns=[
            "query", "rank", "source_url", "source_title", "text",
            "score", "has_structured_signal", "content_mode",
            "policy_type", "total_candidates", "sources_used"])

    return df.groupBy(query_col).applyInPandas(run, OUTPUT_SCHEMA)


def format_evidence_contexts(df: DataFrame, query_col: str = "query",
                             max_blocks: int = 12, max_chars: int = 6000,
                             policy_override: Optional[Dict[str, Any]]
                             = None,
                             order_col: str = "url") -> DataFrame:
    """One formatted LLM-context string per query
    (formatEvidenceForLLM over the selection, one applyInPandas
    pass).  Grouping happens on the INPUT rows, so a query whose
    selection is empty (all sources unusable) still yields a
    ``(query, '')`` row — the reference returns '' for an empty
    selection, it does not drop the query."""
    import pandas as pd

    cols = list(df.columns)  # see run(): no DataFrame in the closure

    def fmt(pdf: "pd.DataFrame") -> "pd.DataFrame":
        from webpeel_spark.pure.selective_evidence import (
            format_evidence_for_llm, select_evidence,
        )

        query, sources = _group_sources(pdf, query_col, order_col, cols)
        r = select_evidence(query, sources, max_blocks=max_blocks,
                            max_chars=max_chars,
                            policy_override=policy_override)
        return pd.DataFrame(
            [(query, format_evidence_for_llm(r))],
            columns=["query", "context"])

    return df.groupBy(query_col).applyInPandas(
        fmt, "query string, context string")
