"""Benchmark decontamination — n-gram collision flagging.

Standard training-data hygiene (GPT-3 appendix C / RefinedWeb §3.4
style, public methods): a document is contaminated if any of its
13-word-grams appears in an evaluation benchmark.  This is an engine
addition beyond the reference (the brief's training-data-pipeline
tier); it composes the repo's existing shingle machinery
(operators/dedup.word_shingles and its DuckDB twin).

100 TB plan shape: the benchmark side is small by construction (eval
sets are maybe 10⁵ grams) → distinct-gram set broadcast; the corpus
side explodes its distinct grams map-side and inner-joins the
broadcast hash table, so nothing but the MATCHED (doc_id, gram) rows
— rare — ever reach the one per-doc count shuffle.  At corpus scale
the gram strings would ride as xxhash64 images; the join keys here
stay strings so the DuckDB oracle is collision-free exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles


def contamination_flags(docs: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 13) -> DataFrame:
    """(doc_id, matched_grams, flagged) for every doc in ``docs``.

    ``benchmark`` needs only ``text_col``; docs shorter than ``n``
    words contribute their whole text as one gram (same convention on
    both engines)."""
    bench_grams = (
        benchmark
        .select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("gram"))

    matches = (
        doc_grams
        .join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("matched_grams"))
    )
    return (
        docs.select(id_col)
        .join(matches, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("matched_grams", F.lit(0)).alias("matched_grams"),
            (F.coalesce("matched_grams", F.lit(0)) > 0).alias("flagged"),
        )
    )


def contamination_oracle_sql(bench_pred: str, n: int = 13) -> str:
    """DuckDB twin over the pre-registered ``documents`` view;
    ``bench_pred`` selects the benchmark rows (e.g. 'doc_id < 20')."""
    from .dedup import _shingles_sql

    shingles = _shingles_sql(n)
    return f"""
WITH doc_sh AS ({shingles}),
bench AS (
  SELECT DISTINCT unnest(sh) AS gram FROM doc_sh WHERE {bench_pred}
),
doc_grams AS (
  SELECT doc_id, unnest(sh) AS gram FROM doc_sh
),
matches AS (
  SELECT doc_id, count(*) AS matched_grams
  FROM doc_grams JOIN bench USING (gram)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(m.matched_grams, 0) AS matched_grams,
       COALESCE(m.matched_grams, 0) > 0 AS flagged
FROM (SELECT doc_id FROM documents) d
LEFT JOIN matches m USING (doc_id)
ORDER BY d.doc_id
"""
