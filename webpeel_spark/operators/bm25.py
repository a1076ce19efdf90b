"""Okapi BM25 ranking over a documents table.

Port of the reference's BM25 scorer (reference: src/core/bm25-filter.ts
:95-368 — k1=1.5, b=0.75) lifted from per-page markdown blocks to a
corpus-level DataFrame operator.  Two JVM-side passes, no Python UDFs:

1. corpus-stats pass — one hash-agg computing N, avgdl and per-term
   document frequencies (map-side combine; the result is a single
   driver-side row, broadcast back as literals);
2. scoring pass — per-document term frequencies via builtin
   ``filter``/``size`` array expressions, score as a literal-folded
   arithmetic expression, per-partition TakeOrdered for the top-k (no
   full sort).

Tokenization is ``[a-z0-9]+`` over the lowercased text — chosen to be
bit-reproducible in ANSI SQL (the DuckDB oracle in __spark_entry__
uses the same regex), unlike the reference's Porter-stemmed variant in
quick-answer.ts which is deliberately NOT ported here.
"""

from __future__ import annotations

import math
import re
from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K1 = 1.5   # bm25-filter.ts constant
B = 0.75   # bm25-filter.ts constant

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def query_terms(query: str) -> List[str]:
    """Unique lowercase query tokens, first-occurrence order."""
    return list(dict.fromkeys(_TOKEN_RE.findall(query.lower())))


def _words(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit("[a-z0-9]+"), 0)


def _tf(words: Column, term: str) -> Column:
    return F.size(F.filter(words, lambda w: w == F.lit(term)))


def bm25_rank(df: DataFrame, query: str, text_col: str = "text",
              id_col: str = "doc_id", top_k: int = 20,
              k1: float = K1, b: float = B) -> DataFrame:
    """Top-k documents by BM25 score for ``query``.

    Returns (id_col, bm25) with bm25 rounded to 4 decimals, ordered by
    score desc then id asc.  Scale shape: stats pass is one partial+
    final agg; scoring pass is narrow + TakeOrdered(k) — no shuffle of
    document text, only the tiny stats row crosses to the driver.
    """
    from ..plans.partitioning import fan_out

    terms = query_terms(query)
    if not terms:
        return df.sparkSession.createDataFrame([], f"{id_col} long, bm25 double")

    base = (
        fan_out(df.select(id_col, text_col))
        .select(F.col(id_col), _words(F.col(text_col)).alias("__w"))
        .withColumn("__dl", F.size("__w"))
        .persist()  # two passes below share the tokenization
    )

    # avgdl from an EXACT integer sum + one IEEE-exact division: a double
    # avg() accumulates in partition order, so its last ulp differs
    # between Spark and any oracle engine and can flip round(score, 4)
    # at the top-k boundary.  sum(long)/count is bit-reproducible.
    stats = base.agg(
        F.count("*").alias("n"),
        F.sum("__dl").alias("sdl"),
        *[F.sum((_tf(F.col("__w"), t) > 0).cast("long")).alias(f"df_{i}")
          for i, t in enumerate(terms)],
    ).first()
    n = stats["n"] or 0
    if n == 0:
        return df.sparkSession.createDataFrame([], f"{id_col} long, bm25 double")
    sdl = stats["sdl"] or 0
    avgdl = (float(sdl) / float(n)) if sdl else 1.0

    score: Column = F.lit(0.0)
    for i, t in enumerate(terms):
        df_t = stats[f"df_{i}"] or 0
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        tf = _tf(F.col("__w"), t).cast("double")
        denom = tf + k1 * (1.0 - b + b * F.col("__dl").cast("double") / F.lit(avgdl))
        score = score + F.lit(idf) * (tf * (k1 + 1.0)) / denom

    return (
        base.select(F.col(id_col), F.round(score, 4).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(top_k)
    )


def bm25_oracle_sql(query: str, top_k: int = 20,
                    k1: float = K1, b: float = B) -> str:
    """DuckDB SQL computing exactly bm25_rank over the ``documents`` view."""
    terms = query_terms(query)
    tf_cols = ",\n               ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n               ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    score_terms = " + ".join(
        f"(ln(1.0 + (s.n - s.df_{i} + 0.5) / (s.df_{i} + 0.5))"
        f" * (t.tf_{i} * ({k1} + 1.0))"
        f" / (t.tf_{i} + {k1} * (1.0 - {b} + {b} * t.dl / s.avgdl)))"
        for i in range(len(terms))
    )
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS w
          FROM documents
        ), t AS (
          SELECT doc_id,
                 CAST(len(w) AS BIGINT) AS dli,
                 CAST(len(w) AS DOUBLE) AS dl,
                 {tf_cols}
          FROM tok
        ), s AS (
          -- exact-integer sum + one division == Spark's sum(long)/count
          -- (a double avg() is summation-order dependent in the last ulp)
          SELECT count(*) AS n,
                 CASE WHEN sum(dli) = 0 OR sum(dli) IS NULL THEN 1.0
                      ELSE CAST(sum(dli) AS DOUBLE) / count(*) END AS avgdl,
               {df_cols}
          FROM t
        )
        SELECT t.doc_id, round({score_terms}, 4) AS bm25
        FROM t, s
        WHERE round({score_terms}, 4) > 0
        ORDER BY bm25 DESC, t.doc_id ASC
        LIMIT {top_k}
    """
