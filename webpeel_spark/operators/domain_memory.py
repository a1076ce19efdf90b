"""The ``domain_memory`` table the reference left as a TODO
(domain-memory.ts:215-228 Postgres sync stubs), built in one pass.

``build_domain_memory`` folds a fetch/extraction result log —
(url, method, response_ms, quality, was_blocked, had_javascript, ts)
— into one profile row per registered domain with the reference's
exact order-dependent semantics: groups shuffle on the domain key,
each group sorts by ``ts`` and left-folds through the pure
``fold_results``.  Domain-keyed groups are naturally bounded (one
domain's fetch log), and the fold is O(group); the shuffle is the
only wide stage.

``recommend_methods`` and ``top_domains`` are pure Catalyst over the
profile table (the confidence ramp is a CASE expression, top-N a
TakeOrdered) — at serving time the profiles are a broadcast dimension
table against the next crawl batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_SCHEMA = (
    "domain string, best_method string, avg_response_ms double, "
    "success_count long, last_success timestamp, avg_quality double, "
    "requires_js boolean, has_antibot boolean, total_attempts long"
)


def build_domain_memory(df: DataFrame, url_col: str = "url",
                        ts_col: str = "ts") -> DataFrame:
    """Result log → one DomainMemoryEntry row per domain."""

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        from webpeel_spark.pure.domain_memory import fold_results

        pdf = pdf.sort_values(ts_col, kind="mergesort")
        domain = pdf["__domain"].iloc[0]
        entry = fold_results(domain, (
            {"method": r["method"], "response_ms": r["response_ms"],
             "quality": r["quality"],
             "was_blocked": bool(r.get("was_blocked")),
             "had_javascript": bool(r.get("had_javascript")),
             "ts": r[ts_col]}
            for _, r in pdf.iterrows()))
        return pd.DataFrame([(
            entry["domain"], entry["best_method"],
            float(entry["avg_response_ms"]), entry["success_count"],
            entry["last_success"], float(entry["avg_quality"]),
            entry["requires_js"], entry["has_antibot"],
            entry["total_attempts"],
        )], columns=[f.split(" ")[0] for f in PROFILE_SCHEMA.split(", ")])

    @F.pandas_udf("string")
    def domain_of(urls: "pd.Series") -> "pd.Series":
        from webpeel_spark.pure.domain_memory import normalise_domain

        return urls.map(lambda u: normalise_domain(u or ""))

    return (df.withColumn("__domain", domain_of(F.col(url_col)))
            .groupBy("__domain").applyInPandas(fold, PROFILE_SCHEMA))


def recommend_methods(profiles: DataFrame) -> DataFrame:
    """getRecommendedMethod over the whole profile table — the
    confidence ramp (ts:152-163) as a codegen CASE expression."""
    c = F.col("success_count")
    conf = (F.when(c >= 10, F.lit(0.95))
            .when(c >= 5, F.lit(0.8) + (c - 5) / F.lit(5.0) * F.lit(0.15))
            .when(c >= 2, F.lit(0.3) + (c - 1) / F.lit(4.0) * F.lit(0.5))
            .otherwise(F.lit(0.3)))
    return profiles.select(
        "domain", F.col("best_method").alias("method"),
        conf.alias("confidence"), "avg_response_ms", "requires_js")


def top_domains(profiles: DataFrame, n: int = 20) -> DataFrame:
    """getDomainMemoryStats topDomains — success-count top-N
    (TakeOrdered, no full sort)."""
    return (profiles.select("domain", "best_method", "success_count")
            .orderBy(F.desc("success_count"), "domain").limit(n))
