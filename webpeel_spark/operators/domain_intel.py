"""Per-domain fetch-strategy intelligence table (ee/domain-intel.ts),
the premium server's in-memory LRU rebuilt as a batch profile build.

``build_domain_intel`` folds a fetch-outcome log —
(url, method, latency_ms, ts) — into one DomainIntel row per domain
with the reference's exact order-dependent semantics (EMA latency,
TTL-gap restart, sticky flags): groups shuffle on the domain key, each
group sorts by timestamp and left-folds through the pure
``fold_intel``.  Domain groups are bounded (one domain's fetch log);
the shuffle is the only wide stage — same shape as the sibling
``build_domain_memory``.

``recommend_modes`` is pure Catalyst over the profile table (the
MIN_SAMPLES ramp and all-samples rules are one CASE expression); at
serving time the profiles broadcast against the next crawl batch so
escalation (simple→browser→stealth) is skipped for known-hard
domains.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pure.domain_intel import MIN_SAMPLES, TTL_MS

INTEL_SCHEMA = (
    "domain string, needs_browser boolean, needs_stealth boolean, "
    "avg_latency_ms double, last_seen long, sample_count long, "
    "simple_count long, browser_count long, stealth_count long"
)


def build_domain_intel(df: DataFrame, url_col: str = "url",
                       ts_col: str = "ts") -> DataFrame:
    """Fetch-outcome log → one DomainIntel profile row per domain.

    ``ts_col`` is epoch milliseconds (long).  Rows whose url has no
    parseable hostname are dropped, matching the reference's
    early-return on an empty domain key (domain-intel.ts:111-112).
    """

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        from webpeel_spark.pure.domain_intel import fold_intel

        # deterministic fold order: ts, then method/latency tiebreak
        # (a stable sort alone would inherit shuffle arrival order)
        pdf = pdf.sort_values([ts_col, "method", "latency_ms"],
                              kind="mergesort")
        entry = fold_intel(pdf["__domain"].iloc[0], (
            {"method": r["method"], "latency_ms": r["latency_ms"],
             "ts": r[ts_col]}
            for _, r in pdf.iterrows()))
        return pd.DataFrame([(
            entry["domain"], entry["needs_browser"], entry["needs_stealth"],
            float(entry["avg_latency_ms"]), int(entry["last_seen"]),
            entry["sample_count"], entry["simple_count"],
            entry["browser_count"], entry["stealth_count"],
        )], columns=[f.split(" ")[0] for f in INTEL_SCHEMA.split(", ")])

    @F.pandas_udf("string")
    def domain_of(urls: "pd.Series") -> "pd.Series":
        from webpeel_spark.pure.domain_intel import domain_key

        return urls.map(lambda u: domain_key(u or ""))

    return (df.withColumn("__domain", domain_of(F.col(url_col)))
            .filter(F.col("__domain") != "")
            .groupBy("__domain").applyInPandas(fold, INTEL_SCHEMA))


def recommend_modes(profiles: DataFrame,
                    now_ms: int | None = None) -> DataFrame:
    """getDomainRecommendation over the whole profile table
    (domain-intel.ts:66-104) — (domain, mode) with mode in
    ('stealth', 'browser', NULL).  ``now_ms`` applies the 1-hour TTL
    cut (ts:74-78); omitted = as of each profile's last record."""
    n = F.col("sample_count")
    mode = (
        F.when(n < MIN_SAMPLES, F.lit(None).cast("string"))
        .when((F.col("stealth_count") == n) & F.col("needs_stealth"),
              F.lit("stealth"))
        .when((F.col("simple_count") == 0)
              & (F.col("browser_count") + F.col("stealth_count") == n)
              & F.col("needs_browser"), F.lit("browser"))
        .otherwise(F.lit(None).cast("string"))
    )
    if now_ms is not None:
        mode = F.when(F.lit(now_ms) - F.col("last_seen") > TTL_MS,
                      F.lit(None).cast("string")).otherwise(mode)
    return profiles.select("domain", mode.alias("mode"),
                           "avg_latency_ms", "sample_count")
