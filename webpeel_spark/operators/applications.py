"""Application-tracker operators (application-tracker.ts as a table).

The reference tracks job applications in a local JSON file; the
engine's analog is an applications TABLE — (id, url, title, company,
platform, status, applied_at, notes, …) — and the tracker's
operations become relational:

- duplicate detection → canonical-url anti-join (``filter_unapplied``
  keeps only scraped jobs with no 'applied' record), the batch shape
  of ``hasApplied`` per candidate;
- ``list(filter)`` → Catalyst filters + timestamp sort;
- ``stats()`` → one long-format counts table.

The applications table is user-scale (thousands of rows), so it is
always the broadcast side against a scraped jobs corpus.  URL
canonicalization (tracking-param strip) runs as a vectorized pandas
UDF over ``pure/application_tracker.normalise_url`` — node-fuzz-pinned
parity, too stateful for codegen regex.
"""

from __future__ import annotations

from datetime import datetime
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def canonical_job_url(urls: pd.Series) -> pd.Series:
    """Duplicate-detection key (application-tracker.ts:245-261)."""
    from webpeel_spark.pure.application_tracker import normalise_url

    return urls.map(lambda u: normalise_url(u or ""))


def filter_unapplied(jobs: DataFrame, applications: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """Scraped jobs minus those with an 'applied' record — the batch
    face of ``hasApplied`` (ts:113-118).  The applications side is
    tiny → broadcast anti-join, no shuffle of the jobs corpus."""
    applied = (applications.filter(F.col("status") == "applied")
               .select(canonical_job_url(F.col("url")).alias("__key"))
               .dropDuplicates(["__key"]))
    return (jobs.withColumn("__key", canonical_job_url(F.col(url_col)))
            .join(F.broadcast(applied), "__key", "left_anti")
            .drop("__key"))


def filter_applications(df: DataFrame,
                        platform: Optional[str] = None,
                        status: Optional[str] = None,
                        since: Optional[str] = None) -> DataFrame:
    """list(filter) (ts:124-148): platform/status case-insensitive,
    since-date inclusive, newest first."""
    out = df
    if platform:
        out = out.filter(F.lower("platform") == platform.lower())
    if status:
        out = out.filter(F.lower("status") == status.lower())
    if since:
        # try_to_timestamp: invalid applied_at strings drop out of the
        # comparison (the reference's NaN Date.parse), not the job
        out = out.filter(F.try_to_timestamp(F.col("applied_at"))
                         >= F.to_timestamp(F.lit(since)))
    return out.orderBy(F.try_to_timestamp(F.col("applied_at")).desc())


def application_stats(df: DataFrame, now: datetime) -> DataFrame:
    """stats() (ts:153-186) as a long-format counts table:
    (metric, key, n) with metrics total / by_platform / by_status /
    this_week / today.  ``now`` injected for determinism."""
    ts = F.try_to_timestamp(F.col("applied_at"))  # invalid → null
    week_ago = F.lit(now.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp") \
        - F.expr("INTERVAL 7 DAYS")
    today = F.lit(now.strftime("%Y-%m-%d"))

    totals = df.agg(
        F.count("*").alias("total"),
        F.sum(F.when(ts >= week_ago, 1).otherwise(0)).alias("this_week"),
        F.sum(F.when(F.date_format(ts, "yyyy-MM-dd") == today, 1)
              .otherwise(0)).alias("today"),
    ).select(F.explode(F.create_map(
        F.lit("total"), F.col("total"),
        F.lit("this_week"), F.col("this_week"),
        F.lit("today"), F.col("today"),
    )).alias("metric", "n")).select(
        "metric", F.lit("").alias("key"), F.col("n").cast("long"))

    by_platform = df.groupBy(F.col("platform").alias("key")).agg(
        F.count("*").cast("long").alias("n")).select(
        F.lit("by_platform").alias("metric"), "key", "n")
    by_status = df.groupBy(F.col("status").alias("key")).agg(
        F.count("*").cast("long").alias("n")).select(
        F.lit("by_status").alias("metric"), "key", "n")
    return totals.unionByName(by_platform).unionByName(by_status)
