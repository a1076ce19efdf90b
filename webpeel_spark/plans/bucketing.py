"""Bucketed output tables — co-located downstream joins without shuffle.

At 10^12 rows, every downstream url-keyed join against the extraction
output (re-crawl diffs, annotation joins, quality-filter joins) pays a
full shuffle of the envelope table unless the data is pre-bucketed.
Writing the output with ``bucketBy(N, url)`` persists the hash
partitioning in the table metadata, so Spark plans url-equi-joins
between two such tables as zero-Exchange sort-merge joins — the
round-1 analog of Iceberg's bucket partition transform.

Verified in tests/test_bucketing.py: the joined plan contains NO
Exchange above either scan.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str = "url",
                   num_buckets: int = 16,
                   sort_cols: Optional[List[str]] = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Bucketed writes require the table catalog (saveAsTable) — plain
    ``parquet(path)`` cannot record bucket metadata.  Sorting within
    buckets additionally removes the per-side Sort from downstream
    sort-merge joins.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str = "url", how: str = "inner") -> DataFrame:
    """Join two identically-bucketed tables on the bucket column —
    plans with no Exchange when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table),
                                        on, how)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (excluding
    broadcast exchanges) — test helper for co-location claims."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(line.strip().startswith(("Exchange", "+- Exchange",
                                        ":- Exchange"))
               or "Exchange hashpartitioning" in line
               for line in plan.splitlines()
               if "BroadcastExchange" not in line)
