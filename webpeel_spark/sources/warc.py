"""WARC files → the engine's pages table (url, warc_ts, html).

Real Common Crawl arrives as millions of ~1 GB ``.warc.gz`` segments.
The scale-correct Spark shape is NOT ``binaryFile`` (which
materializes a whole segment as one row): distribute the *paths* and
stream-parse each file inside an Arrow-batched stage, yielding pages
in bounded batches — one task per segment, constant memory per task,
scan parallelism = number of segments (millions at 10^12 rows).

    pages = read_warc(spark, "/data/cc/segments/*.warc.gz")
    out = extract_pages(pages)

Composes directly with ``extract_pages`` / the checkpointed runner;
``warc_ts`` parses the ISO WARC-Date so event-time streaming rollups
work unchanged.
"""

from __future__ import annotations

import glob as _glob
import zlib
from typing import Iterator, List, Optional, Union

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PAGES_SCHEMA = "url string, warc_ts timestamp, html binary"
_BATCH = 64  # pages per yielded Arrow batch — bounds task memory


def _expand(paths: Union[str, List[str]]) -> List[str]:
    if isinstance(paths, str):
        paths = [paths]
    out: List[str] = []
    for p in paths:
        hits = sorted(_glob.glob(p))
        out.extend(hits if hits else [p])
    return out


def read_warc(spark: SparkSession, paths: Union[str, List[str]],
              num_partitions: Optional[int] = None) -> DataFrame:
    """(url, warc_ts, html) rows from .warc / .warc.gz files.

    Each input file is one unit of parallelism; ``num_partitions``
    spreads files across tasks (default: one partition per file, the
    right shape when files are segment-sized)."""
    files = _expand(paths)
    if not files:
        return spark.createDataFrame([], _PAGES_SCHEMA)
    n = num_partitions or len(files)
    paths_df = spark.createDataFrame([(p,) for p in files], "path string") \
        .repartition(n, "path")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from webpeel_spark.pure.warc import iter_warc_responses

        cols = ["url", "warc_ts", "html"]
        for pdf in it:
            rows = []
            for path in pdf["path"]:
                # generators raise lazily: a corrupted gzip member
                # surfaces mid-ITERATION — as BadGzipFile (⊂ OSError)
                # for header corruption, zlib.error for corrupted
                # deflate data, EOFError for truncation — so the guard
                # must wrap the loop AND cover all three.  Records
                # read before the corruption point are kept, the rest
                # of the segment is skipped, the task survives.
                try:
                    for rec in iter_warc_responses(path):
                        ts = pd.to_datetime(rec.warc_date, utc=True,
                                            errors="coerce")
                        rows.append((rec.target_uri,
                                     None if ts is pd.NaT
                                     else ts.tz_localize(None),
                                     rec.body))
                        if len(rows) >= _BATCH:
                            yield pd.DataFrame(rows, columns=cols)
                            rows = []
                except (OSError, EOFError, zlib.error):
                    continue
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return paths_df.mapInPandas(batches, _PAGES_SCHEMA)


def warc_to_pages_parquet(spark: SparkSession,
                          paths: Union[str, List[str]],
                          out_dir: str,
                          num_partitions: Optional[int] = None) -> None:
    """Materialize WARC segments as the standard pages parquet table
    (the ingest step ahead of the checkpointed extraction run)."""
    read_warc(spark, paths, num_partitions) \
        .withColumn("text", F.lit(None).cast("string")) \
        .withColumn("lang", F.lit(None).cast("string")) \
        .write.mode("overwrite").parquet(out_dir)
