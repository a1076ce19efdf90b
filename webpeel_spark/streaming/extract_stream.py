"""Structured Streaming ingestion for the extraction pipeline.

The reference's ``watch.ts`` polls a URL on an interval and
``change-tracking`` diffs sha256 fingerprints (pipeline.ts:1608-1616).
The batch-engine analog: new page files land in a directory (the
streaming face of a Common-Crawl-style table), Structured Streaming
picks them up incrementally, runs the SAME Arrow extraction UDF, and
appends results — the stream checkpoint gives exactly-once file
processing (the reference's "completed" map, crawl-checkpoint.ts:76-89,
for free from the engine).

Two entry points:

* ``stream_extraction``          — stateless map: pages → envelopes.
  ``mapInPandas`` is streaming-compatible, so the batch operator is
  reused verbatim; fingerprint column supports downstream change diffs.
* ``stream_extraction_metrics``  — watermarked sliding-window rollup
  (docs/tokens/errors per branch per window) for late-arriving pages.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: Optional[int] = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def extracted_stream(pages: DataFrame, options=None) -> DataFrame:
    """Extraction envelope stream — reuses the batch mapInPandas stage
    (stateless, so legal under streaming) with ``warc_ts`` carried
    through the UDF positionally (extraction is 1 row in → 1 row out,
    order-preserving), so downstream watermarked/event-time operators
    have their timestamp column without a post-extraction join."""
    from ..operators.extract import EXTRACT_SCHEMA, _make_extract_fn
    from ..pure.pipeline import DEFAULT_OPTIONS

    if options is None:
        options = DEFAULT_OPTIONS
    inner = _make_extract_fn(tuple(options))

    def with_ts(batches):
        for pdf in batches:
            ts = pdf["warc_ts"].reset_index(drop=True)
            for out in inner(iter([pdf])):
                out = out.reset_index(drop=True)
                out["warc_ts"] = ts[: len(out)]
                yield out

    from pyspark.sql.types import StructField, StructType, TimestampType

    schema = StructType(EXTRACT_SCHEMA.fields
                        + [StructField("warc_ts", TimestampType(), True)])
    return pages.select("url", "warc_ts", "html").mapInPandas(with_ts, schema)


def stream_extraction(spark: SparkSession, input_dir: str, out_dir: str,
                      checkpoint_dir: str, options=None,
                      available_now: bool = True):
    """Start (or resume) the extraction stream → parquet sink.

    ``available_now=True`` processes the current backlog then stops —
    the incremental-batch mode a scheduled 10^12-row ingestion job
    would use; set False for a continuous micro-batch stream.
    """
    pages = read_pages_stream(spark, input_dir)
    out = extracted_stream(pages, options).drop("chunks")
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_change_tracking(spark: SparkSession, input_dir: str,
                           out_dir: str, checkpoint_dir: str,
                           options=None, available_now: bool = True):
    """Stateful change tracking: per-url fingerprint state across
    micro-batches via ``applyInPandasWithState`` — the streaming face
    of watch.ts polling (batch analog: operators/extract
    .change_detection).  First sighting of a url emits ``added``;
    re-extractions emit ``changed``/``unchanged`` against the
    fingerprint held in GroupState, which the stream checkpoint
    persists — a restart resumes with every url's last-seen
    fingerprint intact.

    State size is one 64-hex fingerprint per url — at 10^12 urls this
    wants RocksDB state store + watermark-based state TTL; here the
    in-memory HDFS-backed store suffices.  Labels match
    change_detection (``removed`` cannot occur in an append-only
    stream: absence of new data for a url is not an event)."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    pages = read_pages_stream(spark, input_dir)
    envelopes = extracted_stream(pages, options).select(
        "url", "warc_ts", "fingerprint")

    def track(key, pdfs, state: GroupState):
        url = key[0]
        prev = state.get[0] if state.exists else None
        rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            # replay in event-time order so the state converges to the
            # newest fingerprint even if one micro-batch holds several
            batch = batch.sort_values("warc_ts")
            for _, row in batch.iterrows():
                fp = row["fingerprint"]
                if prev is None:
                    change = "added"
                elif fp != prev:
                    change = "changed"
                else:
                    change = "unchanged"
                rows.append((url, change, prev, fp, row["warc_ts"]))
                prev = fp
            state.update((prev,))
        yield pd.DataFrame(rows, columns=[
            "url", "change", "fingerprint_old", "fingerprint_new",
            "warc_ts"])

    changes = envelopes.groupBy("url").applyInPandasWithState(
        track,
        outputStructType=("url string, change string, "
                          "fingerprint_old string, fingerprint_new string, "
                          "warc_ts timestamp"),
        stateStructType="fingerprint string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        changes.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_extraction_metrics(spark: SparkSession, input_dir: str,
                              out_dir: str, checkpoint_dir: str,
                              window: str = "1 hour",
                              watermark: str = "2 hours",
                              available_now: bool = True,
                              max_files_per_trigger: Optional[int] = None):
    """Watermarked windowed rollup over the page stream: docs / bytes
    per (event-time window, lang), tolerating ``watermark`` of
    lateness before a window finalizes (append mode emits each window
    once, exactly the semantics a progress dashboard wants)."""
    pages = read_pages_stream(spark, input_dir, max_files_per_trigger)
    agg = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("docs"),
             F.sum(F.length("html")).alias("input_bytes"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "lang", "docs", "input_bytes")
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
