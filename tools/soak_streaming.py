"""Streaming change-tracking soak (round-6 directive): run
``stream_change_tracking`` over a two-snapshot 96k-page corpus and
report per-snapshot throughput plus state-store size — the 96k batch
soak exercises the stateless path only; this proves the stateful
``applyInPandasWithState`` operator holds the same scale without state
blowup.

    python tools/soak_streaming.py [--pages 96000] [--cores 16]
                                   [--rocksdb] [--ttl-days 30]

Snapshot 1 = the deterministic bench corpus with a fixed day-1
timestamp; snapshot 2 = the same pages at day 2 with a visible text
edit on every third url (hash-selected), so the second pass exercises
all three labels (changed / unchanged; 'added' covered by pass 1)
against 96k fingerprints of persisted GroupState.  Prints ONE JSON
line; numbers land in BENCH.md's soak section.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _corpus_parquet  # noqa: E402


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _write_snapshot(spark, corpus_path: str, input_dir: str, name: str,
                    day: int, edit_third: bool,
                    keep_half: bool = False, limit: int = 0) -> None:
    """One streaming input file-set: PAGES_SCHEMA columns, fixed
    deterministic timestamp, optional day-2 edit (an existing word in
    the BODY TEXT is mutated — injected markup near the container edge
    gets stripped as boilerplate by candidate selection/pruning, so
    only an edit to text the extractor actually keeps reliably moves
    the fingerprint; hash-selected rows whose kept content happens not
    to contain the word, and the PDF/DOCX payloads, stay unedited and
    correctly count as 'unchanged')."""
    from pyspark.sql import functions as F

    import datetime

    pages = spark.read.parquet(corpus_path).select("url", "html")
    if keep_half:
        pages = pages.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    if limit:
        pages = pages.orderBy("url").limit(limit)
    date = (datetime.date(2024, 3, 1)
            + datetime.timedelta(days=day - 1)).isoformat()
    ts = F.to_timestamp(F.lit(f"{date} 12:00:00"))
    html = F.col("html")
    if edit_third:
        as_str = F.col("html").cast("string")
        edited = F.encode(
            F.regexp_replace(as_str, "corpus", "korpus"), "UTF-8")
        html = F.when(
            (F.pmod(F.xxhash64("url"), F.lit(3)) == 0)
            & as_str.contains("corpus"), edited).otherwise(F.col("html"))
    df = pages.select(
        "url", ts.alias("warc_ts"), html.alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"))
    staging = os.path.join(input_dir, f".staging_{name}")
    df.write.mode("overwrite").parquet(staging)
    for i, part in enumerate(sorted(glob.glob(
            os.path.join(staging, "*.parquet")))):
        os.replace(part, os.path.join(input_dir, f"{name}_{i:04d}.parquet"))
    shutil.rmtree(staging, ignore_errors=True)


def _run_pass(spark, input_dir: str, out_dir: str, ck_dir: str,
              state_ttl=None) -> dict:
    from webpeel_spark.streaming.extract_stream import stream_change_tracking

    t0 = time.perf_counter()
    q = stream_change_tracking(spark, input_dir, out_dir, ck_dir,
                               state_ttl=state_ttl)
    q.awaitTermination()
    wall = time.perf_counter() - t0
    state = {}
    prog = q.lastProgress
    if prog:
        ops = prog.get("stateOperators") or []
        if ops:
            state = {
                "state_rows": ops[0].get("numRowsTotal"),
                "state_mem_bytes": ops[0].get("memoryUsedBytes"),
            }
    return {"wall_sec": round(wall, 3), **state}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=96000)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    ap.add_argument("--rocksdb", action="store_true",
                    help="RocksDB state store + changelog checkpointing "
                    "(the documented 10^12-url configuration) instead of "
                    "the in-memory HDFS-backed default")
    ap.add_argument("--ttl-days", type=int, default=0,
                    help="run with state_ttl='<N> days' and append two "
                    "eviction passes: half the urls revisit past the TTL "
                    "(re-added), then a single-url batch fires the "
                    "event-time timeouts — state_rows must drop to the "
                    "live-key count, evidencing the bounded-state story "
                    "at 10^12 urls")
    args = ap.parse_args()

    from webpeel_spark.session import get_spark

    corpus = _corpus_parquet(args.pages)
    work = tempfile.mkdtemp(prefix="wp_stream_soak_")
    inp = os.path.join(work, "input")
    out = os.path.join(work, "out")
    ck = os.path.join(work, "ck")
    os.makedirs(inp)

    spark = get_spark(app_name="stream-soak", cores=args.cores,
                      state_store="rocksdb" if args.rocksdb else "hdfs")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        # actual row count, not the requested n: the corpus generator
        # appends docx rows beyond n, and throughput must divide by
        # what actually flowed through the stream
        n_rows = spark.read.parquet(corpus).count()
        ttl = f"{args.ttl_days} days" if args.ttl_days else None
        _write_snapshot(spark, corpus, inp, "b0", day=1, edit_third=False)
        p1 = _run_pass(spark, inp, out, ck, state_ttl=ttl)
        _write_snapshot(spark, corpus, inp, "b1", day=2, edit_third=True)
        p2 = _run_pass(spark, inp, out, ck, state_ttl=ttl)

        eviction = None
        if ttl:
            # pass 3: HALF the urls revisit past the TTL — the in-
            # function last-seen rule re-adds them; pass 4: a one-url
            # batch runs with the watermark past the dead half's
            # last_seen+TTL, firing their event-time timeouts.  The
            # state-row count must land at the live-key count
            # (half + the probe url, which is in the kept half).
            past = args.ttl_days + 10
            n_half = (spark.read.parquet(corpus)
                      .where("pmod(xxhash64(url), 2) = 0").count())
            _write_snapshot(spark, corpus, inp, "b2", day=past,
                            edit_third=False, keep_half=True)
            p3 = _run_pass(spark, inp, out, ck, state_ttl=ttl)
            _write_snapshot(spark, corpus, inp, "b3", day=past + 1,
                            edit_third=False, keep_half=True, limit=1)
            p4 = _run_pass(spark, inp, out, ck, state_ttl=ttl)
            # eviction may land in pass 3 or pass 4: availableNow can
            # split a multi-file snapshot into several micro-batches,
            # and event-time timeouts fire one micro-batch after the
            # watermark passes last_seen+TTL — so the adjudicable
            # numbers are peak state (pass 2, every url tracked) vs
            # final state (must equal the live-key count)
            eviction = {
                "ttl": ttl, "live_urls": n_half,
                "pass3_past_ttl_revisit": {
                    **p3, "docs_per_sec":
                    round(n_half / p3["wall_sec"], 1)},
                "pass4_probe": p4,
                "state_rows_peak": p2.get("state_rows"),
                "state_rows_final": p4.get("state_rows"),
                "evicted": (p2.get("state_rows") or 0)
                - (p4.get("state_rows") or 0),
                "final_equals_live": p4.get("state_rows") == n_half,
            }

        from pyspark.sql import functions as F
        res = spark.read.parquet(out)
        labels = {r["change"]: r["n"] for r in
                  res.groupBy("change").agg(F.count("*").alias("n")).collect()}
        ck_bytes = _dir_bytes(ck)
        print(json.dumps({
            "metric": "stream_change_tracking_soak",
            "pages_per_snapshot": n_rows,
            "cores": args.cores,
            "state_store": "rocksdb" if args.rocksdb else "hdfs",
            "pass1": {**p1, "docs_per_sec":
                      round(n_rows / p1["wall_sec"], 1)},
            "pass2": {**p2, "docs_per_sec":
                      round(n_rows / p2["wall_sec"], 1)},
            **({"eviction": eviction} if eviction else {}),
            "labels": labels,
            "checkpoint_bytes": ck_bytes,
            "state_bytes_per_url": round(
                (p2.get("state_mem_bytes") or 0) / n_rows, 1),
        }))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
