"""Cluster job driver — the spark-submit entry point of the north rule.

    python tools/package_pyfiles.py
    spark-submit --py-files dist/webpeel_spark.zip tools/run_job.py \
        --input  /path/to/pages_table \
        --output /path/to/out_dir \
        --run-id crawl-2026-08 \
        --num-buckets 4096 --buckets-per-commit 64

Reads the Common-Crawl-style pages table (url, warc_ts, html, text,
lang), runs the checkpointed extraction (resumable: re-submitting with
the same --run-id skips completed buckets via the progress table), and
prints the run summary as one JSON line.  Locally runnable without
spark-submit too: ``python tools/run_job.py --local-demo``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages table path (parquet dir, "
                    "or WARC glob with --input-format warc)")
    ap.add_argument("--input-format", choices=["parquet", "warc"],
                    default="parquet",
                    help="'warc' reads .warc/.warc.gz segments directly "
                    "(one task per segment, Common Crawl layout)")
    ap.add_argument("--output", help="output dir (data + _progress)")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--buckets-per-commit", type=int, default=8)
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--local-demo", action="store_true",
                    help="self-contained demo: synthesize a corpus, run, resume")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from webpeel_spark.plans.checkpoint import run_extraction_checkpointed

    if args.local_demo:
        import tempfile

        from webpeel_spark.session import get_spark
        from webpeel_spark.sources.corpus import write_corpus_parquet

        tmp = tempfile.mkdtemp(prefix="wp_job_demo_")
        inp = os.path.join(tmp, "pages")
        os.makedirs(inp)
        write_corpus_parquet(os.path.join(inp, "part-0.parquet"), 300,
                             seed=42, docx_fraction=0.02)
        spark = get_spark(app_name="run-job-demo", cores=8)
        spark.sparkContext.setLogLevel("ERROR")
        out = os.path.join(tmp, "out")
        pages = spark.read.parquet(inp)
        s1 = run_extraction_checkpointed(
            spark, pages, out, run_id="demo", num_buckets=8,
            buckets_per_commit=4, num_partitions=8)
        # resume: second invocation must skip everything
        s2 = run_extraction_checkpointed(
            spark, pages, out, run_id="demo", num_buckets=8,
            buckets_per_commit=4, num_partitions=8)
        print(json.dumps({"first_run": s1, "resume": s2}))
        spark.stop()
        return

    if not args.input or not args.output:
        ap.error("--input and --output are required (or use --local-demo)")

    # under spark-submit the session (master, executors, --py-files) is
    # provided by the submitter; only job-level SQL conf is set here
    spark = (SparkSession.builder.appName(f"webpeel-extract-{args.run_id}")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
             .config("spark.sql.parquet.compression.codec", "zstd")
             .getOrCreate())
    if args.input_format == "warc":
        from webpeel_spark.sources.warc import read_warc

        pages = read_warc(spark, args.input)
    else:
        pages = spark.read.parquet(args.input)
    summary = run_extraction_checkpointed(
        spark, pages, args.output, run_id=args.run_id,
        num_buckets=args.num_buckets,
        buckets_per_commit=args.buckets_per_commit,
        num_partitions=args.num_partitions)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
