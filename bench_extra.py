"""Optimization-round measurement harness (guide §1) — NOT the frozen bench.

``bench.py`` is the driver's measured artifact and stays untouched; this
file exists for per-query analysis during optimization rounds:

* isolates one query at a time, timed with the same ``.count()``
  methodology the frozen bench uses (plus optional ``--noop`` sink per
  guide §1.4 — eager full-column materialization);
* captures ``.explain("formatted")`` into ``plans/<round>/`` with a
  ``_before``/``_after`` suffix so plan-shape claims are checkable;
* labels jobs via ``setJobDescription`` (guide §1.5).

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 \
      --queries ngram_jaccard simhash_near_dups --runs 3 \
      --explain-dir plans/r11 --suffix _before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--runs", type=int, default=3,
                    help="warm runs after the cold run (min reported)")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--noop", action="store_true",
                    help="time with the noop sink instead of count()")
    ap.add_argument("--explain-dir", default=None,
                    help="dump .explain('formatted') per query here")
    ap.add_argument("--suffix", default="",
                    help="file suffix for explain dumps (_before/_after)")
    args = ap.parse_args()

    from webpeel_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench-extra", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def execute(df) -> None:
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    out = {"sf_dir": args.sf_dir, "mode": "noop" if args.noop else "count",
           "queries": {}}
    for name in args.queries:
        fn = qs[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf_dir).explain("formatted")
            spark.catalog.clearCache()
            path = os.path.join(args.explain_dir,
                                f"{name}{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
        times = []
        for i in range(args.runs + 1):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            execute(fn(spark, args.sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        out["queries"][name] = {
            "cold": times[0], "warm_min": min(times[1:]) if len(times) > 1
            else None, "runs": times}
        print(f"## {name}: cold={times[0]} warm={times[1:]}",
              file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
