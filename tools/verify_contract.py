"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and, where an
``oracle_sql()`` entry exists, the same SQL on DuckDB over the parquet
tables; compares row count + order-insensitive value hash with columns
sorted by name.

Floats hash at FULL precision (``repr``) by default — strictly
stronger than any float canonicalization the driver could apply, so a
one-ulp divergence fails HERE first instead of only in the driver's
run (round-6 rule: checkpoint_lineage was driver-red twice while the
old 6-sig-digit normalization stayed green).  Set
``SPARK_GRAFT_FLOAT_NORM=6g`` to reproduce the legacy lenient mode
when triaging whether a red is an ulp or a real value difference.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from webpeel_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


_FLOAT_NORM = os.environ.get("SPARK_GRAFT_FLOAT_NORM", "repr")


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if _FLOAT_NORM == "6g":
            return f"{v:.6g}"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(_norm(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    # default 8 for gate speed; the evaluation driver runs 32 — set
    # SPARK_GRAFT_VERIFY_CPUS=32 to reproduce its partial-agg
    # partitioning when chasing partition-order-sensitive reds
    spark = get_spark(cores=int(os.environ.get(
        "SPARK_GRAFT_VERIFY_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    only = sys.argv[1:] or None

    if len(qs) > 50:
        print(f"FAIL  registry: {len(qs)} queries() entries — the "
              f"driver evaluates only the first 50")
        failures += 1
    else:
        print(f"ok    registry: {len(qs)}/50 queries() entries")

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            # emulate the driver's pandas canonicalizer: it sorts the
            # result with sort_values over ALL columns, which raises
            # "unhashable type: 'list'" on ArrayType/MapType cells —
            # catch that here before the driver does (round-3 lesson)
            import pandas as _pd
            _pdf = _pd.DataFrame(srows, columns=scols)
            if len(_pdf):
                _pdf.sort_values(by=list(scols), inplace=False)
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            failures += 1
            continue
        ok_count = len(srows) == len(orows)
        ok_schema = sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols)
        sh = value_hash(srows, [c.lower() for c in scols])
        oh = value_hash(orows, [c.lower() for c in ocols])
        ok_hash = sh == oh
        status = "OK   " if (ok_count and ok_schema and ok_hash) else "FAIL "
        if status.startswith("FAIL"):
            failures += 1
        print(f"{status} {name}: rows {len(srows)}/{len(orows)} "
              f"schema={'Y' if ok_schema else 'N'} hash={'Y' if ok_hash else 'N'}")
        if not ok_hash and ok_count and ok_schema:
            order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i].lower())
            sset = sorted("\x1f".join(_norm(r[i]) for i in order) for r in srows)
            oset = sorted("\x1f".join(_norm(r[i]) for i in oorder) for r in orows)
            for a, b in zip(sset, oset):
                if a != b:
                    print(f"   spark : {a[:160]}")
                    print(f"   oracle: {b[:160]}")
                    break
    spark.stop()
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
