"""exact_dup_groups query vs its DuckDB oracle on a corpus that HAS
duplicate groups.

The driver's sf0.01 documents table contains no byte-identical texts,
so its oracle match for this query is vacuous (0 = 0 rows).  This test
plants real groups — including one larger than the 16-exemplar cap —
writes them as a documents.parquet the contract loader reads, and runs
BOTH sides (the registry query fn and the registered oracle SQL)
through the same compare the driver applies: row count, column set,
and per-row values with columns sorted by name.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def spark():
    from webpeel_spark.session import get_spark

    s = get_spark(app_name="test-exact-dup-oracle", cores=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_query_matches_oracle_with_planted_groups(spark, tmp_path):
    rows = []
    for i in range(40):                       # uniques
        rows.append((i, f"unique text number {i}"))
    for i in range(25):                       # over-cap group (25 > 16)
        rows.append((100 + i, "viral boilerplate page"))
    for i in range(3):                        # small group
        rows.append((200 + i, "cookie banner"))
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    sdf = entrymod.queries()["exact_dup_groups"](spark, sf_dir)
    scols = sorted(sdf.columns)
    srows = sorted(tuple(r[c] for c in scols) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}/*.parquet'")
    cur = con.execute(entrymod.oracle_sql()["exact_dup_groups"])
    ocols = [d[0] for d in cur.description]
    order = sorted(range(len(ocols)), key=lambda i: ocols[i])
    orows = sorted(tuple(row[i] for i in order) for row in cur.fetchall())

    assert scols == sorted(ocols)
    assert len(srows) == 2                    # only the two planted groups
    assert srows == orows
    by_count = {r[scols.index("dup_count")]: r for r in srows}
    big = by_count[25]
    assert big[scols.index("omitted_ids")] == 9
    assert big[scols.index("exemplar_ids")] == \
        ",".join(str(100 + i) for i in range(16))
    small = by_count[3]
    assert small[scols.index("omitted_ids")] == 0
    assert small[scols.index("exemplar_ids")] == "200,201,202"
