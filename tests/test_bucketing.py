"""Bucketed tables: url-equi-joins between co-bucketed extraction
outputs plan WITHOUT a shuffle Exchange."""

import pytest


@pytest.fixture(scope="module")
def spark(tmp_path_factory):
    from webpeel_spark.session import get_spark

    s = get_spark(app_name="test-bucketing", cores=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    for t in ("b_old", "b_new", "u_plain", "u_plain2"):
        s.sql(f"DROP TABLE IF EXISTS {t}")


def _snapshots(spark):
    from webpeel_spark.operators.extract import extract_pages
    from webpeel_spark.sources.corpus import generate_rows

    rows = generate_rows(60, seed=11)
    df = spark.createDataFrame(
        [(r["url"], r["html"]) for r in rows], "url string, html binary")
    out = extract_pages(df, num_partitions=4).select("url", "fingerprint", "quality")
    return out, out.withColumnRenamed("quality", "quality2")


def test_bucketed_join_has_no_exchange(spark):
    from webpeel_spark.plans.bucketing import (
        bucketed_join, plan_has_exchange, write_bucketed,
    )

    old, new = _snapshots(spark)
    write_bucketed(old, "b_old", "url", num_buckets=4, sort_cols=["url"])
    write_bucketed(new, "b_new", "url", num_buckets=4, sort_cols=["url"])

    # force sort-merge joins: tiny test tables would otherwise broadcast,
    # which has no hash Exchange either and proves nothing about buckets
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_old", "b_new", on="url")
        assert not plan_has_exchange(joined), \
            joined._jdf.queryExecution().executedPlan().toString()
        assert joined.count() == 60  # correctness, not just plan shape

        # control: the same join over NON-bucketed tables must shuffle
        spark.table("b_old").write.mode("overwrite").saveAsTable("u_plain")
        spark.table("b_new").write.mode("overwrite").saveAsTable("u_plain2")
        control = spark.table("u_plain").join(spark.table("u_plain2"), "url")
        assert plan_has_exchange(control)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
