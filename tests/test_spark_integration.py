"""Spark integration tests: distributed results == pure-layer results
byte-for-byte, checkpoint/resume idempotency, operator determinism."""

import os
import shutil
import tempfile

import pytest

from webpeel_spark.sources.corpus import generate_rows

pyspark = pytest.importorskip("pyspark")


@pytest.fixture(scope="module")
def spark():
    from webpeel_spark.session import get_spark

    s = get_spark("webpeel-tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="module")
def pages_df(spark):
    rows = generate_rows(120, seed=42)
    data = [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows]
    return spark.createDataFrame(
        data, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).cache()


class TestExtractOperator:
    def test_distributed_equals_local(self, spark, pages_df):
        """The mapInPandas stage must produce exactly what the pure layer
        produces per row — the vectorization is transparent."""
        from webpeel_spark.operators.extract import extract_pages
        from webpeel_spark.pure.pipeline import extract_page

        out = extract_pages(pages_df, num_partitions=4)
        got = {r["url"]: (r["fingerprint"], r["status"], r["word_count"])
               for r in out.collect()}

        rows = generate_rows(120, seed=42)
        assert len(got) == len(rows)
        for row in rows:
            local = extract_page(row["url"], row["html"])
            assert got[row["url"]] == (
                local["fingerprint"], local["status"], local["word_count"]
            ), f"distributed != local for {row['url']}"

    def test_schema_stable(self, spark, pages_df):
        from webpeel_spark.operators.extract import EXTRACT_SCHEMA, extract_pages

        out = extract_pages(pages_df.limit(5))
        assert out.schema == EXTRACT_SCHEMA

    def test_error_isolation(self, spark):
        """A row that breaks mid-pipeline yields an error row, not a task
        failure (truncated PDF magic → parse error)."""
        from webpeel_spark.operators.extract import extract_pages

        df = spark.createDataFrame(
            [("https://x.com/broken.pdf", b"%PDF-1.4 garbage with no structure")],
            "url string, html binary",
        )
        rows = extract_pages(df).collect()
        assert len(rows) == 1
        assert rows[0]["status"] in ("ok", "error")  # never raises


class TestCheckpoint:
    def test_resume_skips_completed(self, spark, pages_df):
        from webpeel_spark.plans.checkpoint import (
            completed_buckets, run_extraction_checkpointed,
        )

        out_dir = tempfile.mkdtemp(prefix="wp_ckpt_")
        try:
            s1 = run_extraction_checkpointed(
                spark, pages_df, out_dir, run_id="r1",
                num_buckets=4, buckets_per_commit=2,
            )
            assert sorted(s1["processed_buckets"]) == [0, 1, 2, 3]
            assert s1["rows"] == 120
            assert completed_buckets(spark, out_dir, "r1") == [0, 1, 2, 3]

            # second run: everything already done → no work
            s2 = run_extraction_checkpointed(
                spark, pages_df, out_dir, run_id="r1",
                num_buckets=4, buckets_per_commit=2,
            )
            assert s2["processed_buckets"] == []
            assert s2["skipped_buckets"] == [0, 1, 2, 3]

            # output parquet holds each url exactly once (idempotent)
            data = spark.read.parquet(os.path.join(out_dir, "data"))
            assert data.count() == 120
            assert data.select("url").distinct().count() == 120
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    def test_changed_input_snapshot_reextracts(self, spark, pages_df):
        """Re-submitting the same run_id against a CHANGED input must not
        silently skip buckets extracted from the old snapshot (mixed
        lineage); they are reported stale and re-extracted."""
        from webpeel_spark.plans.checkpoint import run_extraction_checkpointed

        out_dir = tempfile.mkdtemp(prefix="wp_ckpt_snap_")
        try:
            run_extraction_checkpointed(
                spark, pages_df, out_dir, run_id="r1",
                num_buckets=4, buckets_per_commit=4,
                input_snapshot_id="snap-A",
            )
            s2 = run_extraction_checkpointed(
                spark, pages_df.limit(60), out_dir, run_id="r1",
                num_buckets=4, buckets_per_commit=4,
                input_snapshot_id="snap-B",
            )
            assert s2["stale_snapshot_buckets"] == [0, 1, 2, 3]
            assert s2["skipped_buckets"] == []
            assert sorted(s2["processed_buckets"]) == [0, 1, 2, 3]
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)


class TestCheckpointCrashConsistency:
    """The crash-consistency half of the north rule ("resumes
    idempotently"): a run killed between commit groups, then resumed,
    must leave EXACTLY the progress table and output an uninterrupted
    run leaves."""

    def test_crash_mid_run_then_resume_matches_uninterrupted(
            self, spark, pages_df, monkeypatch):
        import webpeel_spark.plans.checkpoint as ckpt

        clean_dir = tempfile.mkdtemp(prefix="wp_ckpt_clean_")
        crash_dir = tempfile.mkdtemp(prefix="wp_ckpt_crash_")
        try:
            s_clean = ckpt.run_extraction_checkpointed(
                spark, pages_df, clean_dir, run_id="r1",
                num_buckets=4, buckets_per_commit=1,
                input_snapshot_id="snap-A",
            )
            assert s_clean["rows"] == 120

            # crash after the 2nd commit group (4 groups of 1 bucket)
            real_extract = ckpt.extract_pages
            calls = {"n": 0}

            def dying_extract(df, options=None, num_partitions=None):
                calls["n"] += 1
                if calls["n"] == 3:
                    raise RuntimeError("simulated executor crash")
                return real_extract(df, options=options,
                                    num_partitions=num_partitions)

            monkeypatch.setattr(ckpt, "extract_pages", dying_extract)
            with pytest.raises(RuntimeError, match="simulated executor crash"):
                ckpt.run_extraction_checkpointed(
                    spark, pages_df, crash_dir, run_id="r1",
                    num_buckets=4, buckets_per_commit=1,
                    input_snapshot_id="snap-A",
                )
            monkeypatch.setattr(ckpt, "extract_pages", real_extract)

            # exactly the two committed buckets survive the crash
            done = ckpt.completed_buckets(spark, crash_dir, "r1", "snap-A")
            assert len(done) == 2

            s_resume = ckpt.run_extraction_checkpointed(
                spark, pages_df, crash_dir, run_id="r1",
                num_buckets=4, buckets_per_commit=1,
                input_snapshot_id="snap-A",
            )
            assert sorted(s_resume["skipped_buckets"]) == done
            assert sorted(done + s_resume["processed_buckets"]) == [0, 1, 2, 3]

            # progress tables identical up to commit timestamps
            cols = [c for c in ckpt.read_progress(spark, clean_dir).columns
                    if c != "completed_at_ts"]
            p_clean = {tuple(r) for r in ckpt.read_progress(
                spark, clean_dir).select(*cols).collect()}
            p_crash = {tuple(r) for r in ckpt.read_progress(
                spark, crash_dir).select(*cols).collect()}
            assert p_crash == p_clean

            # output data identical row-for-row (url → fingerprint)
            d_clean = {(r["url"], r["fingerprint"]) for r in spark.read
                       .parquet(os.path.join(clean_dir, "data"))
                       .select("url", "fingerprint").collect()}
            d_crash = {(r["url"], r["fingerprint"]) for r in spark.read
                       .parquet(os.path.join(crash_dir, "data"))
                       .select("url", "fingerprint").collect()}
            assert d_crash == d_clean
        finally:
            shutil.rmtree(clean_dir, ignore_errors=True)
            shutil.rmtree(crash_dir, ignore_errors=True)

    def test_transient_error_retried_and_clean(self, spark, pages_df,
                                               monkeypatch):
        """retry_on_error=1: a transient status='error' row on the first
        attempt of a group is re-extracted; the committed progress table
        shows a clean run (the round-7 checkpoint_lineage guard)."""
        import pyspark.sql.functions as SF

        import webpeel_spark.plans.checkpoint as ckpt

        out_dir = tempfile.mkdtemp(prefix="wp_ckpt_retry_")
        real_extract = ckpt.extract_pages
        calls = {"n": 0}

        def flaky_extract(df, options=None, num_partitions=None):
            calls["n"] += 1
            out = real_extract(df, options=options,
                               num_partitions=num_partitions)
            if calls["n"] == 1:  # first attempt only: inject one error
                victim = SF.col("url") == df.select("url").orderBy("url") \
                    .limit(1).collect()[0]["url"]
                out = (out
                       .withColumn("status", SF.when(victim, SF.lit("error"))
                                   .otherwise(SF.col("status")))
                       .withColumn("error", SF.when(
                           victim, SF.lit("injected transient"))
                           .otherwise(SF.col("error"))))
            return out

        try:
            monkeypatch.setattr(ckpt, "extract_pages", flaky_extract)
            s = ckpt.run_extraction_checkpointed(
                spark, pages_df, out_dir, run_id="r1",
                num_buckets=2, buckets_per_commit=2, retry_on_error=1,
            )
            assert calls["n"] == 2  # one retry happened
            assert s["errors"] == 0
            progress = ckpt.read_progress(spark, out_dir)
            rows = progress.collect()
            assert all(r["error_count"] == 0 for r in rows)
            assert all(r["first_error"] is None for r in rows)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    def test_persistent_error_lands_in_first_error(self, spark):
        """Without retries, a genuinely-broken document's message+url is
        recorded per bucket — never a bare count."""
        from webpeel_spark.plans.checkpoint import (
            read_progress, run_extraction_checkpointed,
        )

        df = spark.createDataFrame(
            [("https://x.com/broken.docx",
              b"PK\x03\x04 not a real zip file at all"),
             ("https://x.com/fine.html",
              b"<html><body><p>hello world page</p></body></html>")],
            "url string, html binary",
        )
        out_dir = tempfile.mkdtemp(prefix="wp_ckpt_err_")
        try:
            run_extraction_checkpointed(
                spark, df, out_dir, run_id="r1",
                num_buckets=1, buckets_per_commit=1,
            )
            row = read_progress(spark, out_dir).collect()[0]
            assert row["error_count"] == 1
            assert row["first_error"] is not None
            assert "https://x.com/broken.docx" in row["first_error"]
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)


class TestDedupOperators:
    def test_exact_dedup_keeps_one(self, spark):
        from webpeel_spark.operators.dedup import dedup_exact, exact_duplicate_groups

        df = spark.createDataFrame(
            [(1, "same text"), (2, "same text"), (3, "other text")],
            "doc_id long, text string",
        )
        groups = exact_duplicate_groups(df).collect()
        assert len(groups) == 1 and groups[0]["dup_count"] == 2
        kept = dedup_exact(df, order_col="doc_id").collect()
        assert sorted(r["doc_id"] for r in kept) == [1, 3]

    def test_minhash_finds_planted_near_dup(self, spark):
        from webpeel_spark.operators.dedup import minhash_near_duplicates

        base = ("the quick brown fox jumps over the lazy dog while the sun "
                "shines bright over the green hills and the river runs south")
        near = base.replace("bright", "brightly")
        far = "completely different words about spark partitions and shuffles here"
        df = spark.createDataFrame(
            [(1, base), (2, near), (3, far)], "doc_id long, text string"
        )
        pairs = minhash_near_duplicates(df, min_jaccard=0.5).collect()
        assert any(p["id_a"] == 1 and p["id_b"] == 2 for p in pairs)
        assert not any(3 in (p["id_a"], p["id_b"]) for p in pairs)

    def test_simhash_deterministic(self, spark):
        from webpeel_spark.operators.dedup import simhash_signatures

        df = spark.createDataFrame([(1, "hello world text")], "doc_id long, text string")
        a = simhash_signatures(df).collect()[0]["simhash"]
        b = simhash_signatures(df).collect()[0]["simhash"]
        assert a == b != 0


class TestSimilarity:
    def test_exact_topk_self_first(self, spark):
        from webpeel_spark.operators.similarity import cosine_topk

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = emb.filter("vec_id = 0").first()["embedding"]
        top = cosine_topk(emb, q, k=3).collect()
        assert top[0]["vec_id"] == 0
        assert top[0]["cosine"] == 1.0
        assert top[0]["cosine"] >= top[1]["cosine"] >= top[2]["cosine"]

    def test_lsh_contains_query(self, spark):
        from webpeel_spark.operators.similarity import srp_lsh_topk

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = emb.filter("vec_id = 0").first()["embedding"]
        top = srp_lsh_topk(emb, q, k=3, bits=6)
        ids = [r["vec_id"] for r in top.collect()]
        assert ids[0] == 0  # query's own bucket always contains it


class TestSaltedAgg:
    def test_salted_equals_plain(self, spark, pages_df):
        """Skew-safe two-stage agg must equal the naive groupBy."""
        from pyspark.sql import functions as F

        from webpeel_spark.plans.partitioning import (
            find_hot_hosts, salted_host_agg, url_host,
        )

        hot = find_hot_hosts(pages_df, threshold_fraction=0.05)
        assert hot  # Zipf corpus has hot hosts
        salted = {
            (r["host"]): (r["docs"], r["bytes"])
            for r in salted_host_agg(
                pages_df,
                {"docs": ("count", "*"), "bytes": ("sum", F.length("html"))},
                hot,
            ).collect()
        }
        plain = {
            r["host"]: (r["docs"], r["bytes"])
            for r in pages_df.groupBy(url_host().alias("host"))
            .agg(F.count("*").alias("docs"), F.sum(F.length("html")).alias("bytes"))
            .collect()
        }
        assert salted == plain


class TestExplainPlans:
    def test_column_pruning_reaches_scan(self, spark, tmp_path):
        """Parquet scan under the extraction stage must read only url+html."""
        import re

        from webpeel_spark.operators.extract import extract_pages

        rows = generate_rows(20, seed=1)
        data = [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows]
        p = str(tmp_path / "pages.parquet")
        spark.createDataFrame(
            data, "url string, warc_ts timestamp, html binary, text string, lang string"
        ).write.parquet(p)

        df = spark.read.parquet(p)
        plan = extract_pages(df)._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"ReadSchema: ([^\n]+)", plan)
        assert m, plan
        assert "url" in m.group(1) and "html" in m.group(1)
        assert "warc_ts" not in m.group(1) and "lang" not in m.group(1)


class TestDeterministicAvg:
    """The lineage/rollup averages must be invariant to partitioning —
    round(avg(double), 4) was not (round-4 driver red at 32 cores,
    green at local[8]); deterministic_avg aggregates exact integers."""

    # 7×0.87 + 1×0.88: centisum 697 → 697·100/8 = 8712.5 basis points,
    # exactly ON the rounding boundary that avg(double) flips across
    BOUNDARY = [0.87] * 7 + [0.88]

    def test_partition_invariant(self, spark):
        from webpeel_spark.operators.extract import deterministic_avg

        F = pyspark.sql.functions
        vals = self.BOUNDARY * 3 + [0.13, 0.29, 0.41, 0.57] * 25
        rows = [(i % 3, v) for i, v in enumerate(vals)]
        results = set()
        for parts in (1, 2, 7, 32):
            df = spark.createDataFrame(
                rows, "g int, quality double").repartition(parts)
            out = (df.groupBy("g")
                   .agg(deterministic_avg("quality").alias("aq"))
                   .orderBy("g").collect())
            results.add(tuple(r["aq"] for r in out))
        assert len(results) == 1, results

    def test_boundary_value_and_duckdb_parity(self, spark):
        """The half-boundary rounds UP on both engines (Spark HALF_UP,
        DuckDB half-away-from-zero — same for positives)."""
        import duckdb

        import __spark_entry__ as entry
        from webpeel_spark.operators.extract import deterministic_avg

        df = spark.createDataFrame([(v,) for v in self.BOUNDARY],
                                   "quality double")
        [r] = df.agg(deterministic_avg("quality").alias("aq")).collect()
        assert r["aq"] == 0.8713

        sql = (f"SELECT {entry._det_avg_sql('q', 100)} AS aq FROM "
               f"(SELECT unnest($1::DOUBLE[]) AS q)")
        got = duckdb.execute(sql, [self.BOUNDARY]).fetchone()[0]
        assert got == r["aq"]


class TestCheckpointLineageIntegrity:
    """Round-8 session fixes: single-source-of-truth lineage (progress
    derived from the committed output), empty-bucket completion, stale
    partition cleanup, and strict progress-table reads."""

    def test_empty_buckets_complete_and_skip_on_resume(self, spark):
        # 1 url → 63 of 64 buckets are empty; they must still get
        # zero-row progress rows (completed), or every resume re-runs
        # a full extraction job per empty bucket forever
        from webpeel_spark.plans.checkpoint import (
            completed_buckets, run_extraction_checkpointed,
        )

        df = spark.createDataFrame(
            [("https://x.com/a", b"<html><p>one page</p></html>")],
            "url string, html binary")
        out_dir = tempfile.mkdtemp(prefix="wp_ckpt_empty_")
        try:
            s1 = run_extraction_checkpointed(
                spark, df, out_dir, run_id="r1",
                num_buckets=64, buckets_per_commit=64,
            )
            assert len(s1["processed_buckets"]) == 64
            assert s1["rows"] == 1
            assert completed_buckets(spark, out_dir, "r1") == list(range(64))
            s2 = run_extraction_checkpointed(
                spark, df, out_dir, run_id="r1",
                num_buckets=64, buckets_per_commit=64,
            )
            assert s2["processed_buckets"] == []
            assert s2["skipped_buckets"] == list(range(64))
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    def test_stale_partition_cleared_when_bucket_empties(self, spark,
                                                         pages_df):
        # snapshot A fills every bucket; snapshot B (1 url) leaves most
        # buckets empty — their OLD partition dirs must not survive as
        # mixed-lineage output (dynamic overwrite alone never deletes a
        # partition absent from the new data)
        from webpeel_spark.plans.checkpoint import (
            run_extraction_checkpointed,
        )

        out_dir = tempfile.mkdtemp(prefix="wp_ckpt_stale_")
        try:
            run_extraction_checkpointed(
                spark, pages_df, out_dir, run_id="r1",
                num_buckets=4, buckets_per_commit=4,
                input_snapshot_id="snap-A",
            )
            one = pages_df.limit(1)
            run_extraction_checkpointed(
                spark, one, out_dir, run_id="r1",
                num_buckets=4, buckets_per_commit=4,
                input_snapshot_id="snap-B",
            )
            data = spark.read.parquet(os.path.join(out_dir, "data"))
            assert data.count() == 1  # ONLY snapshot-B rows remain
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    def test_read_progress_raises_on_corrupt_table(self, spark):
        # a corrupted progress table must raise, not masquerade as a
        # fresh run and silently discard all resume state
        from webpeel_spark.plans.checkpoint import (
            _progress_path, read_progress,
        )

        out_dir = tempfile.mkdtemp(prefix="wp_ckpt_corrupt_")
        try:
            assert read_progress(spark, out_dir) is None  # missing: None
            ppath = _progress_path(out_dir)
            os.makedirs(ppath)
            with open(os.path.join(ppath, "part-0000.parquet"), "wb") as f:
                f.write(b"this is not parquet")
            with pytest.raises(Exception):
                df = read_progress(spark, out_dir)
                assert df is not None
                df.collect()  # corruption may surface at read time
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    def test_progress_row_count_matches_committed_output(self, spark,
                                                         pages_df):
        # the lineage row is DERIVED from the committed parquet — the
        # two cannot diverge; recompute directly and compare
        from pyspark.sql import functions as F

        from webpeel_spark.plans.checkpoint import (
            read_progress, run_extraction_checkpointed,
        )

        out_dir = tempfile.mkdtemp(prefix="wp_ckpt_src_")
        try:
            run_extraction_checkpointed(
                spark, pages_df, out_dir, run_id="r1",
                num_buckets=4, buckets_per_commit=2,
            )
            prog = {int(r["bucket"]): (int(r["row_count"]),
                                       int(r["token_sum"]),
                                       int(r["quality_bp_sum"]))
                    for r in read_progress(spark, out_dir).collect()}
            direct = {int(r["bucket"]): (int(r["n"]), int(r["t"]),
                                         int(r["q"]))
                      for r in spark.read.parquet(
                          os.path.join(out_dir, "data"))
                      .groupBy("bucket")
                      .agg(F.count("*").alias("n"),
                           F.sum("token_estimate").alias("t"),
                           F.sum(F.round(F.col("quality") * 100, 0)
                                 .cast("long")).alias("q"))
                      .collect()}
            assert prog == direct
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)


def test_per_page_udtf_isolates_row_explosion(spark):
    """Per-row isolation covers the ROW-EXPLOSION too, not just the
    parse call: a page whose item-mapping raises (malformed item dict)
    drops that page's rows; every other page still emits.  The
    per-operator copies this helper replaced guarded only the parse,
    so one bad item failed the whole Spark task."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from webpeel_spark.operators.extract import _per_page_udtf

    schema = StructType([
        StructField("url", StringType(), False),
        StructField("n", LongType(), False),
    ])

    def factory():
        def rows(url, html):
            if "poison" in url:
                raise KeyError("text")  # malformed item mid-explosion
            return [(url, len(html))]
        return rows

    df = spark.createDataFrame(
        [("https://a.com/1", b"<p>a</p>"),
         ("https://b.com/poison", b"<p>b</p>"),
         ("https://c.com/3", b"<p>c</p>")],
        "url string, html binary")
    got = sorted(r["url"] for r in
                 _per_page_udtf(df, schema, factory).collect())
    assert got == ["https://a.com/1", "https://c.com/3"]
