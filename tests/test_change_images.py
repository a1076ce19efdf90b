"""change_detection and extract_images_pages operators."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from webpeel_spark.session import get_spark

    s = get_spark(app_name="test-change", cores=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_change_detection_classifies(spark):
    from webpeel_spark.operators.extract import change_detection

    old = spark.createDataFrame(
        [("u1", "fp1"), ("u2", "fp2"), ("u3", "fp3")], "url string, fingerprint string")
    new = spark.createDataFrame(
        [("u2", "fp2"), ("u3", "fp3x"), ("u4", "fp4")], "url string, fingerprint string")
    got = {r["url"]: r["change"] for r in change_detection(old, new).collect()}
    assert got == {"u1": "removed", "u2": "unchanged",
                   "u3": "changed", "u4": "added"}


def test_extract_images_pages(spark):
    from webpeel_spark.operators.extract import extract_images_pages

    html = ('<html><body><img src="/a.png" alt="first" width="10" height="20">'
            '<img src="https://cdn.x.com/b.jpg"><img src="/a.png" alt="dup">'
            "</body></html>").encode()
    df = spark.createDataFrame([("https://site.com/p", html)],
                               "url string, html binary")
    rows = {r["src"]: r for r in extract_images_pages(df).collect()}
    assert "https://site.com/a.png" in rows         # absolutized
    assert "https://cdn.x.com/b.jpg" in rows
    assert len(rows) == 2                            # deduped by src
    # dedupe is map-set last-wins (metadata.ts:294,327)
    assert rows["https://site.com/a.png"]["alt"] == "dup"


# ── line diff (change-tracking.ts computeDiff port) ─────────────────────

def test_compute_diff_additions_and_deletions():
    from webpeel_spark.pure.diffs import compute_diff

    d = compute_diff("Line 1\nLine 2\nLine 3",
                     "Line 1\nLine 2 modified\nLine 3\nLine 4 added")
    assert d.additions > 0 and d.deletions > 0
    assert d.text


def test_compute_diff_change_types():
    from webpeel_spark.pure.diffs import compute_diff

    d = compute_diff("Line 1\nLine 2\nLine 3\nLine 4",
                     "Line 1\nLine 2 changed\nLine 4\nLine 5")
    types = {c.type for c in d.changes}
    assert "add" in types and "del" in types
    assert len(d.changes) > 0


def test_compute_diff_completely_different():
    from webpeel_spark.pure.diffs import compute_diff

    d = compute_diff("Original content",
                     "Completely different content with no overlap")
    assert d.additions > 0 and d.deletions > 0


def test_compute_diff_identical_and_empty():
    from webpeel_spark.pure.diffs import compute_diff

    same = compute_diff("a\nb", "a\nb")
    assert same.additions == 0 and same.deletions == 0
    empty = compute_diff("", "")
    assert empty.additions == 0 and empty.deletions == 0


def test_compute_diff_exact_counts():
    from webpeel_spark.pure.diffs import compute_diff

    # one modified line = 1 del + 1 add; one appended line = 1 add
    d = compute_diff("a\nb\nc", "a\nB\nc\nd")
    assert d.deletions == 1 and d.additions == 2


def test_change_detection_with_diff(spark):
    from pyspark.sql import functions as F
    from webpeel_spark.operators.extract import (
        change_detection_with_diff, extract_pages,
    )
    from webpeel_spark.sources.corpus import generate_rows

    rows = generate_rows(30, seed=3)
    data = [(r["url"], r["html"]) for r in rows]
    pages = spark.createDataFrame(data, "url string, html binary")
    old_ext = extract_pages(pages)
    is_doc = F.col("url").endswith(".pdf") | F.col("url").endswith(".docx")
    new_pages = pages.withColumn(
        "html",
        F.when((F.pmod(F.xxhash64("url"), F.lit(3)) == 0) & ~is_doc,
               F.encode(F.regexp_replace(F.decode("html", "utf-8"),
                                         "content", "content-v2"), "utf-8"))
        .otherwise(F.col("html")))
    new_ext = extract_pages(new_pages)
    out = {r["url"]: r
           for r in change_detection_with_diff(old_ext, new_ext).collect()}
    changed = [r for r in out.values() if r["change"] == "changed"]
    unchanged = [r for r in out.values() if r["change"] == "unchanged"]
    assert changed and unchanged
    for r in changed:
        assert r["additions"] is not None and r["additions"] >= 0
        assert r["deletions"] is not None
        assert (r["additions"] + r["deletions"]) > 0
    for r in unchanged:
        assert r["additions"] is None and r["deletions"] is None
