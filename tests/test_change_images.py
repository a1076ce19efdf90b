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
