"""Multimodal header-metadata decode through the Spark operator: real
(non-ASCII) PNG/JPEG/GIF/BMP binary headers survive the
binary→Arrow→pandas path and come back as (format, width, height);
non-image payloads come back NULL — the round-6 un-stubbing of the
decode seam (feature vectors stay stubbed per the brief)."""

from __future__ import annotations

import pytest

from tests.test_imagemeta import (
    bmp_bytes,
    gif_bytes,
    jpeg_bytes,
    png_bytes,
)


@pytest.fixture(scope="module")
def spark():
    pytest.importorskip("pyspark")
    from webpeel_spark.session import get_spark

    s = get_spark(cores=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


def test_header_metadata_through_arrow(spark):
    from webpeel_spark.operators.multimodal import extract_features

    rows = [
        (0, "image", png_bytes(640, 480)),
        (1, "image", jpeg_bytes(1024, 768, with_app1=True)),
        (2, "image", gif_bytes(320, 200)),
        (3, "image", bmp_bytes(100, 50)),
        (4, "image", b"\x00\x01corrupt"),
        (5, "audio", b"RIFFxxxxWAVEfmt "),  # RIFF but not WEBP
        (6, "video", b"\x00\x00\x00\x18ftypmp42"),
        (7, "image", None),
    ]
    df = spark.createDataFrame(
        rows, "item_id long, kind string, payload binary")
    got = {r["item_id"]: r for r in extract_features(df).collect()}
    assert (got[0]["format"], got[0]["width"], got[0]["height"]) == \
        ("png", 640, 480)
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == \
        ("jpeg", 1024, 768)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == \
        ("gif", 320, 200)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == \
        ("bmp", 100, 50)
    for i in (4, 5, 6, 7):
        assert got[i]["format"] is None
        assert got[i]["width"] is None and got[i]["height"] is None
    # stub features + hashes still emitted for every row
    assert all(r["status"] == "ok" for r in got.values())
    assert len(got[0]["features"]) == 16
    assert got[7]["n_bytes"] == 0


def test_real_decode_path_through_arrow_without_pil(spark):
    """decode_stub=False in THIS container (no PIL on the executors):
    every row must come back with an `unimplemented:` status and empty
    features — per-row isolation, never a task failure.  Header
    metadata still decodes (it is stdlib-only)."""
    from webpeel_spark.operators.multimodal import extract_features

    rows = [
        (0, "image", png_bytes(640, 480)),
        (1, "audio", b"RIFFxxxxWAVEfmt "),
    ]
    df = spark.createDataFrame(
        rows, "item_id long, kind string, payload binary")
    got = {r["item_id"]: r for r in
           extract_features(df, decode_stub=False).collect()}
    assert got[0]["status"].startswith("unimplemented: real image decode")
    assert got[1]["status"].startswith("unimplemented: real audio decode")
    assert got[0]["features"] == [] and got[1]["features"] == []
    assert (got[0]["format"], got[0]["width"], got[0]["height"]) == \
        ("png", 640, 480)
