"""WARC reader suite: pure stream parser + Spark source round-trips."""

from __future__ import annotations

import io

import pytest

from webpeel_spark.pure.warc import (
    iter_warc_path,
    iter_warc_records,
    iter_warc_responses,
    write_warc,
)


def _pages(n, tag=""):
    return [(f"https://warc{tag}.example/p{i}",
             f"2024-05-{1 + i % 28:02d}T12:00:00Z",
             f"<html><body><p>Planted warc page {tag} {i}.</p>"
             f"</body></html>".encode())
            for i in range(n)]


class TestPure:
    def test_plain_roundtrip(self, tmp_path):
        path = str(tmp_path / "a.warc")
        pages = _pages(5)
        write_warc(path, pages)
        recs = list(iter_warc_path(path))
        assert len(recs) == 5
        for (url, date, html), r in zip(pages, recs):
            assert r.warc_type == "response"
            assert r.target_uri == url
            assert r.warc_date == date
            assert r.http_status == 200
            assert r.content_type == "text/html"
            assert r.body == html

    def test_gzip_roundtrip(self, tmp_path):
        path = str(tmp_path / "b.warc.gz")
        pages = _pages(7, "gz")
        write_warc(path, pages)
        recs = list(iter_warc_responses(path))
        assert [r.target_uri for r in recs] == [u for u, _, _ in pages]
        assert all(r.body == h for r, (_, _, h) in zip(recs, pages))

    def test_non_response_records_skipped(self, tmp_path):
        path = str(tmp_path / "c.warc")
        info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                b"Content-Length: 4\r\n\r\ninfo\r\n\r\n")
        with open(path, "wb") as f:
            f.write(info)
        write_warc(str(tmp_path / "d.warc"), _pages(1))
        with open(path, "ab") as f:
            f.write(open(str(tmp_path / "d.warc"), "rb").read())
        recs = list(iter_warc_path(path))
        assert [r.warc_type for r in recs] == ["warcinfo", "response"]
        assert len(list(iter_warc_responses(path))) == 1

    def test_truncated_file_stops_cleanly(self, tmp_path):
        path = str(tmp_path / "e.warc")
        write_warc(path, _pages(2))
        blob = open(path, "rb").read()
        recs = list(iter_warc_records(io.BytesIO(blob[: len(blob) - 40])))
        assert len(recs) in (1, 2)  # never raises, never loops

    def test_unparseable_http_head_filtered(self, tmp_path):
        """A response payload with no head/body separator parses to
        status None — it must NOT reach the pages table (its body
        would still contain raw HTTP header bytes)."""
        path = str(tmp_path / "nohead.warc")
        payload = b"HTTP/1.1 200 OK\nno-crlf-separator<html>x</html>"
        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: https://x/nohead\r\n"
               b"WARC-Date: 2024-05-01T00:00:00Z\r\n"
               b"Content-Length: " + str(len(payload)).encode() +
               b"\r\n\r\n" + payload + b"\r\n\r\n")
        with open(path, "wb") as f:
            f.write(rec)
        assert list(iter_warc_path(path))[0].http_status is None
        assert list(iter_warc_responses(path)) == []

    def test_non_200_filtered(self, tmp_path):
        path = str(tmp_path / "f.warc")
        html = b"<html>gone</html>"
        http = (b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n"
                b"\r\n" + html)
        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: https://x/404\r\n"
               b"WARC-Date: 2024-05-01T00:00:00Z\r\n"
               b"Content-Length: " + str(len(http)).encode() +
               b"\r\n\r\n" + http + b"\r\n\r\n")
        with open(path, "wb") as f:
            f.write(rec)
        assert list(iter_warc_path(path))[0].http_status == 404
        assert list(iter_warc_responses(path)) == []


class TestSparkSource:
    @pytest.fixture(scope="class")
    def spark(self):
        from webpeel_spark.session import get_spark

        s = get_spark(cores=4)
        s.sparkContext.setLogLevel("ERROR")
        return s

    def test_read_warc_multiple_files(self, spark, tmp_path):
        from webpeel_spark.sources.warc import read_warc

        p1 = str(tmp_path / "s1.warc.gz")
        p2 = str(tmp_path / "s2.warc")
        write_warc(p1, _pages(9, "a"))
        write_warc(p2, _pages(4, "b"))
        df = read_warc(spark, [p1, p2])
        rows = df.orderBy("url").collect()
        assert len(rows) == 13
        assert rows[0].url.startswith("https://warca.example/")
        assert rows[0].warc_ts is not None
        assert b"Planted warc page" in bytes(rows[0].html)

    def test_glob_and_empty(self, spark, tmp_path):
        from webpeel_spark.sources.warc import read_warc

        write_warc(str(tmp_path / "g1.warc"), _pages(3, "g"))
        df = read_warc(spark, str(tmp_path / "g*.warc"))
        assert df.count() == 3
        assert read_warc(spark, []).count() == 0

    def test_corrupted_gzip_segment_skipped(self, spark, tmp_path):
        """BadGzipFile surfaces mid-iteration (lazy generator); the
        source must keep good segments and records read before the
        corruption point instead of failing the task."""
        from webpeel_spark.sources.warc import read_warc

        good = str(tmp_path / "good.warc.gz")
        bad = str(tmp_path / "bad.warc.gz")
        write_warc(good, _pages(5, "ok"))
        with open(bad, "wb") as f:
            f.write(b"\x1f\x8b" + bytes(range(100)))
        # truncated-mid-member variant: valid records then garbage
        half = str(tmp_path / "half.warc.gz")
        write_warc(half, _pages(3, "h"))
        with open(half, "ab") as f:
            f.write(b"\x1f\x8b\x00garbage-tail")
        rows = read_warc(spark, [good, bad, half]).collect()
        urls = {r.url for r in rows}
        assert {f"https://warcok.example/p{i}" for i in range(5)} <= urls
        assert len(urls) >= 5  # half's prefix records may survive too

    def test_corrupted_deflate_data_skipped(self, spark, tmp_path):
        """Flipping a byte INSIDE a member's deflate stream raises
        zlib.error (not BadGzipFile) — the guard must cover it."""
        import zlib

        from webpeel_spark.pure.warc import iter_warc_responses
        from webpeel_spark.sources.warc import read_warc

        good = str(tmp_path / "ok.warc.gz")
        write_warc(good, _pages(4, "z"))
        corrupt = str(tmp_path / "corrupt.warc.gz")
        blob = bytearray(open(good, "rb").read())
        blob[len(blob) // 2] ^= 0xFF  # flip a mid-stream byte
        with open(corrupt, "wb") as f:
            f.write(bytes(blob))
        # confirm the corruption actually raises zlib.error or OSError
        with pytest.raises((zlib.error, OSError, EOFError)):
            list(iter_warc_responses(corrupt))
        rows = read_warc(spark, [good, corrupt]).collect()
        assert {r.url for r in rows} >= {
            f"https://warcz.example/p{i}" for i in range(4)}

    def test_composes_with_extraction(self, spark, tmp_path):
        from webpeel_spark.operators.extract import extract_pages
        from webpeel_spark.sources.warc import read_warc

        path = str(tmp_path / "x.warc.gz")
        write_warc(path, _pages(6, "x"))
        out = extract_pages(read_warc(spark, path).select("url", "html"),
                            num_partitions=2)
        rows = out.select("url", "status", "branch", "word_count").collect()
        assert len(rows) == 6
        assert all(r.status == "ok" and r.branch == "html" for r in rows)
        assert all(r.word_count > 0 for r in rows)


class TestPathExpansion:
    """Typo'd inputs fail loudly; manifests expand (ADVICE r4)."""

    def test_glob_miss_raises(self, tmp_path):
        from webpeel_spark.sources.warc import _expand

        with pytest.raises(FileNotFoundError, match="matched no files"):
            _expand(str(tmp_path / "nope-*.warc.gz"))

    def test_missing_literal_path_fails_in_task(self, tmp_path):
        """A literal (non-glob) path passes expansion but the eager
        open inside the task raises — no silent empty table."""
        from webpeel_spark.pure.warc import iter_warc_responses

        with pytest.raises(FileNotFoundError):
            iter_warc_responses(str(tmp_path / "missing.warc"))

    def test_remote_scheme_passthrough(self):
        from webpeel_spark.sources.warc import _expand

        p = "s3a://commoncrawl/crawl-data/seg-*.warc.gz"
        assert _expand(p) == [p]

    def test_manifest_expansion(self, tmp_path):
        import gzip as _gz

        from webpeel_spark.sources.warc import _expand

        m = tmp_path / "warc.paths.gz"
        with _gz.open(m, "wt") as f:
            f.write("crawl-data/seg-0.warc.gz\n\ncrawl-data/seg-1.warc.gz\n")
        got = _expand(str(m), manifest_prefix="s3a://commoncrawl/")
        assert got == ["s3a://commoncrawl/crawl-data/seg-0.warc.gz",
                       "s3a://commoncrawl/crawl-data/seg-1.warc.gz"]

    def test_plain_manifest(self, tmp_path):
        from webpeel_spark.sources.warc import _expand

        m = tmp_path / "warc.paths"
        m.write_text("a.warc\nb.warc\n")
        assert _expand(str(m)) == ["a.warc", "b.warc"]

    def test_remote_manifest_via_hadoop_fs(self, tmp_path):
        """A manifest behind a URL scheme is read through the Hadoop
        FS API (file:// locally; same code path as s3a://) — it must
        not be handed to local gzip.open (ADVICE r5 review)."""
        import gzip as _gz

        from webpeel_spark.session import get_spark
        from webpeel_spark.sources.warc import _expand, read_warc

        spark = get_spark(cores=2)

        seg = str(tmp_path / "m1.warc")
        write_warc(seg, _pages(3, "m"))
        m = tmp_path / "warc.paths.gz"
        with _gz.open(m, "wt") as f:
            f.write("m1.warc\n")
        got = _expand(f"file://{m}", manifest_prefix=str(tmp_path) + "/",
                      spark=spark)
        assert got == [seg]
        assert read_warc(spark, f"file://{m}",
                         manifest_prefix=str(tmp_path) + "/").count() == 3

    def test_remote_manifest_without_spark_raises(self):
        from webpeel_spark.sources.warc import _expand

        with pytest.raises(ValueError, match="SparkSession"):
            _expand("s3a://bucket/warc.paths.gz")
