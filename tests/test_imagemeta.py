"""Stdlib image-header parser: real header bytes for each format,
malformed/truncated rejection, and a never-raises fuzz sweep."""

from __future__ import annotations

import random
import struct

from webpeel_spark.pure.imagemeta import parse_image_header


def png_bytes(w: int, h: int) -> bytes:
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00" + b"\x00" * 8)


def gif_bytes(w: int, h: int, ver: bytes = b"GIF89a") -> bytes:
    return ver + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def bmp_bytes(w: int, h: int) -> bytes:
    return (b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
            + struct.pack("<Iii", 40, w, h) + b"\x00" * 28)


def jpeg_bytes(w: int, h: int, progressive: bool = False,
               with_app1: bool = False) -> bytes:
    out = b"\xff\xd8"
    if with_app1:  # EXIF segment before the frame header
        payload = b"Exif\x00\x00" + b"II*\x00" + b"\x00" * 8
        out += b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) \
        + b"\x01\x01\x11\x00"
    return out + b"\xff\xd9"


def webp_vp8x_bytes(w: int, h: int) -> bytes:
    body = (b"VP8X" + struct.pack("<I", 10) + b"\x00" * 4
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


class TestFormats:
    def test_png(self):
        assert parse_image_header(png_bytes(640, 480)) == {
            "format": "png", "width": 640, "height": 480}

    def test_gif_both_versions(self):
        assert parse_image_header(gif_bytes(320, 200)) == {
            "format": "gif", "width": 320, "height": 200}
        assert parse_image_header(gif_bytes(7, 9, b"GIF87a")) == {
            "format": "gif", "width": 7, "height": 9}

    def test_bmp_including_topdown(self):
        assert parse_image_header(bmp_bytes(100, 50)) == {
            "format": "bmp", "width": 100, "height": 50}
        assert parse_image_header(bmp_bytes(100, -50)) == {
            "format": "bmp", "width": 100, "height": 50}

    def test_bmp_os2_core_header(self):
        # BITMAPCOREHEADER (DIB size 12): u16 dims at 18/20 — reading
        # them as i32 would fabricate width = w | (h << 16)
        core = (b"BM" + struct.pack("<IHHI", 38, 0, 0, 26)
                + struct.pack("<IHHHH", 12, 100, 50, 1, 24))
        assert parse_image_header(core) == {
            "format": "bmp", "width": 100, "height": 50}

    def test_bmp_unknown_dib_rejected(self):
        bad = (b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
               + struct.pack("<Iii", 33, 100, 50) + b"\x00" * 28)
        assert parse_image_header(bad) is None

    def test_jpeg_baseline_progressive_and_exif(self):
        assert parse_image_header(jpeg_bytes(1024, 768)) == {
            "format": "jpeg", "width": 1024, "height": 768}
        assert parse_image_header(jpeg_bytes(33, 44, progressive=True)) == {
            "format": "jpeg", "width": 33, "height": 44}
        assert parse_image_header(jpeg_bytes(800, 600, with_app1=True)) == {
            "format": "jpeg", "width": 800, "height": 600}

    def test_jpeg_skips_dht_marker(self):
        # DHT (0xC4) sits in the SOFn numeric range but is NOT a frame
        dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x01\x02"
        raw = b"\xff\xd8" + dht + jpeg_bytes(5, 6)[2:]
        assert parse_image_header(raw)["width"] == 5

    def test_webp_vp8x(self):
        assert parse_image_header(webp_vp8x_bytes(256, 144)) == {
            "format": "webp", "width": 256, "height": 144}


class TestRejection:
    def test_truncated_headers(self):
        for full in (png_bytes(2, 2), gif_bytes(2, 2), bmp_bytes(2, 2),
                     jpeg_bytes(2, 2), webp_vp8x_bytes(2, 2)):
            for cut in (0, 1, 4, 8):
                assert parse_image_header(full[:cut]) is None

    def test_non_image_bytes(self):
        assert parse_image_header(b"") is None
        assert parse_image_header(None) is None
        assert parse_image_header(b"GIF88a" + b"\x00" * 20) is None
        assert parse_image_header(b"%PDF-1.4 ...") is None
        assert parse_image_header(b"<html><body>x</body></html>") is None

    def test_jpeg_without_sof(self):
        assert parse_image_header(b"\xff\xd8\xff\xd9") is None

    def test_fuzz_never_raises(self):
        rng = random.Random(7)
        magics = (b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM", b"\xff\xd8",
                  b"RIFF", b"")
        for i in range(2000):
            prefix = magics[i % len(magics)]
            body = bytes(rng.getrandbits(8)
                         for _ in range(rng.randint(0, 64)))
            got = parse_image_header(prefix + body)
            assert got is None or got["width"] >= 0
