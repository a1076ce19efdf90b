"""Stdlib-only image header decode — dimensions + format from magic
bytes (PNG / JPEG / GIF / BMP / WebP), no imaging library.

Round-6 un-stubbing of the multimodal decode seam
(operators/multimodal.py): the heavy pixel decoders (PIL/ffmpeg) stay
environment-provided, but the header metadata a training-data pipeline
actually filters on (width, height, format — e.g. "drop images under
64px", "route gifs away from the caption model") is pure byte
arithmetic the reference's content sniffers also do by magic bytes
(pipeline.ts content-type routing; ocr.ts IMAGE_CONTENT_TYPES).

Every parser reads only the fixed header region and returns None on
any truncation or malformed field — callers treat None as "not a
parseable image", never an error.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _parse_png(b: bytes) -> Optional[Tuple[str, int, int]]:
    # 8-byte signature, 4-byte length, b"IHDR", width/height u32 BE
    if len(b) < 24 or not b.startswith(_PNG_MAGIC) or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    return ("png", w, h)


def _parse_gif(b: bytes) -> Optional[Tuple[str, int, int]]:
    # "GIF87a"/"GIF89a", logical screen width/height u16 LE
    if len(b) < 10 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    return ("gif", w, h)


def _parse_bmp(b: bytes) -> Optional[Tuple[str, int, int]]:
    # "BM", then the DIB header size at 14 selects the layout:
    # BITMAPCOREHEADER (12) stores width/height as u16 LE at 18/20;
    # the BITMAPINFOHEADER family (40/52/56/64/108/124) as i32 LE at
    # 18/22 (height negative for top-down DIBs — report magnitude)
    if len(b) < 22 or b[:2] != b"BM":
        return None
    dib = struct.unpack("<I", b[14:18])[0]
    if dib == 12:
        w, h = struct.unpack("<HH", b[18:22])
        if w == 0 or h == 0:
            return None
        return ("bmp", w, h)
    if dib not in (40, 52, 56, 64, 108, 124) or len(b) < 26:
        return None
    w, h = struct.unpack("<ii", b[18:26])
    if w <= 0 or h == 0:
        return None
    return ("bmp", w, abs(h))


def _parse_jpeg(b: bytes) -> Optional[Tuple[str, int, int]]:
    # SOI then marker scan for a frame header (SOFn, n != 4/8/12 which
    # are DHT/JPG/DAC); height/width u16 BE at +5/+7 of the segment
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:  # not at a marker — corrupt stream
            return None
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # standalone
            i += 2
            continue
        if i + 4 > n:
            return None
        seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
        if seglen < 2:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", b[i + 5:i + 9])
            return ("jpeg", w, h)
        if marker == 0xD9:  # EOI before any SOF
            return None
        i += 2 + seglen
    return None


def _parse_webp(b: bytes) -> Optional[Tuple[str, int, int]]:
    # RIFF container: "RIFF" size "WEBP" then VP8 /VP8L/VP8X chunk
    if len(b) < 30 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    chunk = b[12:16]
    if chunk == b"VP8X":  # extended: 24-bit LE minus-one fields at 24
        w = int.from_bytes(b[24:27], "little") + 1
        h = int.from_bytes(b[27:30], "little") + 1
        return ("webp", w, h)
    if chunk == b"VP8 ":  # lossy: dims u14 LE at 26 after 3-byte sync
        if b[23:26] != b"\x9d\x01\x2a":
            return None
        w = struct.unpack("<H", b[26:28])[0] & 0x3FFF
        h = struct.unpack("<H", b[28:30])[0] & 0x3FFF
        return ("webp", w, h)
    if chunk == b"VP8L":  # lossless: 14-bit packed minus-one at 21
        if b[20] != 0x2F:
            return None
        bits = int.from_bytes(b[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return ("webp", w, h)
    return None


_PARSERS = (_parse_png, _parse_gif, _parse_bmp, _parse_webp, _parse_jpeg)


def parse_image_header(payload: bytes) -> Optional[dict]:
    """(format, width, height) from the payload's magic bytes, or None
    when the bytes are not a recognizable image header."""
    if not payload:
        return None
    for p in _PARSERS:
        got = p(payload)
        if got is not None:
            fmt, w, h = got
            return {"format": fmt, "width": w, "height": h}
    return None
