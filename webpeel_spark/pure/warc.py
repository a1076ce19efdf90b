"""Minimal WARC/1.x record reader (the Common Crawl container format).

The north-star input table is "Common-Crawl-style pages"; real Common
Crawl ships as WARC files (ISO 28500): a sequence of records, each a
header block (CRLF-terminated ``Name: value`` lines, blank-line
terminated) followed by ``Content-Length`` bytes of payload and a
``\\r\\n\\r\\n`` separator.  ``response`` records carry an HTTP
response (status line + headers + body) whose body is the page bytes.

Pure stdlib, stream-oriented (never materializes more than one record
payload), and tolerant of the two common packagings:

- plain ``.warc`` — records back to back;
- ``.warc.gz`` — per-record gzip members (Common Crawl's layout);
  ``gzip.open`` transparently concatenates members, so the same
  sequential reader handles both.

Only the fields the extraction pipeline needs are surfaced:
(target_uri, warc_date, http_status, content_type, body bytes).
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from typing import BinaryIO, Iterator, Optional

_CRLF = b"\r\n"


@dataclass
class WarcRecord:
    warc_type: str
    target_uri: Optional[str]
    warc_date: Optional[str]
    http_status: Optional[int]
    content_type: Optional[str]
    body: bytes


def _read_headers(stream: BinaryIO) -> Optional[dict]:
    """Read a CRLF header block into a lower-cased dict; None at EOF.
    Leading blank lines (inter-record padding) are skipped."""
    headers: dict = {}
    first = True
    while True:
        line = stream.readline()
        if not line:
            return headers or None
        if line in (_CRLF, b"\n"):
            if first:
                continue  # padding between records
            return headers
        first = False
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
        else:
            # WARC/1.0 version line or HTTP status line
            headers.setdefault("__start__", line.strip().decode("latin-1"))
    return headers


def _parse_http_payload(payload: bytes) -> tuple:
    """(status, content_type, body) from an HTTP response payload."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, payload
    head, body = payload[:sep], payload[sep + 4:]
    status = None
    content_type = None
    for i, line in enumerate(head.split(b"\r\n")):
        if i == 0 and line[:5] == b"HTTP/":
            parts = line.split()
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            continue
        if b":" in line:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-type":
                content_type = v.strip().decode("latin-1")
    return status, content_type, body


def iter_warc_records(stream: BinaryIO) -> Iterator[WarcRecord]:
    """Iterate records from an open binary WARC stream."""
    while True:
        headers = _read_headers(stream)
        if not headers:
            return
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            return
        payload = stream.read(length)
        if len(payload) < length:
            return  # truncated file
        wtype = headers.get("warc-type", "")
        status = content_type = None
        body = payload
        if wtype == "response":
            status, content_type, body = _parse_http_payload(payload)
        yield WarcRecord(
            warc_type=wtype,
            target_uri=headers.get("warc-target-uri"),
            warc_date=headers.get("warc-date"),
            http_status=status,
            content_type=content_type,
            body=body,
        )


def iter_warc_path(path: str) -> Iterator[WarcRecord]:
    """Iterate records from a .warc or .warc.gz file path.

    The file is opened EAGERLY (at call time, not first ``next()``):
    a missing/unreadable path raises immediately instead of being
    swallowed by a caller's mid-iteration corruption guard —
    ``FileNotFoundError``/``PermissionError`` are ``OSError``
    subclasses, the same base class as ``gzip.BadGzipFile``."""
    opener = gzip.open if path.endswith(".gz") else open
    fh = opener(path, "rb")

    def gen() -> Iterator[WarcRecord]:
        with fh:
            yield from iter_warc_records(fh)

    return gen()


def iter_warc_responses(path: str) -> Iterator[WarcRecord]:
    """Only 200-status response records with a target URI — the rows
    an extraction corpus wants.  Records whose HTTP head failed to
    parse (http_status None) are dropped too: their body would still
    contain raw header bytes, which must not reach the pages table.
    Opens eagerly (see iter_warc_path)."""
    records = iter_warc_path(path)

    def gen() -> Iterator[WarcRecord]:
        for rec in records:
            if (rec.warc_type == "response" and rec.target_uri
                    and rec.http_status == 200):
                yield rec

    return gen()


def read_manifest(path: str, prefix: str = "") -> list:
    """Segment paths from a Common-Crawl-style manifest
    (``warc.paths`` / ``warc.paths.gz``: one relative segment path per
    line).  ``prefix`` rebases the relative entries onto a bucket or
    mirror root (e.g. ``s3a://commoncrawl/``) — at real CC scale the
    segment list comes from this published manifest, not from a
    filesystem glob."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as fh:
        return [prefix + line.strip() for line in fh if line.strip()]


# ── writer (tests / fixtures only) ──────────────────────────────────────

def write_warc(path: str, pages, compress: Optional[bool] = None) -> None:
    """Write (url, warc_date, html_bytes) triples as WARC response
    records — per-record gzip members when the path ends .gz (the
    Common Crawl packaging), plain otherwise."""
    if compress is None:
        compress = path.endswith(".gz")

    def record(url: str, date: str, html: bytes) -> bytes:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: " + str(len(html)).encode() +
                b"\r\n\r\n" + html)
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"WARC-Date: " + date.encode() + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        )
        return head + http + b"\r\n\r\n"

    with open(path, "wb") as out:
        for url, date, html in pages:
            blob = record(url, date, html)
            if compress:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb") as gz:
                    gz.write(blob)
                out.write(buf.getvalue())
            else:
                out.write(blob)
