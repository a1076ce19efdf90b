"""Minimal PDF text extraction + deterministic PDF generation.

The PDF branch of the pipeline (north rule: payloads detected by magic
bytes ``%PDF-`` route through a layout-parse branch producing the same
text/spans schema).  The reference uses pdf-parse/pdfjs
(/root/reference/src/core/pdf.ts:5-25) and wraps results at
documents.ts:95-122 and ee/extractors/pdf.ts:70-113 (50 MB cap, 100k
char truncation, scanned-PDF stub message).

No PDF library ships in this environment, so this module implements a
small, dependency-free extractor covering the PDF subset our
deterministic fixture generator emits plus common simple real-world
documents: object scanning without xref, FlateDecode (zlib stdlib)
content streams, ``Tj``/``TJ``/``'`` text-showing operators with
``Td/TD/T*/BT/ET`` line handling, and the Info dictionary
(Title/Author/Creator/Producer/CreationDate) in literal or hex strings.
Complex encodings (CID fonts, encryption) yield empty text — the same
observable behaviour the reference maps to its scanned-document stub.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, NamedTuple

PDF_MAGIC = b"%PDF-"
PDF_MAX_BYTES = 50 * 1024 * 1024
PDF_TRUNCATE_CHARS = 100_000


class PdfResult(NamedTuple):
    text: str
    metadata: Dict[str, str]
    pages: int


def is_pdf_bytes(data: bytes) -> bool:
    return data[:5] == PDF_MAGIC


_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj(.*?)endobj", re.S)
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![s/\w])")
_INFO_KEYS = (b"Title", b"Author", b"Creator", b"Producer", b"CreationDate")


def _decode_pdf_string(raw: bytes) -> str:
    """Decode a PDF literal string body (escapes already inside parens)."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        b = raw[i]
        if b == 0x5C and i + 1 < n:  # backslash
            nxt = raw[i + 1]
            mapping = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                       0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
            if nxt in mapping:
                out.append(mapping[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal escape
                j = i + 1
                oct_digits = b""
                while j < n and len(oct_digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    oct_digits += bytes([raw[j]])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            i += 1
            continue
        out.append(b)
        i += 1
    data = bytes(out)
    if data[:2] == b"\xfe\xff":
        try:
            return data[2:].decode("utf-16-be", errors="replace")
        except Exception:
            return ""
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return data.decode("latin-1", errors="replace")


def _find_literal_string(data: bytes, start: int) -> tuple:
    """Return (decoded, end_index) for a ( ... ) literal starting at start."""
    assert data[start] == 0x28
    depth = 0
    i = start
    buf = bytearray()
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0x5C and i + 1 < n:
            buf.append(b)
            buf.append(data[i + 1])
            i += 2
            continue
        if b == 0x28:
            depth += 1
            if depth > 1:
                buf.append(b)
        elif b == 0x29:
            depth -= 1
            if depth == 0:
                return _decode_pdf_string(bytes(buf)), i + 1
            buf.append(b)
        else:
            buf.append(b)
        i += 1
    return _decode_pdf_string(bytes(buf)), n


def _extract_info(data: bytes) -> Dict[str, str]:
    meta: Dict[str, str] = {"title": "", "author": "", "creator": "",
                            "producer": "", "creationDate": ""}
    for key in _INFO_KEYS:
        pat = re.compile(rb"/" + key + rb"\s*")
        for m in pat.finditer(data):
            pos = m.end()
            if pos >= len(data):
                continue
            if data[pos] == 0x28:  # literal string
                val, _ = _find_literal_string(data, pos)
            elif data[pos] == 0x3C:  # hex string
                end = data.find(b">", pos)
                if end < 0:
                    continue
                hexs = re.sub(rb"\s", b"", data[pos + 1 : end])
                try:
                    raw = bytes.fromhex(hexs.decode("ascii"))
                except ValueError:
                    continue
                if raw[:2] == b"\xfe\xff":
                    val = raw[2:].decode("utf-16-be", errors="replace")
                else:
                    val = raw.decode("latin-1", errors="replace")
            else:
                continue
            field = key.decode("ascii")
            field = field[0].lower() + field[1:]
            if not meta.get(field):
                meta[field] = val
            break
    return meta


_TEXT_OP_RE = re.compile(
    rb"""
      \((?P<lit>(?:\\.|[^\\()])*)\)\s*(?P<op>Tj|'|")   # literal string + show op
    | \[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ                 # array show
    | (?P<nl>T\*|TD|Td|TL)                             # line-advance ops
    | (?P<bt>BT|ET)
    """,
    re.S | re.X,
)

_ARR_STR_RE = re.compile(rb"\((?P<s>(?:\\.|[^\\()])*)\)")


def _stream_to_text(stream: bytes) -> str:
    """Interpret text-showing operators in one content stream."""
    parts: List[str] = []
    line_open = False
    for m in _TEXT_OP_RE.finditer(stream):
        if m.group("lit") is not None:
            parts.append(_decode_pdf_string(m.group("lit")))
            line_open = True
            if m.group("op") in (b"'", b'"'):
                parts.append("\n")
                line_open = False
        elif m.group("arr") is not None:
            for sm in _ARR_STR_RE.finditer(m.group("arr")):
                parts.append(_decode_pdf_string(sm.group("s")))
            line_open = True
        elif m.group("nl") is not None:
            if line_open:
                parts.append("\n")
                line_open = False
        elif m.group("bt") == b"ET":
            if line_open:
                parts.append("\n")
                line_open = False
    return "".join(parts)


def extract_pdf(data: bytes) -> PdfResult:
    """Extract text + metadata + page count from raw PDF bytes."""
    if not is_pdf_bytes(data):
        raise ValueError("not a PDF (missing %PDF- magic)")
    if len(data) > PDF_MAX_BYTES:
        raise ValueError("PDF too large (max 50MB)")

    pages = len(_PAGE_RE.findall(data))
    meta = _extract_info(data)

    texts: List[str] = []
    for m in _STREAM_RE.finditer(data):
        raw = m.group(1)
        stream = raw
        # try FlateDecode; fall back to raw bytes for uncompressed streams
        try:
            stream = zlib.decompress(raw)
        except zlib.error:
            pass
        if b"Tj" in stream or b"TJ" in stream or b"'" in stream:
            t = _stream_to_text(stream)
            if t.strip():
                texts.append(t)
    text = "\n".join(texts)
    return PdfResult(text=text, metadata=meta, pages=max(pages, 1 if texts else pages))


def normalize_pdf_text(text: str) -> str:
    """Whitespace normalization (ee/extractors/pdf.ts:70-75 semantics)."""
    text = text.replace("\r\n", "\n")
    text = re.sub(r"\n{3,}", "\n\n", text)
    text = re.sub(r"[ \t]+", " ", text)
    return text.strip()


# ── deterministic PDF writer (fixtures / synthetic corpus) ───────────────

def _esc_pdf(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(pages_text: List[List[str]], title: str = "", author: str = "",
             compress: bool = True) -> bytes:
    """Build a small valid PDF: one content stream per page, one line per
    list entry.  Deterministic for fixed inputs (no timestamps)."""
    objects: List[bytes] = []

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)  # 1-based object number

    font_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    content_nums = []
    for lines in pages_text:
        ops = [b"BT", b"/F1 12 Tf", b"72 720 Td", b"14 TL"]
        first = True
        for line in lines:
            enc = _esc_pdf(line).encode("latin-1", errors="replace")
            if first:
                ops.append(b"(" + enc + b") Tj")
                first = False
            else:
                ops.append(b"T*")
                ops.append(b"(" + enc + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        if compress:
            stream = zlib.compress(stream)
            head = b"<< /Length " + str(len(stream)).encode() + b" /Filter /FlateDecode >>"
        else:
            head = b"<< /Length " + str(len(stream)).encode() + b" >>"
        content_nums.append(add(head + b"\nstream\n" + stream + b"\nendstream"))

    page_nums = []
    pages_obj_num = len(objects) + len(pages_text) + 1  # computed below properly
    # we need the Pages object number before creating Page objects; reserve by
    # creating pages first referencing a forward number.
    first_page_num = len(objects) + 1
    pages_num = first_page_num + len(pages_text)
    for content_num in content_nums:
        page_nums.append(add(
            b"<< /Type /Page /Parent " + str(pages_num).encode() + b" 0 R "
            b"/MediaBox [0 0 612 792] /Resources << /Font << /F1 "
            + str(font_num).encode() + b" 0 R >> >> /Contents "
            + str(content_num).encode() + b" 0 R >>"
        ))
    kids = b" ".join(str(n).encode() + b" 0 R" for n in page_nums)
    actual_pages_num = add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(page_nums)).encode() + b" >>"
    )
    assert actual_pages_num == pages_num
    catalog_num = add(b"<< /Type /Catalog /Pages " + str(pages_num).encode() + b" 0 R >>")
    info_parts = []
    if title:
        info_parts.append(b"/Title (" + _esc_pdf(title).encode("latin-1", "replace") + b")")
    if author:
        info_parts.append(b"/Author (" + _esc_pdf(author).encode("latin-1", "replace") + b")")
    info_parts.append(b"/Producer (webpeel-spark-fixture)")
    info_num = add(b"<< " + b" ".join(info_parts) + b" >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 " + str(len(objects) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root " + str(catalog_num).encode() + b" 0 R /Info "
        + str(info_num).encode() + b" 0 R >>\nstartxref\n"
        + str(xref_pos).encode() + b"\n%%EOF\n"
    )
    return bytes(out)
