"""PDF-by-URL extractor (ee/extractors/pdf.ts:10-113 port, batch form).

The reference downloads the PDF; in our batch engine the payload is the
row's ``html:binary`` column, so callers pass the raw bytes via the
``html`` parameter as latin-1-preserving str or use
``pdf_extract_result`` directly with bytes.  Behaviour preserved: 50 MB
cap, 100k-char truncation note, scanned-PDF stub message, markdown
header with **Author** / **Pages** / **Source**.
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urlsplit

from ..pdfextract import (
    PDF_TRUNCATE_CHARS,
    extract_pdf,
    is_pdf_bytes,
    normalize_pdf_text,
)


def pdf_extract_result(data: bytes, url: str):
    from . import DomainExtractResult

    try:
        parts = urlsplit(url)
        filename = (parts.path.split("/")[-1] or "document.pdf")
        hostname = parts.hostname or ""
    except ValueError:
        filename, hostname = "document.pdf", ""

    if not is_pdf_bytes(data):
        return None
    try:
        pdf = extract_pdf(data)
    except Exception:
        return None

    text = normalize_pdf_text(pdf.text or "")
    truncated = False
    if len(text) > PDF_TRUNCATE_CHARS:
        text = text[:PDF_TRUNCATE_CHARS]
        truncated = True

    if not text:
        empty_note = (
            f"## 📄 {filename}\n\n*This PDF appears to be a scanned document "
            f"(image-only). No extractable text was found.*\n\n**Source:** {url}"
        )
        return DomainExtractResult(
            hostname, "pdf",
            {"title": filename, "url": url, "pages": pdf.pages,
             "contentType": "application/pdf"},
            empty_note,
        )

    title_raw = pdf.metadata.get("title") or ""
    title = title_raw or re.sub(r"\.pdf$", "", filename, flags=re.I) or "PDF Document"

    meta_parts = []
    if pdf.metadata.get("author"):
        meta_parts.append(f"**Author:** {pdf.metadata['author']}")
    if pdf.pages:
        meta_parts.append(f"**Pages:** {pdf.pages}")
    meta_parts.append(f"**Source:** {url}")

    header = f"# {title_raw}\n\n" if title_raw else ""
    meta_block = " | ".join(meta_parts) + "\n\n"
    trunc_note = (
        "\n\n*[Content truncated — document exceeds 100,000 characters]*"
        if truncated else ""
    )
    clean_content = header + meta_block + text + trunc_note

    structured = {
        "title": title, "filename": filename, "url": url, "pages": pdf.pages,
        "contentType": "application/pdf", **pdf.metadata,
    }
    return DomainExtractResult(hostname, "pdf", structured, clean_content)


def pdf_url_extractor(html: str, url: str):
    """Registry adapter: ``html`` carries the raw bytes latin-1-decoded."""
    if not html:
        return None
    data = html.encode("latin-1", errors="ignore") if isinstance(html, str) else html
    return pdf_extract_result(data, url)
