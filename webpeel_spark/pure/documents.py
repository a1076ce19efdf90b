"""Document (PDF/DOCX) extraction facade (documents.ts:1-160).

Content-type negotiation helpers plus ``extract_document_to_format`` —
the reference's standalone document API (separate from the pipeline's
magic-byte router, which stays the batch hot path).  Formats:
``markdown`` (default), ``text``, ``html``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, NamedTuple, Optional
from urllib.parse import unquote, urlsplit

from .docx import docx_to_html
from .markdown import html_to_markdown, html_to_text
from .pdfextract import extract_pdf

DOCX_CONTENT_TYPE = (
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document")


def normalize_content_type(header: Optional[str]) -> str:
    """documents.ts:22 — drop parameters, trim, lowercase."""
    if not header:
        return ""
    return header.split(";")[0].strip().lower()


def is_pdf_content_type(header: Optional[str]) -> bool:
    """documents.ts:27 — application/pdf or any ``+pdf`` suffix type."""
    ct = normalize_content_type(header)
    return ct == "application/pdf" or ct.endswith("+pdf")


def is_docx_content_type(header: Optional[str]) -> bool:
    """documents.ts:32."""
    return normalize_content_type(header) == DOCX_CONTENT_TYPE


def _basename_from_url(url: Optional[str]) -> str:
    if not url:
        return ""
    try:
        path = urlsplit(url).path
        last = [p for p in path.split("/") if p]
        return unquote(last[-1]) if last else ""
    except ValueError:
        return ""


def _strip_extension(name: str) -> str:
    return re.sub(r"\.(pdf|docx)$", "", name, flags=re.I)


def _escape_html(text: str) -> str:
    return (text.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;").replace("'", "&#39;"))


def _count_words(text: str) -> int:
    return len([w for w in re.sub(r"\s+", " ", text).strip().split(" ") if w])


def _normalize_plain_text(text: str) -> str:
    text = text.replace("\r\n", "\n")
    text = re.sub(r"\n{3,}", "\n\n", text)
    text = re.sub(r"[ \t]+", " ", text)
    return text.strip()


class DocumentResult(NamedTuple):
    content: str
    metadata: Dict[str, Any]


def extract_document_to_format(payload: bytes,
                               url: Optional[str] = None,
                               content_type: Optional[str] = None,
                               format: str = "markdown") -> DocumentResult:
    """documents.ts:79 — PDF/DOCX bytes → {content, metadata}.

    Type negotiation: normalized content-type first, then the URL
    extension (covers ``application/octet-stream`` servers).  Raises
    ValueError for anything else (reference throws).
    """
    normalized = normalize_content_type(content_type)
    url_lower = (url or "").lower()

    is_pdf = is_pdf_content_type(normalized) or url_lower.endswith(".pdf")
    is_docx = is_docx_content_type(normalized) or url_lower.endswith(".docx")

    if is_pdf:
        pdf = extract_pdf(payload)
        text = _normalize_plain_text(pdf.text or "")
        fallback_title = _strip_extension(_basename_from_url(url)) or "PDF Document"
        title = pdf.metadata.get("title") or fallback_title
        if format == "html":
            content = f"<pre>{_escape_html(text)}</pre>"
        else:  # markdown + text: readable plain text
            content = text
        meta: Dict[str, Any] = {
            "title": title,
            "content_type": normalized or "application/pdf",
            "word_count": _count_words(text),
            "pages": pdf.pages,
        }
        meta.update(pdf.metadata)
        meta["title"] = title  # metadata-title precedence survives update
        return DocumentResult(content, meta)

    if is_docx:
        html = (docx_to_html(payload) or "").strip()
        title = _strip_extension(_basename_from_url(url)) or "Word Document"
        plain_text = html_to_text(html)
        if format == "html":
            content = html
        elif format == "text":
            content = plain_text
        else:
            content = html_to_markdown(html)
        return DocumentResult(content, {
            "title": title,
            "content_type": normalized or DOCX_CONTENT_TYPE,
            "word_count": _count_words(plain_text),
            "messages": [],
        })

    raise ValueError(
        f"Unsupported document type: {normalized or content_type or 'unknown'}")
