"""Reference-suite parity: watch.test.ts logic cases + documents.test.ts.

watch.test.ts (src/tests/watch.test.ts): the computeFingerprint /
computeParagraphDiff / computeLineDiff describe blocks port 1:1; the
WatchManager CRUD blocks are N/A by design (mocked pg.Pool SQL-shape
assertions — the engine's analog is the change-detection snapshot join
and the streaming tracker, both pytest-covered elsewhere).

documents.test.ts (src/tests/documents.test.ts): every case ports; the
reference's binary fixtures (test.pdf / test.docx) are rebuilt
deterministically with the repo's fixture writers, carrying the same
load-bearing properties (PDF /Title metadata = "Test PDF", one page,
"Hello PDF World" body; DOCX with a bold run).
"""

from __future__ import annotations

import re

import pytest

from webpeel_spark.pure.docx import make_docx
from webpeel_spark.pure.documents import (
    DOCX_CONTENT_TYPE,
    extract_document_to_format,
    is_docx_content_type,
    is_pdf_content_type,
    normalize_content_type,
)
from webpeel_spark.pure.pdfextract import make_pdf
from webpeel_spark.pure.watch import (
    compute_fingerprint,
    compute_line_diff,
    compute_paragraph_diff,
)


# ── watch.test.ts: computeFingerprint ────────────────────────────────────

class TestComputeFingerprint:
    def test_64_char_hex_sha256(self):
        assert re.fullmatch(r"[0-9a-f]{64}", compute_fingerprint("hello world"))

    def test_identical_for_same_content(self):
        assert (compute_fingerprint("pricing: $99/mo")
                == compute_fingerprint("pricing: $99/mo"))

    def test_different_for_different_content(self):
        assert (compute_fingerprint("pricing: $99/mo")
                != compute_fingerprint("pricing: $149/mo"))

    def test_normalises_internal_whitespace(self):
        assert (compute_fingerprint("hello   world")
                == compute_fingerprint("hello world"))

    def test_normalises_leading_trailing_whitespace(self):
        assert (compute_fingerprint("  hello world  ")
                == compute_fingerprint("hello world"))

    def test_empty_string(self):
        assert re.fullmatch(r"[0-9a-f]{64}", compute_fingerprint(""))


# ── watch.test.ts: computeParagraphDiff ──────────────────────────────────

class TestComputeParagraphDiff:
    def test_identical_content_empty_arrays(self):
        text = "Paragraph one.\n\nParagraph two.\n\nParagraph three."
        d = compute_paragraph_diff(text, text)
        assert d["added_text"] == [] and d["removed_text"] == []

    def test_detects_added_paragraph(self):
        old = "Paragraph one.\n\nParagraph two."
        new = "Paragraph one.\n\nParagraph two.\n\nNew enterprise tier at $299/mo."
        d = compute_paragraph_diff(old, new)
        assert len(d["added_text"]) == 1
        assert "enterprise tier" in d["added_text"][0]
        assert d["removed_text"] == []

    def test_detects_removed_paragraph(self):
        old = "Paragraph one.\n\nObsolete section with old pricing.\n\nParagraph three."
        new = "Paragraph one.\n\nParagraph three."
        d = compute_paragraph_diff(old, new)
        assert len(d["removed_text"]) == 1
        assert "Obsolete section" in d["removed_text"][0]
        assert d["added_text"] == []

    def test_detects_both(self):
        old = "Old plan: Business $79/mo.\n\nUnchanged section."
        new = "New plan: Enterprise $99/mo.\n\nUnchanged section."
        d = compute_paragraph_diff(old, new)
        assert any("Enterprise" in t for t in d["added_text"])
        assert any("Business" in t for t in d["removed_text"])

    def test_ignores_short_blocks(self):
        old = "---\n\nA real paragraph with meaningful content here."
        new = "===\n\nA real paragraph with meaningful content here."
        d = compute_paragraph_diff(old, new)
        assert all(len(t) > 10 for t in d["added_text"])
        assert all(len(t) > 10 for t in d["removed_text"])

    def test_truncates_long_blocks_to_500(self):
        d = compute_paragraph_diff("A" * 1000, "B" * 1000)
        assert len(d["added_text"][0]) <= 500
        assert len(d["removed_text"][0]) <= 500


# ── watch.test.ts: computeLineDiff ───────────────────────────────────────

class TestComputeLineDiff:
    def test_detects_added(self):
        d = compute_line_diff("line1\nline2\nline3", "line1\nline2\nline3\nline4")
        assert "line4" in d.added and d.removed == [] and d.changed

    def test_detects_removed(self):
        d = compute_line_diff("line1\nline2\nline3", "line1\nline3")
        assert "line2" in d.removed and d.added == [] and d.changed

    def test_detects_both(self):
        d = compute_line_diff("line1\nline2\nline3", "line1\nline3\nline4")
        assert "line4" in d.added and "line2" in d.removed and d.changed

    def test_identical_content(self):
        d = compute_line_diff("line1\nline2\nline3", "line1\nline2\nline3")
        assert not d.changed and d.added == [] and d.removed == []
        assert d.change_percent == 0

    def test_nonempty_summary_when_changed(self):
        d = compute_line_diff("line1\nline2", "line1\nline2\nline3")
        assert d.summary != "No changes detected." and d.summary

    def test_no_changes_summary(self):
        assert (compute_line_diff("same content", "same content").summary
                == "No changes detected.")

    def test_change_percent_bounds(self):
        d = compute_line_diff("a\nb\nc", "a\nb\nd")
        assert 0 < d.change_percent <= 100

    def test_empty_old_all_new(self):
        d = compute_line_diff("", "line1\nline2")
        assert "line1" in d.added and "line2" in d.added
        assert d.removed == [] and d.changed

    def test_empty_new_all_removed(self):
        d = compute_line_diff("line1\nline2", "")
        assert "line1" in d.removed and "line2" in d.removed
        assert d.added == [] and d.changed

    def test_ignores_blank_lines(self):
        d = compute_line_diff("line1\n\n\nline2", "line1\n\nline2\n\n\n")
        assert not d.changed and d.added == [] and d.removed == []

    def test_minor_wording_summary(self):
        lines = [f"line{i}" for i in range(100)]
        new_lines = lines[:99] + ["lineChanged"]
        d = compute_line_diff("\n".join(lines), "\n".join(new_lines))
        assert d.change_percent < 5
        assert "Minor wording changes" in d.summary

    def test_change_percent_capped_at_100(self):
        d = compute_line_diff("a\nb\nc", "d\ne\nf")
        assert d.change_percent <= 100


# ── documents.test.ts: content-type helpers ──────────────────────────────

class TestNormalizeContentType:
    def test_strips_charset_and_whitespace(self):
        assert normalize_content_type("application/pdf; charset=utf-8") == "application/pdf"
        assert normalize_content_type("  TEXT/HTML ; charset=utf-8 ") == "text/html"

    def test_falsy_input(self):
        assert normalize_content_type(None) == ""
        assert normalize_content_type("") == ""


class TestIsPdfContentType:
    def test_detects_pdf(self):
        assert is_pdf_content_type("application/pdf")
        assert is_pdf_content_type("application/pdf; charset=binary")
        assert is_pdf_content_type("Application/PDF")

    def test_rejects_non_pdf(self):
        assert not is_pdf_content_type("text/html")
        assert not is_pdf_content_type("application/json")
        assert not is_pdf_content_type(None)


class TestIsDocxContentType:
    def test_detects_docx(self):
        assert is_docx_content_type(DOCX_CONTENT_TYPE)
        assert is_docx_content_type(DOCX_CONTENT_TYPE.capitalize() + "; charset=utf-8")

    def test_rejects_non_docx(self):
        assert not is_docx_content_type("application/pdf")
        assert not is_docx_content_type("application/msword")
        assert not is_docx_content_type(None)


# ── documents.test.ts: PDF extraction ────────────────────────────────────

@pytest.fixture(scope="module")
def pdf_buffer() -> bytes:
    # Same load-bearing fixture properties as test.pdf: one page,
    # "Hello PDF World" body, /Title metadata "Test PDF".
    return make_pdf([["Hello PDF World"]], title="Test PDF")


class TestExtractPdf:
    def test_markdown_default(self, pdf_buffer):
        r = extract_document_to_format(
            pdf_buffer, url="https://example.com/report.pdf",
            content_type="application/pdf")
        assert "Hello PDF World" in r.content
        assert r.metadata["content_type"] == "application/pdf"
        assert r.metadata["word_count"] > 0
        assert r.metadata["pages"] == 1

    def test_metadata_title_precedence(self, pdf_buffer):
        r = extract_document_to_format(
            pdf_buffer, url="https://example.com/my-report.pdf",
            content_type="application/pdf")
        assert r.metadata["title"] == "Test PDF"

    def test_html_format(self, pdf_buffer):
        r = extract_document_to_format(
            pdf_buffer, url="https://example.com/doc.pdf",
            content_type="application/pdf", format="html")
        assert "<pre>" in r.content
        assert "Hello PDF World" in r.content

    def test_url_extension_fallback(self, pdf_buffer):
        r = extract_document_to_format(
            pdf_buffer, url="https://example.com/report.pdf",
            content_type="application/octet-stream")
        assert "Hello PDF World" in r.content
        assert r.metadata["content_type"] == "application/octet-stream"


# ── documents.test.ts: DOCX extraction ───────────────────────────────────

@pytest.fixture(scope="module")
def docx_buffer() -> bytes:
    # test.docx parity: body text plus a bold run.
    return make_docx("Report", ["Hello DOCX World"],
                     bold_paragraphs=["bold text"])


class TestExtractDocx:
    def test_markdown_default(self, docx_buffer):
        r = extract_document_to_format(
            docx_buffer, url="https://example.com/report.docx",
            content_type=DOCX_CONTENT_TYPE)
        assert "Hello DOCX World" in r.content
        assert "bold text" in r.content
        assert r.metadata["content_type"] == DOCX_CONTENT_TYPE
        assert r.metadata["word_count"] > 0

    def test_bold_to_markdown(self, docx_buffer):
        r = extract_document_to_format(
            docx_buffer, url="https://example.com/report.docx",
            content_type=DOCX_CONTENT_TYPE, format="markdown")
        assert "**" in r.content

    def test_text_format(self, docx_buffer):
        r = extract_document_to_format(
            docx_buffer, url="https://example.com/report.docx",
            content_type=DOCX_CONTENT_TYPE, format="text")
        assert "Hello DOCX World" in r.content
        assert "<" not in r.content
        assert "**" not in r.content

    def test_html_format(self, docx_buffer):
        r = extract_document_to_format(
            docx_buffer, url="https://example.com/report.docx",
            content_type=DOCX_CONTENT_TYPE, format="html")
        assert "<p>" in r.content
        assert "<strong>" in r.content

    def test_title_from_url_filename(self, docx_buffer):
        r = extract_document_to_format(
            docx_buffer, url="https://example.com/quarterly-report.docx",
            content_type=DOCX_CONTENT_TYPE)
        assert r.metadata["title"] == "quarterly-report"

    def test_url_extension_fallback(self, docx_buffer):
        r = extract_document_to_format(
            docx_buffer, url="https://example.com/report.docx",
            content_type="application/octet-stream")
        assert "Hello DOCX World" in r.content


# ── documents.test.ts: errors + end-to-end ───────────────────────────────

class TestErrors:
    def test_unsupported_content_type_raises(self):
        with pytest.raises(ValueError, match="Unsupported document type"):
            extract_document_to_format(
                b"not a document", url="https://example.com/file.txt",
                content_type="text/plain")


class TestEndToEnd:
    def test_pdf_roundtrip(self, pdf_buffer):
        r = extract_document_to_format(
            pdf_buffer, url="https://example.com/report.pdf",
            content_type="application/pdf", format="markdown")
        assert "Hello PDF World" in r.content
        assert r.metadata["title"]
        assert r.metadata["content_type"] == "application/pdf"
        assert r.metadata["word_count"] > 0
        assert r.metadata["pages"] == 1

    def test_docx_roundtrip(self, docx_buffer):
        r = extract_document_to_format(
            docx_buffer, url="https://example.com/report.docx",
            content_type=DOCX_CONTENT_TYPE, format="markdown")
        assert "Hello DOCX World" in r.content
        assert r.metadata["title"]
        assert r.metadata["content_type"] == DOCX_CONTENT_TYPE
        assert r.metadata["word_count"] > 0
