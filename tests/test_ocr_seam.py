"""OCR engine seam (pure/ocr.py ↔ ocr.ts): pin BOTH sides of the
dependency seam so it can't rot — the no-engine path (this sandbox's
reality: "" = the reference's no-text outcome) and the engine-present
path, exercised against a stub pytesseract/PIL injected into
sys.modules (round-6 directive: the seam's engine-present shape was
previously only documented, not executed)."""

from __future__ import annotations

import sys
import types

import pytest

from webpeel_spark.pure.ocr import (
    IMAGE_CONTENT_TYPES,
    extract_text_from_image,
    is_image_content_type,
)


class TestContentTypes:
    def test_reference_list(self):
        # ocr.ts:6-14 verbatim
        assert IMAGE_CONTENT_TYPES == [
            "image/png", "image/jpeg", "image/jpg", "image/gif",
            "image/webp", "image/tiff", "image/bmp"]

    def test_substring_match_like_reference(self):
        # ocr.ts:19-22 uses .includes on the lowercased header
        assert is_image_content_type("IMAGE/PNG")
        assert is_image_content_type("image/jpeg; charset=binary")
        assert not is_image_content_type("text/html")
        assert not is_image_content_type("application/pdf")


class TestNoEngine:
    def test_returns_empty_without_engine(self, monkeypatch):
        """With no pytesseract installed the seam must return '' — the
        reference's Tesseract-found-no-text outcome — never raise."""
        monkeypatch.setitem(sys.modules, "pytesseract", None)
        # import of a None sys.modules entry raises ImportError → ""
        assert extract_text_from_image(b"\x89PNG fake bytes") == ""


class _FakeImageModule(types.ModuleType):
    def __init__(self, raise_on_open=False):
        super().__init__("PIL.Image")
        self.opened = []
        self.raise_on_open = raise_on_open

    def open(self, fp):
        if self.raise_on_open:
            raise OSError("cannot identify image file")
        self.opened.append(fp.read())
        return "IMG_SENTINEL"


def _install_engine(monkeypatch, text="  Hello\nOCR  ", raise_open=False,
                    raise_ocr=False):
    calls = {}

    tess = types.ModuleType("pytesseract")

    def image_to_string(img, lang="eng"):
        if raise_ocr:
            raise RuntimeError("tesseract crashed")
        calls["img"] = img
        calls["lang"] = lang
        return text

    tess.image_to_string = image_to_string
    pil = types.ModuleType("PIL")
    image_mod = _FakeImageModule(raise_on_open=raise_open)
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "pytesseract", tess)
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    return calls, image_mod


class TestEnginePresent:
    def test_happy_path_trims_and_passes_language(self, monkeypatch):
        calls, image_mod = _install_engine(monkeypatch)
        out = extract_text_from_image(b"imagebytes", language="deu")
        assert out == "Hello\nOCR"            # .strip() like ocr.ts:39
        assert calls["lang"] == "deu"          # language forwarded
        assert calls["img"] == "IMG_SENTINEL"  # PIL image object passed
        assert image_mod.opened == [b"imagebytes"]  # bytes reach PIL

    def test_default_language_is_eng(self, monkeypatch):
        calls, _ = _install_engine(monkeypatch)
        extract_text_from_image(b"x")
        assert calls["lang"] == "eng"

    def test_unreadable_image_returns_empty(self, monkeypatch):
        _install_engine(monkeypatch, raise_open=True)
        assert extract_text_from_image(b"not an image") == ""

    def test_engine_crash_returns_empty(self, monkeypatch):
        _install_engine(monkeypatch, raise_ocr=True)
        assert extract_text_from_image(b"x") == ""

    def test_empty_result_stays_empty(self, monkeypatch):
        _install_engine(monkeypatch, text="   \n  ")
        assert extract_text_from_image(b"x") == ""
