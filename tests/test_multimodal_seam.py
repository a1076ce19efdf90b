"""Multimodal pixel-decoder seam (round-7 directive): mirror the OCR
seam tests — pin the no-engine path (this sandbox: PIL absent →
``unimplemented:`` status, never a crash) AND the engine-present path
against a stub PIL injected into sys.modules, so neither side of the
capability probe can rot."""

from __future__ import annotations

import sys
import types

import pytest

from webpeel_spark.operators.multimodal import (
    _decode_real, _fake_features, _pixel_decoder,
)


class TestNoEngine:
    def test_probe_returns_none_without_pil(self, monkeypatch):
        monkeypatch.setitem(sys.modules, "PIL", None)
        assert _pixel_decoder() is None

    def test_decode_real_raises_not_implemented_without_pil(self, monkeypatch):
        monkeypatch.setitem(sys.modules, "PIL", None)
        with pytest.raises(NotImplementedError, match="requires PIL"):
            _decode_real(b"\x89PNG fake", "image")

    def test_audio_video_stay_declared_seam(self):
        # ffmpeg is not probed-for — a fake sample decode would be
        # padding; the seam stays loud for these kinds
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            _decode_real(b"RIFF....", "audio")
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            _decode_real(b"\x00\x00\x00 ftyp", "video")


class _FakeImage:
    """Minimal PIL.Image object: convert/resize chain ending in
    something np.asarray understands."""

    def __init__(self, pixels):
        self._pixels = pixels

    def convert(self, mode):
        assert mode == "L"
        return self

    def resize(self, size):
        w, h = size
        # deterministic "thumbnail": a h×w ramp of pixel values
        return [[(r * w + c) * 255 // max(1, h * w - 1)
                 for c in range(w)] for r in range(h)]


def _install_pil(monkeypatch):
    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")

    def open_(fp):
        data = fp.read()
        if not data.startswith(b"\x89PNG"):
            raise OSError("cannot identify image file")
        return _FakeImage(data)

    image_mod.open = open_
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)


class TestEnginePresent:
    def test_probe_finds_injected_engine(self, monkeypatch):
        _install_pil(monkeypatch)
        assert _pixel_decoder() is not None

    def test_decode_real_produces_normalized_features(self, monkeypatch):
        _install_pil(monkeypatch)
        feats = _decode_real(b"\x89PNG imagedata", "image", feature_dim=16)
        assert len(feats) == 16
        assert all(0.0 <= f <= 1.0 for f in feats)
        assert feats[0] == 0.0 and feats[-1] == 1.0  # the ramp survives

    def test_decode_real_is_deterministic(self, monkeypatch):
        _install_pil(monkeypatch)
        a = _decode_real(b"\x89PNG imagedata", "image")
        b = _decode_real(b"\x89PNG imagedata", "image")
        assert a == b

    def test_decoder_error_propagates_for_row_isolation(self, monkeypatch):
        # a corrupt payload raises OSError; extract_features turns it
        # into an "error:" status row (pinned in the Spark-level test)
        _install_pil(monkeypatch)
        with pytest.raises(OSError):
            _decode_real(b"not a png", "image")

    def test_odd_feature_dim_padded(self, monkeypatch):
        _install_pil(monkeypatch)
        feats = _decode_real(b"\x89PNG imagedata", "image", feature_dim=7)
        assert len(feats) == 7


class TestStubPath:
    def test_fake_features_unchanged_by_seam_rework(self):
        # the deterministic stub is what the contract corpus pins —
        # its values must not move when the real path evolves
        feats = _fake_features(b"payload", dim=4)
        assert len(feats) == 4
        assert all(0.0 <= f < 1.0 for f in feats)
        assert list(feats) == list(_fake_features(b"payload", dim=4))
