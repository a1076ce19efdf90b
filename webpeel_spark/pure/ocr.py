"""OCR seam — port of src/core/ocr.ts.

The reference runs Tesseract.js (ocr.ts:34-40); this sandbox ships no
OCR engine, so ``extract_text_from_image`` probes for one at runtime
(pytesseract + PIL) and otherwise returns "" — which is exactly the
reference's no-text outcome, so the pipeline branch downstream
(pipeline.ts:862-877) behaves identically to a Tesseract run that
finds nothing.  This is a declared dependency seam like the multimodal
decoder (operators/multimodal.py): the branch logic, shapes and
quality scoring are real and golden-tested; only the engine binding is
environment-provided.
"""

from __future__ import annotations

# ocr.ts:6-14
IMAGE_CONTENT_TYPES = [
    "image/png",
    "image/jpeg",
    "image/jpg",
    "image/gif",
    "image/webp",
    "image/tiff",
    "image/bmp",
]


def is_image_content_type(content_type: str) -> bool:
    """ocr.ts:19-22."""
    ct = content_type.lower()
    return any(t in ct for t in IMAGE_CONTENT_TYPES)


def extract_text_from_image(image_bytes: bytes,
                            language: str = "eng") -> str:
    """ocr.ts:30-40 — extracted text, trimmed; "" when no text found
    (or, here, when no OCR engine is installed)."""
    try:
        import io

        import pytesseract  # type: ignore[import-not-found]
        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        return ""
    try:
        img = Image.open(io.BytesIO(image_bytes))
        return pytesseract.image_to_string(img, lang=language).strip()
    except Exception:
        return ""
