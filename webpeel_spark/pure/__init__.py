"""Pure extraction layer — no Spark imports, unit-testable standalone.

Mirrors the reference's pipeline.ts (wiring) vs readability/markdown/
pruner (pure) split; every module cites the reference file:line ranges
it reimplements.
"""

from .pipeline import ExtractOptions, DEFAULT_OPTIONS, extract_page, detect_content_type

__all__ = ["ExtractOptions", "DEFAULT_OPTIONS", "extract_page", "detect_content_type"]
