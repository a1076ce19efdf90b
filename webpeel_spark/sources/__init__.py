"""Sources: synthetic pages corpus generator + testdata readers."""

from .corpus import generate_rows, write_corpus_parquet

__all__ = ["generate_rows", "write_corpus_parquet"]
