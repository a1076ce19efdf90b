"""Text-analysis operators over a documents table.

DataFrame-level wrappers around the JVM-side column expressions in
functions/text.py — language distribution, per-source stats, quality
scoring, token counting, fingerprinting.  Each has an exact ANSI-SQL
oracle (see __spark_entry__.oracle_sql); all stay in whole-stage
codegen (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    fingerprint_md5,
    mean_word_length,
    punct_ratio,
    quality_heuristic,
    stopword_ratio,
    token_estimate,
    word_count,
)


def doc_token_stats(df: DataFrame) -> DataFrame:
    """Per-document word/token/char metrics."""
    return df.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        word_count(F.col("text")).alias("n_words"),
        token_estimate(F.col("text")).alias("n_tokens"),
    ).orderBy("doc_id")


def language_distribution(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.avg(F.length("text")), 2).alias("avg_chars"),
            F.sum(token_estimate(F.col("text"))).alias("total_tokens"),
        )
        .orderBy("lang")
    )


def source_stats(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.avg(word_count(F.col("text"))), 2).alias("avg_words"),
            F.max(F.length("text")).alias("max_chars"),
            F.min(F.length("text")).alias("min_chars"),
        )
        .orderBy("source")
    )


def doc_quality(df: DataFrame) -> DataFrame:
    return df.select(
        "doc_id",
        quality_heuristic(F.col("text")).alias("quality"),
        stopword_ratio(F.col("text")).alias("stopword_ratio"),
        punct_ratio(F.col("text")).alias("punct_ratio"),
        mean_word_length(F.col("text")).alias("mean_word_len"),
    ).orderBy("doc_id")


def doc_fingerprints(df: DataFrame) -> DataFrame:
    return df.select(
        "doc_id", fingerprint_md5(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")


def length_filter(df: DataFrame, min_chars: int = 100,
                  max_chars: int = 1_000_000) -> DataFrame:
    """Length-window quality filter (predicate pushes to the scan)."""
    return df.filter(
        (F.length("text") >= min_chars) & (F.length("text") <= max_chars)
    )
