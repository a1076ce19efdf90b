"""Training-corpus quality filters (Gopher/C4-style), pure Catalyst.

The reference scores page quality for extraction (markdown.ts
calculate_quality — ported in functions/text.py); a 100 TB training
pipeline additionally gates documents on corpus-hygiene rules before
dedup/tokenization.  This implements the standard document-level
signals from the Gopher (Rae et al. 2021, §A1.1) and C4
(Raffel et al. 2020, §2.2) cleaning recipes as built-in column
expressions — no Python in the plan, every predicate pushes into
whole-stage codegen, and the whole operator is one narrow projection
(no shuffle at any scale).

Signals (each exposed as a column so downstream can re-threshold
without recomputing):

* word count bounds           (Gopher: 50 ≤ words ≤ 100,000)
* mean word length bounds     (Gopher: 3 ≤ mwl ≤ 10)
* symbol-to-word ratio        (Gopher: '#' or '…' ratio ≤ 0.1)
* alpha-word fraction         (Gopher: ≥ 80% words contain a letter)
* stopword hits               (Gopher: ≥ 2 distinct stopwords)
* ellipsis-line fraction      (Gopher: ≤ 30% lines end with '…'/'...')
* bullet-line fraction        (Gopher: ≤ 90% lines start with a bullet)
* terminal-punctuation lines  (C4: keep lines ending in .!?" — here a
                               doc-level fraction)
* brace presence              (C4 drops pages containing '{' — code)
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher §A1.1 thresholds
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_RATIO = 0.1
MIN_ALPHA_WORD_FRACTION = 0.8
MIN_STOPWORD_HITS = 2
MAX_ELLIPSIS_LINE_FRACTION = 0.3
MAX_BULLET_LINE_FRACTION = 0.9

# the Gopher rule uses a small fixed stopword list
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _words(col: Column) -> Column:
    w = F.split(F.trim(col), r"\s+")
    return F.when(F.trim(col) == "", F.array().cast("array<string>")) \
            .otherwise(w)


def quality_signals(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document quality signal columns + the combined gopher_pass /
    c4_keep verdicts.  One narrow projection; scales trivially."""
    words = _words(F.col(text_col))
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wl = (F.aggregate(words, F.lit(0),
                           lambda acc, w: acc + F.length(w)).cast("double")
               / nw)
    n_hash = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"#", ""))
    # each non-overlapping '...' match shrinks by 1 char when replaced
    # with '..', so the length delta IS the match count
    n_ell = (F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"…", ""))) \
        + (F.length(F.col(text_col)) - F.length(
            F.regexp_replace(F.col(text_col), r"\.\.\.", "..")))
    symbol_ratio = (n_hash + n_ell).cast("double") / nw
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_fraction = alpha_words.cast("double") / nw
    lw = F.transform(words, lambda w: F.lower(w))
    stopword_hits = F.size(F.array_intersect(
        lw, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])))

    lines = F.split(F.col(text_col), r"\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    ellipsis_lines = F.size(F.filter(
        lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
    bullet_lines = F.size(F.filter(
        lines, lambda l: l.rlike(r"^\s*([-*•]|\d+[.)])\s")))
    ellipsis_line_fraction = ellipsis_lines.cast("double") / n_lines
    bullet_line_fraction = bullet_lines.cast("double") / n_lines
    terminal_punct_lines = F.size(F.filter(
        lines, lambda l: l.rlike("[.!?\"]\\s*$")))
    terminal_punct_fraction = terminal_punct_lines.cast("double") / n_lines
    has_brace = F.col(text_col).contains("{")

    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.round(alpha_fraction, 4).alias("alpha_word_fraction"),
        stopword_hits.alias("stopword_hits"),
        F.round(ellipsis_line_fraction, 4).alias("ellipsis_line_fraction"),
        F.round(bullet_line_fraction, 4).alias("bullet_line_fraction"),
        F.round(terminal_punct_fraction, 4).alias("terminal_punct_fraction"),
        has_brace.alias("has_brace"),
    )
    gopher_pass = (
        (F.col("n_words") >= MIN_WORDS)
        & (F.col("n_words") <= MAX_WORDS)
        & (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN)
        & (F.col("symbol_ratio") <= MAX_SYMBOL_RATIO)
        & (F.col("alpha_word_fraction") >= MIN_ALPHA_WORD_FRACTION)
        & (F.col("stopword_hits") >= MIN_STOPWORD_HITS)
        & (F.col("ellipsis_line_fraction") <= MAX_ELLIPSIS_LINE_FRACTION)
        & (F.col("bullet_line_fraction") <= MAX_BULLET_LINE_FRACTION)
    )
    c4_keep = (~F.col("has_brace")) & (F.col("n_words") >= 3) \
        & (F.col("terminal_punct_fraction") > 0)
    return out.withColumn("gopher_pass", gopher_pass) \
              .withColumn("c4_keep", c4_keep)


def gopher_filter(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Documents passing the Gopher gates (predicate-only plan —
    filters compose with the scan via column pruning; the signal
    projection never materializes for dropped rows)."""
    sig = quality_signals(df, text_col, id_col)
    return sig.filter(F.col("gopher_pass"))


# Gopher §A1.1 repetition thresholds
MAX_DUP_LINE_FRACTION = 0.30
MAX_TOP_2GRAM_FRACTION = 0.20
MAX_TOP_3GRAM_FRACTION = 0.18


def _ngrams(words: Column, k: int) -> Column:
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))
    return F.when(n >= k, grams).otherwise(
        F.array().cast("array<string>"))


def _top_gram_fraction(grams: Column) -> Column:
    distinct = F.array_distinct(grams)
    counts = F.transform(
        distinct, lambda g: F.size(F.filter(grams, lambda x: x == g)))
    return F.when(F.size(grams) == 0, F.lit(0.0)).otherwise(
        F.array_max(counts).cast("double") / F.size(grams))


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher repetition-removal signals: duplicate-line fraction and
    most-frequent-2/3-gram mass fraction, with the paper's gates
    (≤0.30 / ≤0.20 / ≤0.18) combined into repetition_pass.

    Counting the top n-gram is O(distinct × total) per document in
    expression form — fine for the ≤10^3-word documents this table
    holds; pathological mega-documents should be length-gated first
    (quality_signals MAX_WORDS does exactly that).  The heavier
    duplicate-n-gram CHARACTER-mass variants (Gopher's dup-5..10-gram
    rows) belong in the same shape but are omitted here.  Boilerplate
    DUPLICATION across documents is the dedup family's job
    (operators/dedup.py), not this per-document operator's.
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    lines = F.split(F.col(text_col), r"\n")
    dup_line_fraction = F.round(
        F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double")
        / F.greatest(F.size(lines), F.lit(1)), 4)
    top2 = F.round(_top_gram_fraction(_ngrams(words, 2)), 4)
    top3 = F.round(_top_gram_fraction(_ngrams(words, 3)), 4)
    out = df.select(
        F.col(id_col),
        dup_line_fraction.alias("dup_line_fraction"),
        top2.alias("top_2gram_fraction"),
        top3.alias("top_3gram_fraction"),
    )
    rep_pass = ((F.col("dup_line_fraction") <= MAX_DUP_LINE_FRACTION)
                & (F.col("top_2gram_fraction") <= MAX_TOP_2GRAM_FRACTION)
                & (F.col("top_3gram_fraction") <= MAX_TOP_3GRAM_FRACTION))
    return out.withColumn("repetition_pass", rep_pass)


def repetition_oracle_sql() -> str:
    """DuckDB twin of repetition_signals."""
    def grams_sql(k: int) -> str:
        km1 = k - 1
        return (f"CASE WHEN len(w) >= {k} THEN "
                f"list_transform(generate_series(1, greatest(len(w) - {km1}, 1)), "
                f"i -> array_to_string(w[i:i+{km1}], ' ')) "
                f"ELSE []::VARCHAR[] END")

    def top_sql(g: str) -> str:
        return (f"CASE WHEN len({g}) = 0 THEN 0.0 ELSE "
                f"CAST(list_max(list_transform(list_distinct({g}), "
                f"d -> len(list_filter({g}, x -> x = d)))) AS DOUBLE) "
                f"/ len({g}) END")

    return f"""
        WITH base AS (
          SELECT doc_id,
                 string_split_regex(lower(trim(text)), '\\s+') AS w,
                 string_split(text, chr(10)) AS lines
          FROM documents
        ), g AS (
          SELECT doc_id, lines,
                 {grams_sql(2)} AS g2,
                 {grams_sql(3)} AS g3
          FROM base
        ), sig AS (
          -- fractions computed ONCE (the top-gram scan is O(|distinct|
          -- × |grams|) per doc — inlining it twice doubles oracle cost)
          SELECT doc_id,
                 round(1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)
                       / greatest(len(lines), 1), 4) AS dup_line_fraction,
                 round({top_sql('g2')}, 4) AS top_2gram_fraction,
                 round({top_sql('g3')}, 4) AS top_3gram_fraction
          FROM g
        )
        SELECT doc_id, dup_line_fraction, top_2gram_fraction,
               top_3gram_fraction,
               (dup_line_fraction <= {MAX_DUP_LINE_FRACTION}
                AND top_2gram_fraction <= {MAX_TOP_2GRAM_FRACTION}
                AND top_3gram_fraction <= {MAX_TOP_3GRAM_FRACTION})
                 AS repetition_pass
        FROM sig ORDER BY doc_id
    """


def quality_signals_oracle_sql(stopwords: List[str] = None) -> str:
    """DuckDB SQL mirroring quality_signals over the documents view,
    IEEE-step-for-step (exact ratios before round(…, 4))."""
    sw = stopwords or list(GOPHER_STOPWORDS)
    sw_sql = "[" + ",".join(f"'{s}'" for s in sw) + "]"
    return f"""
        WITH base AS (
          SELECT doc_id, text,
                 CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                      ELSE string_split_regex(trim(text), '\\s+') END AS w,
                 string_split(text, chr(10)) AS lines
          FROM documents
        ), m AS (
          SELECT doc_id, text, w, lines,
                 len(w) AS n_words,
                 CAST(greatest(len(w), 1) AS DOUBLE) AS nw,
                 CAST(greatest(len(lines), 1) AS DOUBLE) AS nl
          FROM base
        )
        SELECT doc_id,
           n_words,
           round(CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS DOUBLE)
                 / nw, 4) AS mean_word_len,
           round(CAST(
               (length(text) - length(replace(text, '#', '')))
             + (length(text) - length(replace(text, '…', '')))
             + (length(text)
                - length(regexp_replace(text, '\\.\\.\\.', '..', 'g')))
             AS DOUBLE) / nw, 4) AS symbol_ratio,
           round(CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                      AS DOUBLE) / nw, 4) AS alpha_word_fraction,
           len(list_intersect(list_distinct(list_transform(w, x -> lower(x))), {sw_sql}))
             AS stopword_hits,
           round(CAST(len(list_filter(lines,
                 l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
                 AS DOUBLE) / nl, 4) AS ellipsis_line_fraction,
           round(CAST(len(list_filter(lines,
                 l -> regexp_matches(l, '^\\s*([-*•]|[0-9]+[.)])\\s')))
                 AS DOUBLE) / nl, 4) AS bullet_line_fraction,
           round(CAST(len(list_filter(lines,
                 l -> regexp_matches(l, '[.!?"]\\s*$')))
                 AS DOUBLE) / nl, 4) AS terminal_punct_fraction,
           contains(text, '{{') AS has_brace,
           (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}
            AND round(CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0)
                      AS DOUBLE) / nw, 4) >= {MIN_MEAN_WORD_LEN}
            AND round(CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0)
                      AS DOUBLE) / nw, 4) <= {MAX_MEAN_WORD_LEN}
            AND round(CAST(
                  (length(text) - length(replace(text, '#', '')))
                + (length(text) - length(replace(text, '…', '')))
                + (length(text)
                   - length(regexp_replace(text, '\\.\\.\\.', '..', 'g')))
                AS DOUBLE) / nw, 4) <= {MAX_SYMBOL_RATIO}
            AND round(CAST(len(list_filter(w,
                  x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / nw, 4)
                  >= {MIN_ALPHA_WORD_FRACTION}
            AND len(list_intersect(list_distinct(list_transform(w, x -> lower(x))),
                  {sw_sql})) >= {MIN_STOPWORD_HITS}
            AND round(CAST(len(list_filter(lines,
                  l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
                  AS DOUBLE) / nl, 4) <= {MAX_ELLIPSIS_LINE_FRACTION}
            AND round(CAST(len(list_filter(lines,
                  l -> regexp_matches(l, '^\\s*([-*•]|[0-9]+[.)])\\s')))
                  AS DOUBLE) / nl, 4) <= {MAX_BULLET_LINE_FRACTION})
             AS gopher_pass,
           (NOT contains(text, '{{') AND n_words >= 3
            AND round(CAST(len(list_filter(lines,
                  l -> regexp_matches(l, '[.!?"]\\s*$')))
                  AS DOUBLE) / nl, 4) > 0) AS c4_keep
        FROM m ORDER BY doc_id
    """
