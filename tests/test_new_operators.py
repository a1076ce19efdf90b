"""BM25 / salted agg / JVM-side language-ID operators.

Each new operator is checked against an independent implementation:
BM25 against a from-scratch Python scorer, salted_key_agg against a
plain groupBy, lang_id_stopword against pure/langdetect._stopword_vote.
"""

from __future__ import annotations

import math

import pytest

from webpeel_spark.pure.langdetect import _stopword_vote


@pytest.fixture(scope="module")
def spark():
    from webpeel_spark.session import get_spark

    s = get_spark(app_name="test-new-ops", cores=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


DOCS = [
    (0, "the data pipeline runs nightly and checks data quality"),
    (1, "a quality checkpoint for every pipeline stage"),
    (2, "unrelated text about cooking rice and beans"),
    (3, "data data data pipeline pipeline quality"),
    (4, ""),
    (5, "el contenido de la pagina es muy bueno y esta en la red"),
]


def _py_bm25(docs, query, k1=1.5, b=0.75):
    import re

    tok = lambda s: re.findall(r"[a-z0-9]+", s.lower())
    terms = list(dict.fromkeys(tok(query)))
    words = {i: tok(t) for i, t in docs}
    n = len(docs)
    avgdl = sum(len(w) for w in words.values()) / n or 1.0
    scores = {}
    for i, _ in docs:
        w = words[i]
        s = 0.0
        for t in terms:
            tf = w.count(t)
            df = sum(1 for ww in words.values() if t in ww)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        if round(s, 4) > 0:
            scores[i] = round(s, 4)
    return scores


def test_bm25_matches_independent_python(spark):
    from webpeel_spark.operators.bm25 import bm25_rank

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_rank(df, "data pipeline quality", top_k=10).collect()}
    expected = _py_bm25(DOCS, "data pipeline quality")
    assert got == pytest.approx(expected)
    # doc 3 (heaviest term repetition) must rank above doc 2 (no terms)
    assert 3 in got and 2 not in got


def test_bm25_empty_query(spark):
    from webpeel_spark.operators.bm25 import bm25_rank

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    assert bm25_rank(df, "???", top_k=5).count() == 0


def test_salted_key_agg_equals_plain_groupby(spark):
    from pyspark.sql import functions as F
    from webpeel_spark.plans.partitioning import find_hot_keys, salted_key_agg

    rows = [(i % 7, float(i)) for i in range(1000)] + [(0, 1.0)] * 500
    df = spark.createDataFrame(rows, "k int, v double")
    hot = find_hot_keys(df, "k", threshold_fraction=0.2)
    assert 0 in hot  # key 0 holds ~43% of rows
    salted = {
        (r["k"]): (r["n"], round(r["s"], 6))
        for r in salted_key_agg(
            df, "k", {"n": ("count", "*"), "s": ("sum", F.col("v"))}, hot
        ).collect()
    }
    plain = {
        (r["k"]): (r["n"], round(r["s"], 6))
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert salted == plain


def test_lang_id_matches_pure_stopword_vote(spark):
    from webpeel_spark.operators.text_analysis import lang_id_stopword

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["lang_guess"] for r in lang_id_stopword(df).collect()}
    for i, text in DOCS:
        assert got[i] == _stopword_vote(text[:2000]), f"doc {i}"
    assert got[5] == "es"
    assert got[4] == "und"


QF_DOCS = [
    # passes every Gopher gate: 60 normal words incl. stopwords
    (0, ("the data pipeline reads pages and writes parquet with good "
         "quality " * 6).strip()),
    (1, "too short to pass the minimum word count gate"),
    (2, "### " * 60),                                  # symbol-heavy, no alpha
    (3, "{ \"json\": true } " + "the config block of that thing " * 12),
    (4, ""),
]


def test_quality_signals_gates(spark):
    from webpeel_spark.operators.quality_filters import (
        gopher_filter, quality_signals,
    )

    df = spark.createDataFrame(QF_DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in quality_signals(df).collect()}

    assert rows[0]["gopher_pass"] is True
    assert rows[0]["c4_keep"] is False          # no terminal punctuation
    assert rows[1]["gopher_pass"] is False      # < 50 words
    assert rows[2]["gopher_pass"] is False      # symbol ratio + alpha + stopwords
    assert rows[2]["alpha_word_fraction"] == 0.0
    # braces are a C4 gate, not a Gopher gate — doc 3 passes Gopher
    assert rows[3]["has_brace"] is True and rows[3]["c4_keep"] is False
    assert rows[3]["gopher_pass"] is True
    assert rows[4]["n_words"] == 0 and rows[4]["gopher_pass"] is False

    kept = {r["doc_id"] for r in gopher_filter(df).collect()}
    assert kept == {0, 3}


def test_quality_signals_against_independent_python(spark):
    """Signals recomputed with plain Python on the fixture docs."""
    from webpeel_spark.operators.quality_filters import (
        GOPHER_STOPWORDS, quality_signals,
    )

    df = spark.createDataFrame(QF_DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in quality_signals(df).collect()}
    for doc_id, text in QF_DOCS:
        words = text.split()
        nw = max(len(words), 1)
        r = rows[doc_id]
        assert r["n_words"] == len(words)
        assert r["mean_word_len"] == round(
            sum(len(w) for w in words) / nw, 4)
        assert r["symbol_ratio"] == round(
            (text.count("#") + text.count("…")
             + _count_ellipsis(text)) / nw, 4)
        assert r["stopword_hits"] == len(
            {w.lower() for w in words} & set(GOPHER_STOPWORDS))


def _count_ellipsis(text):
    import re

    return len(re.findall(r"\.\.\.", text))


def test_repetition_signals_gates(spark):
    from webpeel_spark.operators.quality_filters import repetition_signals

    docs = [
        (0, "the data pipeline reads pages and writes clean parquet files"),
        (1, "buy now " * 40),                    # one 2-gram dominates
        (2, "line one\nline one\nline one\nunique line"),   # dup lines
        (3, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}

    assert rows[0]["repetition_pass"] is True
    assert rows[0]["dup_line_fraction"] == 0.0

    # "buy now buy now ..." → 2-grams alternate "buy now"/"now buy";
    # the top one holds ~half the mass, far over the 0.20 gate
    assert rows[1]["top_2gram_fraction"] > 0.4
    assert rows[1]["repetition_pass"] is False

    assert rows[2]["dup_line_fraction"] == 0.5  # 4 lines, 2 distinct
    assert rows[2]["repetition_pass"] is False

    assert rows[3]["top_2gram_fraction"] == 0.0


def test_source_rank_matches_pure_port(spark):
    """Catalyst source ranking == the pure source-scoring port (same
    tier table, same query literals, fixed now) including the
    per-domain dedup window."""
    from datetime import datetime, timezone

    from webpeel_spark.operators.source_rank import score_sources
    from webpeel_spark.pure.source_scoring import score_fetched_sources

    now_str = "2026-08-01 00:00:00"
    now = datetime(2026, 8, 1, tzinfo=timezone.utc)
    query = "cerebras api rate limits"
    rows = [
        ("https://cerebras.ai/pricing", "A", "s", 0.7, "2026-07-30 12:00:00"),
        ("https://docs.cerebras.ai/api", "B", "s", 0.6, "2026-05-01 00:00:00"),
        ("https://cerebras.ai/blog", "C", "s", 0.5, None),
        ("https://cdc.gov/data", "D", "s", 0.4, "2024-01-01 00:00:00"),
        ("https://randomblog.io/post", "E", "s", 0.9, "1989-05-01 00:00:00"),
        ("https://en.wikipedia.org/wiki/AI", "F", "s", 0.3, None),
    ]
    df = spark.createDataFrame(
        rows, "url string, title string, snippet string, bm25 double, "
              "published string")
    got = {r["url"]: r for r in score_sources(df, query, now_str).collect()}

    # pure port (publishDate as ISO with T/Z so _parse_date accepts it)
    sources = [
        {"searchResult": {"url": u, "title": t, "snippet": s},
         "bm25Score": b,
         "metadata": ({"publishDate": p.replace(" ", "T") + "Z"}
                      if p else {})}
        for (u, t, s, b, p) in rows
    ]
    expected = score_fetched_sources(sources, query, now=now)

    assert set(got) == {e["url"] for e in expected}
    for e in expected:
        g = got[e["url"]]
        assert g["authority"] == e["authority"], e["url"]
        assert g["freshness"] == e["freshness"], e["url"]
        assert g["is_primary"] == e["isPrimarySource"], e["url"]
        assert abs(g["final_score"] - e["finalScore"]) < 1e-6, e["url"]


def test_contamination_flags_planted_benchmark(spark):
    """Docs sharing a 13-gram with the benchmark flag; others don't;
    sub-13-word docs use the whole-text gram convention."""
    from webpeel_spark.operators.decontaminate import contamination_flags

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliett kilo lima mike november oscar papa")   # 16 words
    docs = spark.createDataFrame(
        [(0, base),
         (1, "prefix words " + base),          # shares 13-grams with 0
         (2, "totally different content that never overlaps benchmark "
             "text in any thirteen word window at all here today"),
         (3, "short doc"),                      # whole-text gram
         (4, "short doc")],                     # identical short doc
        "doc_id long, text string")
    benchmark = docs.filter("doc_id = 0 or doc_id = 3")
    rows = {r["doc_id"]: r for r in
            contamination_flags(docs, benchmark).collect()}
    assert rows[0]["flagged"] is True           # benchmark flags itself
    assert rows[1]["flagged"] is True           # overlapping 13-grams
    assert rows[2]["flagged"] is False
    assert rows[3]["flagged"] is True           # whole-text gram hit
    assert rows[4]["flagged"] is True           # identical short doc
    assert rows[1]["matched_grams"] >= 1


def test_pii_signals_counts_and_redaction(spark):
    from webpeel_spark.operators.pii import pii_signals

    docs = spark.createDataFrame(
        [(0, "Mail a@b.io and c.d+x@e-corp.org; call (555) 123-4567; "
             "host 10.0.0.7 up"),
         (1, "nothing sensitive here")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in pii_signals(docs).collect()}
    assert rows[0]["n_emails"] == 2
    assert rows[0]["n_phones"] == 1
    assert rows[0]["n_ips"] == 1
    assert rows[0]["has_pii"] is True
    red = rows[0]["redacted"]
    assert "<EMAIL>" in red and "<PHONE>" in red and "<IP>" in red
    assert "a@b.io" not in red and "555" not in red and "10.0.0.7" not in red
    assert rows[1]["has_pii"] is False
    assert rows[1]["redacted"] == "nothing sensitive here"
