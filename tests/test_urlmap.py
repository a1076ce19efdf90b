"""map.ts URL-filter predicate suite (map.ts:9-166 port) — pure
semantics plus pure↔Catalyst parity."""

from __future__ import annotations

import pytest

from webpeel_spark.pure.urlmap import (
    calculate_relevance,
    map_filter_sort,
    safe_regex,
    should_include,
)


class TestSafeRegex:
    def test_compiles(self):
        assert safe_regex(r"/blog/").search("https://x.com/blog/post")

    def test_length_cap(self):
        with pytest.raises(ValueError, match="too long"):
            safe_regex("a" * 201)

    def test_invalid(self):
        with pytest.raises(ValueError, match="Invalid regex"):
            safe_regex("([")


class TestShouldInclude:
    def test_exclude_wins(self):
        assert not should_include("https://x.com/admin/panel",
                                  include=[safe_regex("admin")],
                                  exclude=[safe_regex("admin")])

    def test_include_required_when_present(self):
        inc = [safe_regex("/docs/")]
        assert should_include("https://x.com/docs/a", include=inc)
        assert not should_include("https://x.com/blog/a", include=inc)

    def test_no_patterns_passes(self):
        assert should_include("https://x.com/anything")

    def test_content_type_extension_and_substring(self):
        assert should_include("https://x.com/file.pdf",
                              content_types=["pdf"])
        assert should_include("https://x.com/file.PDF?dl=1",
                              content_types=[".pdf"])
        assert not should_include("https://x.com/file.html",
                                  content_types=["pdf"])

    def test_content_type_dot_free_url_is_whole_ext(self):
        # reference quirk: url.split('.').pop() on a dot-free string
        # returns the whole string (map.ts:108)
        assert should_include("pdf", content_types=["pdf"])
        assert not should_include("nope", content_types=["pdf"])


class TestRelevance:
    def test_weights(self):
        terms = ["spark", "guide"]
        # spark in url (3) + guide in title (2) + guide in desc (1)
        assert calculate_relevance(terms, "https://x.com/spark",
                                   "A Guide", "the guide text") == 3 + 2 + 1

    def test_no_terms_scores_one(self):
        assert calculate_relevance([], "https://x.com/a") == 1


ROWS = [
    ("https://x.com/docs/spark", "Spark docs", "tuning guide"),
    ("https://x.com/blog/cats", "Cats", None),
    ("https://x.com/docs/flink", "Flink docs", None),
    ("https://x.com/admin/x", "Admin", None),
    ("https://x.com/docs/spark", "dup row", None),   # first-seen kept
]


class TestMapFilterSort:
    def test_filter_and_score_sort(self):
        r = map_filter_sort(ROWS, include_patterns=["/docs/"],
                            exclude_patterns=["admin"], search="spark")
        assert r["urls"] == ["https://x.com/docs/spark",
                             "https://x.com/docs/flink"]
        assert r["total"] == 2

    def test_alpha_sort_without_search(self):
        r = map_filter_sort(ROWS)
        assert r["urls"] == sorted({u for u, _, _ in ROWS})

    def test_max_urls_cap(self):
        r = map_filter_sort(ROWS, max_urls=2)
        assert r["total"] == 2

    # expected order generated with Node's actual localeCompare:
    # case-insensitive primary, lowercase before uppercase on ties
    # (punctuation-collation divergence is documented in _locale_key)
    LOCALE_CASES = [
        "https://B.example/x", "https://a.example/y",
        "https://A.example/x", "https://a.example/x",
        "https://b.example/w", "HTTPS://a.example/z",
    ]
    LOCALE_EXPECTED = [
        "https://a.example/x", "https://A.example/x",
        "https://a.example/y", "HTTPS://a.example/z",
        "https://b.example/w", "https://B.example/x",
    ]

    def test_mixed_case_locale_order(self):
        r = map_filter_sort([(u, None, None) for u in self.LOCALE_CASES])
        assert r["urls"] == self.LOCALE_EXPECTED

    def test_mixed_case_locale_order_spark(self):
        pytest.importorskip("pyspark")
        from webpeel_spark.operators.urlmap import map_url_candidates
        from webpeel_spark.session import get_spark

        spark = get_spark(cores=2)
        df = spark.createDataFrame([(u,) for u in self.LOCALE_CASES],
                                   "url string")
        out = map_url_candidates(df).collect()
        assert [r.url for r in out] == self.LOCALE_EXPECTED


class TestSparkParity:
    def test_catalyst_matches_pure(self):
        pytest.importorskip("pyspark")
        from webpeel_spark.operators.urlmap import map_url_candidates
        from webpeel_spark.session import get_spark

        spark = get_spark(cores=2)
        # distinct titles per url so pure first-seen == spark max()
        rows = [(u, t, d) for u, t, d in ROWS if t != "dup row"]
        df = spark.createDataFrame(
            rows, "url string, title string, description string")
        out = map_url_candidates(
            df, include_patterns=["/docs/"], exclude_patterns=["admin"],
            search="spark guide").collect()
        pure = map_filter_sort(rows, include_patterns=["/docs/"],
                               exclude_patterns=["admin"],
                               search="spark guide")
        assert [r.url for r in out] == pure["urls"]
        # scores: spark url hits 3 + title 2 + desc(guide) 1 + title? —
        # spot-check the top row carries the max score
        assert out[0].score >= out[-1].score

    def test_driver_side_pattern_validation(self):
        pytest.importorskip("pyspark")
        from webpeel_spark.operators.urlmap import map_url_candidates
        from webpeel_spark.session import get_spark

        spark = get_spark(cores=2)
        df = spark.createDataFrame([("https://x.com/a",)], "url string")
        with pytest.raises(ValueError, match="too long"):
            map_url_candidates(df, include_patterns=["a" * 201])
