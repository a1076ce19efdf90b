"""domain-memory.ts port: order-dependent fold semantics, confidence
ramp, and the distributed domain_memory table build."""

from __future__ import annotations

from datetime import datetime

import pytest

from webpeel_spark.pure.domain_memory import (
    confidence,
    fold_results,
    memory_stats,
    normalise_domain,
    recommended_method,
)


class TestNormaliseDomain:
    def test_strips_www_and_lowercases(self):
        assert normalise_domain("https://WWW.Example.com/a") == "example.com"
        assert normalise_domain("https://sub.example.com/x") \
            == "sub.example.com"
        assert normalise_domain("www.example.com") == "example.com"
        assert normalise_domain("Example.COM") == "example.com"


def res(method, quality, ms=100, ts=None, blocked=False, js=False):
    return {"method": method, "response_ms": ms, "quality": quality,
            "was_blocked": blocked, "had_javascript": js, "ts": ts}


class TestFold:
    def test_first_result_seeds_entry(self):
        e = fold_results("d.com", [res("simple", 0.8, 120,
                                       ts=datetime(2024, 3, 1))])
        assert e["best_method"] == "simple"
        assert e["avg_quality"] == 0.8
        assert e["success_count"] == 1
        assert not e["requires_js"] and not e["has_antibot"]

    def test_best_method_upgrades_on_strictly_higher_quality(self):
        e = fold_results("d.com", [res("simple", 0.5),
                                   res("browser", 0.9)])
        assert e["best_method"] == "browser"
        # equal quality does NOT upgrade
        e = fold_results("d.com", [res("simple", 0.5),
                                   res("browser", 0.5)])
        assert e["best_method"] == "simple"

    def test_fold_is_order_dependent_like_reference(self):
        """ts:88-92 compares incoming quality to the RUNNING average —
        so the same multiset of results can yield different
        best_method depending on order (reference semantics; the
        operator pins order by sorting on ts)."""
        a = fold_results("d.com", [res("simple", 0.9),
                                   res("browser", 0.6),
                                   res("stealth", 0.8)])
        b = fold_results("d.com", [res("browser", 0.6),
                                   res("stealth", 0.8),
                                   res("simple", 0.9)])
        # a: 0.8 > avg(0.75) → stealth; b: 0.9 > avg(0.7) → simple
        assert a["best_method"] == "stealth"
        assert b["best_method"] == "simple"
        assert round(a["avg_quality"], 10) == round(b["avg_quality"], 10)

    def test_rolling_averages(self):
        e = fold_results("d.com", [res("simple", 0.6, 100),
                                   res("simple", 0.8, 300)])
        assert e["avg_quality"] == (0.6 * 1 + 0.8) / 2
        assert e["avg_response_ms"] == (100 * 1 + 300) / 2

    def test_sticky_flags(self):
        e = fold_results("d.com", [res("stealth", 0.5),
                                   res("simple", 0.4)])
        assert e["has_antibot"] and e["requires_js"]  # once set, stays
        e2 = fold_results("d.com", [res("simple", 0.5, js=True),
                                    res("simple", 0.4, blocked=True)])
        assert e2["requires_js"] and e2["has_antibot"]

    def test_empty_log(self):
        assert fold_results("d.com", []) is None
        assert recommended_method(None) is None


class TestConfidenceRamp:
    @pytest.mark.parametrize("count,want", [
        (1, 0.3), (2, 0.425), (3, 0.55), (4, 0.675), (5, 0.8),
        (7, 0.8 + (2 / 5) * 0.15), (9, 0.8 + (4 / 5) * 0.15),
        (10, 0.95), (50, 0.95),
    ])
    def test_reference_values(self, count, want):
        assert confidence(count) == want

    def test_recommended_method_shape(self):
        e = fold_results("d.com", [res("browser", 0.7, 150, js=True)])
        r = recommended_method(e)
        assert r == {"method": "browser", "confidence": 0.3,
                     "avg_response_ms": 150.0, "requires_js": True}


class TestStats:
    def test_top_n(self):
        entries = [{"domain": f"d{i}.com", "best_method": "simple",
                    "success_count": i} for i in range(30)]
        s = memory_stats(entries, top_n=20)
        assert s["total_domains"] == 30
        assert len(s["top_domains"]) == 20
        assert s["top_domains"][0]["success_count"] == 29


class TestSparkOperator:
    @pytest.fixture(scope="class")
    def spark(self):
        pytest.importorskip("pyspark")
        from webpeel_spark.session import get_spark

        s = get_spark(cores=4)
        s.sparkContext.setLogLevel("ERROR")
        return s

    def test_table_build_matches_pure_fold(self, spark):
        from webpeel_spark.operators.domain_memory import (
            build_domain_memory,
            recommend_methods,
            top_domains,
        )

        rows = [
            ("https://www.a.com/1", "simple", 100.0, 0.9, False, False,
             datetime(2024, 3, 1)),
            ("https://a.com/2", "browser", 400.0, 0.6, False, True,
             datetime(2024, 3, 2)),
            ("https://a.com/3", "stealth", 900.0, 0.8, True, False,
             datetime(2024, 3, 3)),
            ("https://b.org/1", "simple", 80.0, 0.7, False, False,
             datetime(2024, 3, 1)),
        ]
        df = spark.createDataFrame(
            rows, "url string, method string, response_ms double, "
                  "quality double, was_blocked boolean, "
                  "had_javascript boolean, ts timestamp")
        profiles = {r["domain"]: r for r in
                    build_domain_memory(df).collect()}
        a = profiles["a.com"]  # www. collapses into the same domain
        pure = fold_results("a.com", [
            res("simple", 0.9, 100.0, datetime(2024, 3, 1)),
            res("browser", 0.6, 400.0, datetime(2024, 3, 2), js=True),
            res("stealth", 0.8, 900.0, datetime(2024, 3, 3),
                blocked=True),
        ])
        assert a["best_method"] == pure["best_method"] == "stealth"
        assert a["avg_quality"] == pure["avg_quality"]
        assert a["success_count"] == 3
        assert a["requires_js"] and a["has_antibot"]
        assert profiles["b.org"]["best_method"] == "simple"

        rec = {r["domain"]: r for r in
               recommend_methods(build_domain_memory(df)).collect()}
        assert rec["a.com"]["confidence"] == confidence(3)
        assert rec["a.com"]["method"] == "stealth"

        top = top_domains(build_domain_memory(df), n=1).collect()
        assert top[0]["domain"] == "a.com"
