"""Hypothesis property invariants over the round-4 pure cores
(jobs.py, urlmap.py) plus the jobs detail-join Spark operator."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webpeel_spark.pure.jobs import (
    clean,
    find_date,
    find_salary,
    parse_job_search,
    split_sections,
    strip_detail_noise,
)
from webpeel_spark.pure.urlmap import (
    calculate_relevance,
    map_filter_sort,
    should_include,
)


class TestJobsProperties:
    @given(st.text(max_size=300))
    @settings(max_examples=60, deadline=None)
    def test_clean_idempotent_and_collapsed(self, s):
        once = clean(s)
        assert clean(once) == once
        assert "  " not in once
        assert once == once.strip()

    @given(st.text(max_size=300))
    @settings(max_examples=60, deadline=None)
    def test_find_salary_returns_substringish(self, s):
        m = find_salary(s)
        if m is not None:
            assert m.startswith("$")
            assert m == m.strip()

    @given(st.text(max_size=200))
    @settings(max_examples=60, deadline=None)
    def test_find_date_never_raises(self, s):
        d = find_date(s)
        assert d is None or d[0].isdigit()

    @given(st.text(max_size=500))
    @settings(max_examples=40, deadline=None)
    def test_split_sections_always_has_description(self, content):
        s = split_sections(content)
        assert "description" in s
        assert isinstance(s["description"], str)

    @given(st.text(max_size=400))
    @settings(max_examples=40, deadline=None)
    def test_strip_noise_prefix_invariant(self, content):
        out = strip_detail_noise(content)
        # output is always a prefix of the (stripped) input
        assert content.startswith(out) or content.strip().startswith(out)

    @given(st.text(max_size=300), st.integers(min_value=0, max_value=5))
    @settings(max_examples=40, deadline=None)
    def test_parse_job_search_respects_limit(self, content, limit):
        for url in ("https://www.linkedin.com/jobs/search/",
                    "https://www.upwork.com/nx/search/jobs/",
                    "https://example.com/x"):
            r = parse_job_search(content, url, limit)
            assert len(r["jobs"]) <= limit
            assert r["totalFound"] >= 0


class TestUrlmapProperties:
    @given(st.text(alphabet=st.characters(min_codepoint=33,
                                          max_codepoint=126),
                   min_size=1, max_size=80))
    @settings(max_examples=60, deadline=None)
    def test_no_filters_always_includes(self, url):
        assert should_include(url)

    @given(st.lists(st.text(alphabet="abcdefg/.:", min_size=1,
                            max_size=30), max_size=20))
    @settings(max_examples=40, deadline=None)
    def test_map_filter_sort_dedupes_and_sorts(self, urls):
        rows = [(u, None, None) for u in urls]
        r = map_filter_sort(rows)
        assert r["urls"] == sorted(set(r["urls"]))
        assert r["total"] == len(r["urls"])
        assert set(r["urls"]) <= set(urls)

    @given(st.text(max_size=60), st.text(max_size=60),
           st.text(max_size=60))
    @settings(max_examples=60, deadline=None)
    def test_relevance_monotone_in_fields(self, url, title, desc):
        terms = ["alpha"]
        base = calculate_relevance(terms, url, title, desc)
        boosted = calculate_relevance(terms, url + "alpha", title, desc)
        assert boosted >= base


class TestJobDetailsOperator:
    def test_parse_job_details_join(self):
        pytest.importorskip("pyspark")
        from webpeel_spark.operators.jobs import parse_job_details
        from webpeel_spark.session import get_spark

        spark = get_spark(cores=2)
        cards = spark.createDataFrame(
            [("https://x/j1", "Engineer", None),
             ("https://x/j2", "Analyst", "$90K")],
            "detail_url string, title string, salary string")
        detail_md = ("## About the role\nBuild things.\n"
                     "## Requirements\n- Spark experience\n"
                     "Full time role. [Apply](https://x/apply)\n")
        pages = spark.createDataFrame(
            [("https://x/j1", detail_md)], "url string, content string")
        rows = parse_job_details(cards, pages, num_partitions=2).collect()
        # inner join: only j1 has a fetched detail page
        assert len(rows) == 1
        r = rows[0]
        assert r.detail_url == "https://x/j1"
        assert "Build things." in r.description
        assert r.requirements is not None
        assert "Spark experience" in r.requirements
        assert r.employment_type == "full-time"
        assert r.apply_url == "https://x/apply"
