"""smart-router.ts port — the reference suite
(src/tests/smart-router.test.ts, 65 cases) ported case-for-case, plus
the Spark intent-routing operator."""

from __future__ import annotations

import pytest

from webpeel_spark.pure.smart_router import (
    detect_intent,
    extract_all_urls,
    extract_url,
    parse_intent,
)


class TestDetectIntentBasic:
    # smart-router.test.ts:12-107
    @pytest.mark.parametrize("task,intent", [
        ("read https://stripe.com", "read"),
        ("fetch the content of openai.com", "read"),
        ("summarize this article", "read"),
        ("what does stripe.com say about pricing", "read"),
        ("screenshot bbc.com", "see"),
        ("visual inspection of the landing page", "see"),
        ("show me the design of stripe.com", "see"),
        ("find best AI frameworks", "find"),
        ("search for React alternatives", "find"),
        ("google machine learning tutorials", "find"),
        ("map all pages on stripe.com", "find"),
        ("look up best JS libraries", "find"),
        ("extract prices from stripe.com/pricing", "extract"),
        ("scrape product listings from amazon.com", "extract"),
        ("get brand colors from notion.so", "extract"),
        ("find logo on figma.com", "extract"),
        ("watch stripe.com/pricing for changes", "monitor"),
        ("monitor hacker news for updates", "monitor"),
        ("track changes on news.ycombinator.com", "monitor"),
        ("click the sign up button", "act"),
        ("fill the login form on github.com", "act"),
        ("sign up for the newsletter", "act"),
        ("https://stripe.com", "read"),
        ("stripe.com", "read"),
    ])
    def test_intent(self, task, intent):
        assert detect_intent(task) == intent


class TestDetectIntentPriority:
    # smart-router.test.ts:111-132
    @pytest.mark.parametrize("task,intent", [
        ("click and track the button", "act"),
        ("track price changes on amazon.com", "monitor"),
        ("show me the logo and colors", "extract"),
        ("screenshot the search results page", "see"),
        ("look up the best CSS frameworks", "find"),
    ])
    def test_priority(self, task, intent):
        assert detect_intent(task) == intent


class TestUrlExtraction:
    # smart-router.test.ts:136-166
    def test_http_url(self):
        assert parse_intent("read https://stripe.com")["url"] == \
            "https://stripe.com"

    def test_https_with_path(self):
        assert parse_intent(
            "extract prices from https://stripe.com/pricing"
        )["url"] == "https://stripe.com/pricing"

    def test_bare_domain_normalized(self):
        assert parse_intent("screenshot bbc.com")["url"] == "https://bbc.com"

    def test_domain_with_path(self):
        assert parse_intent("watch stripe.com/pricing for changes")["url"] \
            == "https://stripe.com/pricing"

    def test_no_url(self):
        assert parse_intent("find best AI frameworks")["url"] is None

    def test_trailing_punctuation_stripped(self):
        assert parse_intent("please read https://stripe.com.")["url"] == \
            "https://stripe.com"


class TestParams:
    # smart-router.test.ts:170-210
    def test_mobile_viewport(self):
        assert parse_intent("screenshot bbc.com on mobile")["params"][
            "viewport"] == {"width": 390, "height": 844}

    def test_tablet_viewport(self):
        assert parse_intent("screenshot bbc.com on tablet")["params"][
            "viewport"] == {"width": 768, "height": 1024}

    def test_full_page(self):
        assert parse_intent("screenshot stripe.com full page")["params"][
            "fullPage"] is True

    def test_full_page_hyphen(self):
        assert parse_intent("take a full-page screenshot")["params"][
            "fullPage"] is True

    def test_as_json(self):
        assert parse_intent("extract data from stripe.com as json")[
            "params"]["format"] == "json"

    def test_structured_json(self):
        assert parse_intent("get structured data from amazon.com")[
            "params"]["format"] == "json"

    def test_summary(self):
        assert parse_intent("summary of openai.com homepage")["params"][
            "summary"] is True

    def test_summarize(self):
        assert parse_intent("summarize https://openai.com")["params"][
            "summary"] is True


class TestSeeModes:
    # smart-router.test.ts:214-234
    def test_design_mode(self):
        assert parse_intent("show me the design of stripe.com")["params"][
            "mode"] == "design"

    def test_compare_mode(self):
        assert parse_intent("compare stripe.com and paddle.com")["params"][
            "mode"] == "compare"

    def test_compare_url(self):
        assert parse_intent("compare stripe.com and paddle.com")["params"][
            "compare_url"] == "https://paddle.com"

    def test_plain_screenshot_no_mode(self):
        assert "mode" not in parse_intent("screenshot stripe.com")["params"]


class TestFindQuery:
    # smart-router.test.ts:238-257
    def test_query_no_url(self):
        r = parse_intent("find best AI frameworks")
        assert r["intent"] == "find"
        assert r["query"] and "AI frameworks" in r["query"]

    def test_query_verb_removed(self):
        r = parse_intent("search for React alternatives")
        assert r["intent"] == "find"
        assert "React alternatives" in r["query"]

    def test_url_only_find(self):
        r = parse_intent("map stripe.com sitemap")
        assert r["intent"] == "find"
        assert r["url"] == "https://stripe.com"


class TestExtractUrlStandalone:
    # smart-router.test.ts:261-298
    def test_https(self):
        assert extract_url("https://example.com/path") == \
            "https://example.com/path"

    def test_http_embedded(self):
        assert extract_url("check http://example.com today") == \
            "http://example.com"

    def test_domain_no_scheme(self):
        assert extract_url("go to stripe.com/pricing") == \
            "https://stripe.com/pricing"

    def test_none(self):
        assert extract_url("hello world") is None

    def test_all_multiple_https(self):
        r = extract_all_urls("compare https://stripe.com and "
                             "https://paddle.com")
        assert r == ["https://stripe.com", "https://paddle.com"]

    def test_all_bare_domains(self):
        assert len(extract_all_urls("compare stripe.com and paddle.com")) \
            >= 2

    def test_all_empty(self):
        assert extract_all_urls("find best JavaScript libraries") == []


class TestEndToEnd:
    # smart-router.test.ts:302-355
    def test_bare_url(self):
        r = parse_intent("https://stripe.com")
        assert (r["intent"], r["url"]) == ("read", "https://stripe.com")

    def test_youtube_url_read(self):
        r = parse_intent("https://youtube.com/watch?v=abc123")
        assert (r["intent"], r["url"]) == (
            "read", "https://youtube.com/watch?v=abc123")

    def test_screenshot_mobile_fullpage(self):
        r = parse_intent("screenshot bbc.com on mobile full page")
        assert r["intent"] == "see"
        assert r["url"] == "https://bbc.com"
        assert r["params"]["viewport"] == {"width": 390, "height": 844}
        assert r["params"]["fullPage"] is True

    def test_extract_prices_json(self):
        r = parse_intent("extract prices from stripe.com/pricing as json")
        assert r["intent"] == "extract"
        assert r["url"] == "https://stripe.com/pricing"
        assert r["params"]["format"] == "json"

    def test_monitor_watch(self):
        r = parse_intent("watch stripe.com/pricing for changes")
        assert (r["intent"], r["url"]) == (
            "monitor", "https://stripe.com/pricing")

    def test_act_click(self):
        r = parse_intent("click the sign up button on github.com")
        assert (r["intent"], r["url"]) == ("act", "https://github.com")

    def test_research_query(self):
        r = parse_intent("research best AI agent frameworks 2024")
        assert r["intent"] == "find"
        assert r["query"] and "AI agent frameworks 2024" in r["query"]

    def test_summarize_with_url(self):
        r = parse_intent("summarize https://openai.com/blog")
        assert (r["intent"], r["url"]) == ("read", "https://openai.com/blog")
        assert r["params"]["summary"] is True


class TestSparkOperator:
    @pytest.fixture(scope="class")
    def spark(self):
        pytest.importorskip("pyspark")
        from webpeel_spark.session import get_spark

        s = get_spark(cores=4)
        s.sparkContext.setLogLevel("ERROR")
        return s

    def test_route_intents(self, spark):
        from webpeel_spark.operators.intent import route_intents

        tasks = [
            "read https://stripe.com",
            "screenshot bbc.com on mobile",
            "find best AI frameworks",
            "watch stripe.com/pricing for changes",
            "click the sign up button on github.com",
            "extract prices from stripe.com/pricing as json",
        ]
        df = spark.createDataFrame([(t,) for t in tasks], "task string")
        got = {r["task"]: r for r in route_intents(df).collect()}
        for t in tasks:
            pure = parse_intent(t)
            assert got[t]["intent"] == pure["intent"], t
            assert got[t]["url"] == pure["url"], t
            assert got[t]["query"] == pure["query"], t
        assert got[tasks[1]]["viewport_width"] == 390
        assert got[tasks[5]]["format"] == "json"
