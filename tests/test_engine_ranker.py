"""engine-ranker.ts port: fallback-chain parity pinned against Node's
actual output of the reference logic (1,478-case fixture — every
DOMAIN_RULES pattern with www./mobile./lookalike hosts × the full
option matrix, URL parse edges, plus a seeded fuzz corpus —
tests/golden/engine_ranker_node.json), plus the Spark batch operator.
"""

from __future__ import annotations

import json
import os

import pytest

from webpeel_spark.pure.engine_ranker import (
    DOMAIN_RULES,
    ENGINE_DEFAULTS,
    build_fallback_chain,
    get_available_engines,
    get_domain_overrides,
    get_engine_defaults,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "golden",
                       "engine_ranker_node.json")
with open(FIXTURE) as f:
    _FX = json.load(f)
NODE_CASES = _FX["cases"]

STRATEGY_FIXTURE = os.path.join(os.path.dirname(__file__), "golden",
                                "strategy_domains_node.json")
with open(STRATEGY_FIXTURE) as f:
    STRATEGY_CASES = json.load(f)["cases"]


def _normalize_config(cfg: dict) -> dict:
    """Node fixture config (camelCase maxTimeoutMs) → port shape."""
    out = dict(cfg)
    out["max_timeout_ms"] = out.pop("maxTimeoutMs")
    return out


def _opts_kwargs(opts: dict) -> dict:
    return {"render": opts.get("render"),
            "stealth": opts.get("stealth"),
            "no_domain_api": opts.get("noDomainApi")}


class TestNodeParity:
    def test_full_corpus(self):
        """Every recorded case: engine order AND full per-engine config
        (quality/speed/cost/timeout/features) must match Node."""
        mismatches = []
        for i, case in enumerate(NODE_CASES):
            got = build_fallback_chain(case["url"], **_opts_kwargs(case["opts"]))
            want = [{"engine": e["engine"],
                     "config": _normalize_config(e["config"])}
                    for e in case["chain"]]
            if got != want:
                mismatches.append((i, case["url"], case["opts"],
                                   [e["engine"] for e in got],
                                   [e["engine"] for e in want]))
        assert not mismatches, mismatches[:5]

    def test_strategy_domain_corpus(self):
        """strategies.ts decision tables: shouldForceBrowser +
        requiresResidentialProxy vs 694 recorded Node outputs."""
        from webpeel_spark.pure.engine_ranker import (
            requires_residential_proxy, should_force_browser,
        )

        mismatches = []
        for case in STRATEGY_CASES:
            want_force = case["force"]["mode"] if case["force"] else None
            got_force = should_force_browser(case["url"])
            got_res = requires_residential_proxy(case["url"])
            if (got_force, got_res) != (want_force, case["residential"]):
                mismatches.append((case["url"], got_force, want_force,
                                   got_res, case["residential"]))
        assert not mismatches, mismatches[:5]
        assert len(STRATEGY_CASES) > 500

    def test_spa_detection_corpus(self):
        """URL-keyed SPA auto-render table (pipeline.ts:361-401 /
        ee/spa-detection.ts) vs recorded Node outputs: exact-hostname
        set + raw-url pattern half, parse-failure skip, IDN/IPv6/
        trailing-dot/authority-less edges."""
        from webpeel_spark.pure.engine_ranker import (
            SPA_DOMAINS, is_spa_url,
        )

        fixture = os.path.join(os.path.dirname(__file__), "golden",
                               "spa_detection_node.json")
        with open(fixture) as f:
            cases = json.load(f)["cases"]
        mismatches = [(c["url"], is_spa_url(c["url"]), c["spa"])
                      for c in cases if is_spa_url(c["url"]) != c["spa"]]
        assert not mismatches, mismatches[:5]
        assert len(cases) > 100
        # every set entry is exercised as a hit in the corpus
        urls = " ".join(c["url"] for c in cases)
        for d in SPA_DOMAINS:
            assert f"//{d}/" in urls

    def test_corpus_shape(self):
        # the fixture really exercises the surface: every rule pattern
        # appears as an exact host and with a subdomain prefix
        urls = " ".join(c["url"] for c in NODE_CASES)
        for pattern, _ in DOMAIN_RULES:
            assert f"//{pattern}/" in urls or f"//{pattern}:" in urls
            assert f"www.{pattern}" in urls
        assert len(NODE_CASES) > 1000


class TestSemantics:
    def test_suffix_not_substring(self):
        assert get_domain_overrides("nottwitter.com") == {}
        assert get_domain_overrides("twitter.com.evil.example") == {}
        assert get_domain_overrides("mobile.twitter.com") != {}

    def test_case_insensitive_host(self):
        assert (get_domain_overrides("WWW.Twitter.COM")
                == get_domain_overrides("www.twitter.com"))

    def test_last_match_wins_merge(self):
        # no shipped rule pair overlaps, so pin the merge semantics
        # directly: a synthetic host matching two rules merges
        # field-by-field with the later rule winning
        DOMAIN_RULES.append(("twitter.com",
                             {"simple": {"speed": 11}, "browser": {"cost": 7}}))
        try:
            m = get_domain_overrides("www.twitter.com")
        finally:
            DOMAIN_RULES.pop()
        assert m["simple"] == {"quality": 20, "speed": 11}
        assert m["browser"] == {"quality": 80, "cost": 7}

    def test_render_none_vs_false(self):
        # undefined render keeps browser engines; explicit False drops
        # every javascript engine unless stealth is requested
        full = [e["engine"] for e in build_fallback_chain("https://example.com/")]
        assert full == ["domain-api", "browser", "stealth", "cloaked",
                        "simple", "search-fallback"]
        no_render = [e["engine"] for e in
                     build_fallback_chain("https://example.com/", render=False)]
        assert no_render == ["domain-api", "simple", "search-fallback"]
        stealthy = [e["engine"] for e in
                    build_fallback_chain("https://example.com/", render=False,
                                         stealth=True)]
        assert stealthy == ["domain-api", "stealth", "cloaked", "simple",
                            "search-fallback"]

    def test_no_domain_api(self):
        chain = build_fallback_chain("https://example.com/",
                                     no_domain_api=True)
        assert "domain-api" not in [e["engine"] for e in chain]

    def test_invalid_url_defaults(self):
        assert ([e["engine"] for e in build_fallback_chain("not a url")]
                == [e["engine"] for e in build_fallback_chain("https://example.com/")])

    def test_overrides_do_not_mutate_defaults(self):
        before = get_engine_defaults("simple")
        build_fallback_chain("https://twitter.com/u")
        assert get_engine_defaults("simple") == before
        # returned copies are detached too
        c = build_fallback_chain("https://example.com/")[0]
        c["config"]["features"]["javascript"] = True
        assert ENGINE_DEFAULTS["domain-api"]["features"]["javascript"] is False

    def test_available_engines(self):
        assert get_available_engines() == [
            "domain-api", "simple", "browser", "stealth", "cloaked",
            "search-fallback"]


@pytest.fixture(scope="module")
def spark():
    from webpeel_spark.session import get_spark

    s = get_spark("engine-ranker-tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


class TestSparkOperator:
    def test_recommend_engines(self, spark):
        from webpeel_spark.operators.engine_ranker import recommend_engines

        urls = ["https://twitter.com/a", "https://en.wikipedia.org/wiki/X",
                "https://example.com/", "https://www.zillow.com/h",
                "not a url", "https://news.ycombinator.com/item?id=1"]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        out = {r["url"]: r for r in
               recommend_engines(df, render=False).collect()}
        assert len(out) == len(urls)
        for u in urls:
            chain = build_fallback_chain(u, render=False)
            assert out[u]["chain"] == [e["engine"] for e in chain]
            assert out[u]["engine"] == chain[0]["engine"]
            assert out[u]["quality"] == chain[0]["config"]["quality"]
            assert out[u]["max_timeout_ms"] == chain[0]["config"]["max_timeout_ms"]
        # wikipedia boosts simple past the filtered browser tier
        assert out["https://en.wikipedia.org/wiki/X"]["engine"] == "domain-api"
        assert out["https://en.wikipedia.org/wiki/X"]["chain"][1] == "simple"
        # strategies.ts columns
        assert out["https://twitter.com/a"]["forced_mode"] == "browser"
        assert out["https://www.zillow.com/h"]["forced_mode"] == "stealth"
        assert out["https://www.zillow.com/h"]["residential_proxy"] is True
        assert out["https://example.com/"]["forced_mode"] is None
        assert out["https://example.com/"]["residential_proxy"] is False

    def test_spa_likely_column(self, spark):
        """spa_likely mirrors is_spa_url per row — including the two
        memo-hostile shapes: pattern hits are path-dependent (same host,
        different answers), and a pattern substring on an authority-less
        scheme still counts when the URL parses."""
        from webpeel_spark.operators.engine_ranker import recommend_engines
        from webpeel_spark.pure.engine_ranker import is_spa_url

        urls = ["https://www.airbnb.com/rooms/1",   # domain half
                "https://airbnb.com/rooms/1",        # exact-match miss
                "https://google.com/travel",         # pattern half
                "https://google.com/flights",        # same host, no pattern
                "data:text/html,see google.com/maps",  # authority-less parse
                "google.com/travel",                 # unparseable → False
                "https://example.com/"]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        out = {r["url"]: r["spa_likely"]
               for r in recommend_engines(df).collect()}
        assert out == {u: is_spa_url(u) for u in urls}
        assert out["https://www.airbnb.com/rooms/1"] is True
        assert out["https://airbnb.com/rooms/1"] is False
        assert out["https://google.com/travel"] is True
        assert out["https://google.com/flights"] is False
        assert out["data:text/html,see google.com/maps"] is True
        assert out["google.com/travel"] is False

    def test_hashbang_beats_host_memo(self, spark):
        """The raw-string '#!' check must not be absorbed into the
        per-host memo: two URLs on the same unlisted host, one with a
        hashbang, disagree on forced_mode."""
        from webpeel_spark.operators.engine_ranker import recommend_engines

        df = spark.createDataFrame(
            [("https://plain.example/app#!/route",),
             ("https://plain.example/other",)], "url string")
        out = {r["url"]: r["forced_mode"]
               for r in recommend_engines(df).collect()}
        assert out["https://plain.example/app#!/route"] == "browser"
        assert out["https://plain.example/other"] is None

    def test_narrow_plan(self, spark):
        """The recommendation must not introduce a shuffle."""
        from webpeel_spark.operators.engine_ranker import recommend_engines

        df = spark.createDataFrame([("https://a.com/x",)], "url string")
        plan = recommend_engines(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
