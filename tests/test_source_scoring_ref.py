"""Reference-suite parity: source-scoring.test.ts (all 10 describe
blocks, case-for-case).  Offline by construction, like the reference.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from webpeel_spark.pure.source_scoring import (
    authority_label,
    compute_final_score,
    deduplicate_by_domain,
    extract_entity_candidates,
    extract_hostname,
    extract_page_date,
    extract_registered_domain,
    freshness_label,
    is_factual_query,
    is_primary_source,
    rank_search_results,
    score_domain_authority,
    score_fetched_sources,
    score_freshness,
    score_primary_source,
    score_source,
)


def make_result(url, title="Title", snippet="Snippet"):
    return {"url": url, "title": title, "snippet": snippet}


def days_ago(n: int) -> str:
    d = datetime.now(timezone.utc) - timedelta(days=n)
    return d.strftime("%Y-%m-%dT%H:%M:%S.") + f"{d.microsecond // 1000:03d}Z"


# ── URL helpers ─────────────────────────────────────────────────────────

class TestExtractHostname:
    def test_https(self):
        assert extract_hostname("https://docs.cerebras.ai/reference/api") == "docs.cerebras.ai"

    def test_http(self):
        assert extract_hostname("http://github.com/user/repo") == "github.com"

    def test_lowercases(self):
        assert extract_hostname("https://GITHUB.COM/repo") == "github.com"

    def test_invalid(self):
        assert extract_hostname("not-a-url") == ""


class TestExtractRegisteredDomain:
    def test_subdomain(self):
        assert extract_registered_domain("https://docs.cerebras.ai/api") == "cerebras.ai"

    def test_github(self):
        assert extract_registered_domain("https://github.com/user/repo") == "github.com"

    def test_multi_part_tld(self):
        assert extract_registered_domain("https://bbc.co.uk/news") == "bbc.co.uk"

    def test_invalid(self):
        assert extract_registered_domain("not-a-url") == ""


# ── 1. primary source detection ─────────────────────────────────────────

class TestExtractEntityCandidates:
    def test_cerebras_query(self):
        assert "cerebras" in extract_entity_candidates(
            "what are cerebras free tier limits")

    def test_filters_stopwords(self):
        entities = extract_entity_candidates("what is the openai api pricing")
        assert "what" not in entities
        assert "the" not in entities
        assert "is" not in entities

    def test_multiple_entities(self):
        entities = extract_entity_candidates("anthropic claude model pricing")
        assert "anthropic" in entities
        assert "claude" in entities
        assert "model" in entities

    def test_filters_short_tokens(self):
        entities = extract_entity_candidates("is ai safe")
        assert "ai" not in entities
        assert "is" not in entities

    def test_empty_query(self):
        assert extract_entity_candidates("") == []

    def test_lowercases(self):
        assert "openai" in extract_entity_candidates("OpenAI GPT-4 pricing")


class TestScorePrimarySource:
    def test_entity_domain_boost(self):
        assert score_primary_source(
            "https://cerebras.ai/pricing",
            "what are cerebras free tier limits") > 0.3

    def test_entity_plus_docs_path(self):
        assert score_primary_source(
            "https://docs.cerebras.ai/reference/api",
            "cerebras api rate limits") >= 0.5

    def test_unrelated_domain_zero(self):
        assert score_primary_source(
            "https://reddit.com/r/programming", "cerebras api limits") == 0

    def test_pricing_path(self):
        assert score_primary_source("https://openai.com/pricing", "gpt4 cost") > 0

    def test_docs_path_plus_entity(self):
        assert score_primary_source(
            "https://openai.com/docs/api-reference", "openai api") >= 0.5

    def test_help_path(self):
        assert score_primary_source(
            "https://stripe.com/help/overview", "stripe payment help") > 0

    def test_cap_at_1(self):
        assert score_primary_source(
            "https://cerebras.ai/docs/api/pricing",
            "cerebras docs api pricing") <= 1.0

    def test_docs_path_only(self):
        assert score_primary_source(
            "https://example.com/docs/cerebras", "groq api limits") == 0.2


class TestIsPrimarySource:
    def test_entity_match(self):
        assert is_primary_source("https://openai.com/api", "openai gpt4")

    def test_unrelated(self):
        assert not is_primary_source("https://medium.com/article", "openai gpt4")

    def test_docs_path_without_entity(self):
        assert is_primary_source("https://example.com/docs/guide", "some query")


# ── 2. domain authority ─────────────────────────────────────────────────

class TestScoreDomainAuthority:
    def test_gov(self):
        assert score_domain_authority("https://cdc.gov/covid") == 1.0
        assert score_domain_authority("https://nasa.gov/missions") == 1.0

    def test_edu(self):
        assert score_domain_authority("https://mit.edu/course") == 0.95
        assert score_domain_authority("https://cs.stanford.edu/research") == 0.95

    def test_org_tld(self):
        assert score_domain_authority("https://mozilla.org/firefox") == 0.9
        assert score_domain_authority("https://python.org/downloads") == 0.9

    def test_github(self):
        assert score_domain_authority("https://github.com/user/repo") == 0.9

    def test_arxiv(self):
        assert score_domain_authority("https://arxiv.org/abs/2301.00001") == 0.9

    def test_stackoverflow(self):
        assert score_domain_authority("https://stackoverflow.com/questions/123") == 0.85

    def test_wikipedia(self):
        assert score_domain_authority("https://en.wikipedia.org/wiki/AI") == 0.85

    def test_docs_subdomain(self):
        assert score_domain_authority("https://docs.python.org/3/library") == 0.9
        assert score_domain_authority("https://docs.stripe.com/api") == 0.9

    def test_developer_subdomain(self):
        assert score_domain_authority("https://developer.mozilla.org/en-US/docs") == 0.9
        assert score_domain_authority("https://developer.apple.com/documentation") == 0.9

    def test_reuters(self):
        assert score_domain_authority("https://reuters.com/technology/story") == 0.8

    def test_techcrunch(self):
        assert score_domain_authority("https://techcrunch.com/2024/01/01/ai") == 0.75

    def test_unknown_default(self):
        assert score_domain_authority("https://randomblog.io/post") == 0.5
        assert score_domain_authority("https://medium.com/article") == 0.5

    def test_empty_url(self):
        assert score_domain_authority("") == 0.5


class TestAuthorityLabel:
    def test_official(self):
        assert authority_label(0.9) == "official"
        assert authority_label(1.0) == "official"

    def test_institutional(self):
        assert authority_label(0.8) == "institutional"
        assert authority_label(0.85) == "institutional"

    def test_major(self):
        assert authority_label(0.7) == "major"
        assert authority_label(0.75) == "major"

    def test_general(self):
        assert authority_label(0.5) == "general"
        assert authority_label(0.6) == "general"


# ── 3. freshness ────────────────────────────────────────────────────────

class TestExtractPageDate:
    def test_publish_date(self):
        d = extract_page_date({"publishDate": "2024-01-15T00:00:00Z"})
        assert d is not None and d.year == 2024

    def test_published(self):
        d = extract_page_date({"published": "2023-06-01"})
        assert d is not None and d.year == 2023

    def test_last_modified_freshness(self):
        d = extract_page_date(None, {"lastModified": "2024-06-15T12:00:00Z"})
        assert d is not None and d.year == 2024

    def test_no_date(self):
        assert extract_page_date({}) is None
        assert extract_page_date(None, {}) is None
        assert extract_page_date() is None

    def test_invalid_date(self):
        assert extract_page_date({"publishDate": "not-a-date"}) is None

    def test_article_published_time(self):
        assert extract_page_date(
            {"article:published_time": "2024-03-01T12:00:00Z"}) is not None


class TestScoreFreshness:
    def test_3_days(self):
        assert score_freshness({"publishDate": days_ago(3)}) == 1.0

    def test_15_days(self):
        assert score_freshness({"publishDate": days_ago(15)}) == 0.9

    def test_60_days(self):
        assert score_freshness({"publishDate": days_ago(60)}) == 0.8

    def test_200_days(self):
        assert score_freshness({"publishDate": days_ago(200)}) == 0.6

    def test_400_days(self):
        assert score_freshness({"publishDate": days_ago(400)}) == 0.4

    def test_neutral_unknown(self):
        assert score_freshness() == 0.5
        assert score_freshness({}) == 0.5
        assert score_freshness(None, {}) == 0.5

    def test_last_modified_fallback(self):
        assert score_freshness(None, {"lastModified": days_ago(5)}) == 1.0


class TestFreshnessLabel:
    def test_recent(self):
        assert freshness_label({"publishDate": days_ago(3)}) == "recent"
        assert freshness_label({"publishDate": days_ago(25)}) == "recent"

    def test_this_month(self):
        assert freshness_label({"publishDate": days_ago(60)}) == "this-month"

    def test_this_year(self):
        assert freshness_label({"publishDate": days_ago(300)}) == "this-year"

    def test_unknown_is_this_year(self):
        assert freshness_label() == "this-year"

    def test_older(self):
        assert freshness_label({"publishDate": days_ago(500)}) == "older"


# ── 4. factual query detection ──────────────────────────────────────────

class TestIsFactualQuery:
    def test_pricing(self):
        assert is_factual_query("what are cerebras free tier limits")
        assert is_factual_query("openai api pricing 2024")
        assert is_factual_query("how much does gpt4 cost")

    def test_rate_limit(self):
        assert is_factual_query("groq rate limits")
        assert is_factual_query("anthropic api limits")

    def test_plan_subscription(self):
        assert is_factual_query("stripe subscription plans")
        assert is_factual_query("github pro plan fee")

    def test_general_false(self):
        assert not is_factual_query("who invented python")
        assert not is_factual_query("how does machine learning work")
        assert not is_factual_query("history of the internet")


# ── 5. combined scoring ─────────────────────────────────────────────────

class TestComputeFinalScore:
    def test_standard_weights(self):
        score = compute_final_score(0.8, 0.9, 0.9, 0.5, False)
        expected = 0.8 * 0.4 + 0.9 * 0.25 + 0.9 * 0.2 + 0.5 * 0.15
        assert abs(score - expected) < 1e-5

    def test_factual_weights(self):
        score = compute_final_score(0.8, 0.9, 1.0, 0.5, True)
        expected = 0.8 * 0.35 + 0.9 * 0.15 + 1.0 * 0.35 + 0.5 * 0.15
        assert abs(score - expected) < 1e-5

    def test_fresh_primary_beats_stale_authority_factual(self):
        fresh_primary = compute_final_score(0.7, 0.5, 1.0, 1.0, True)
        stale_authority = compute_final_score(0.7, 0.95, 0.4, 0.0, True)
        assert fresh_primary > stale_authority

    def test_bm25_highest_marginal_impact(self):
        base = compute_final_score(0.5, 0.5, 0.5, 0.5, False)
        bm25_gain = compute_final_score(1.0, 0.5, 0.5, 0.5, False) - base
        authority_gain = compute_final_score(0.5, 1.0, 0.5, 0.5, False) - base
        freshness_gain = compute_final_score(0.5, 0.5, 1.0, 0.5, False) - base
        primary_gain = compute_final_score(0.5, 0.5, 0.5, 1.0, False) - base
        assert bm25_gain > authority_gain
        assert bm25_gain > freshness_gain
        assert bm25_gain > primary_gain

    def test_weights_sum_standard(self):
        assert abs(0.40 + 0.25 + 0.20 + 0.15 - 1.0) < 1e-10

    def test_weights_sum_factual(self):
        assert abs(0.35 + 0.15 + 0.35 + 0.15 - 1.0) < 1e-10


# ── 6. domain dedup ─────────────────────────────────────────────────────

class TestDeduplicateByDomain:
    def test_max_2_default(self):
        sources = [
            {"url": "https://example.com/a", "finalScore": 0.9},
            {"url": "https://example.com/b", "finalScore": 0.8},
            {"url": "https://example.com/c", "finalScore": 0.7},
            {"url": "https://other.com/x", "finalScore": 0.6},
        ]
        result = deduplicate_by_domain(sources)
        assert len(result) == 3
        assert len([r for r in result if "example.com" in r["url"]]) == 2

    def test_keeps_highest(self):
        sources = [
            {"url": "https://example.com/low", "finalScore": 0.3},
            {"url": "https://example.com/high", "finalScore": 0.9},
            {"url": "https://example.com/mid", "finalScore": 0.6},
        ]
        result = deduplicate_by_domain(sources, 1)
        assert len(result) == 1
        assert result[0]["url"] == "https://example.com/high"

    def test_max_per_domain_1(self):
        sources = [
            {"url": "https://github.com/repo1", "finalScore": 0.8},
            {"url": "https://github.com/repo2", "finalScore": 0.7},
            {"url": "https://stackoverflow.com/q/1", "finalScore": 0.6},
        ]
        assert len(deduplicate_by_domain(sources, 1)) == 2

    def test_subdomains_same_registered_domain(self):
        sources = [
            {"url": "https://docs.example.com/api", "finalScore": 0.9},
            {"url": "https://support.example.com/faq", "finalScore": 0.8},
            {"url": "https://example.com/home", "finalScore": 0.7},
        ]
        assert len(deduplicate_by_domain(sources, 2)) == 2

    def test_no_repeats_all_kept(self):
        sources = [
            {"url": "https://alpha.com/", "finalScore": 0.9},
            {"url": "https://beta.com/", "finalScore": 0.8},
            {"url": "https://gamma.com/", "finalScore": 0.7},
        ]
        assert len(deduplicate_by_domain(sources)) == 3

    def test_empty(self):
        assert deduplicate_by_domain([]) == []


# ── 7. scoreSource ──────────────────────────────────────────────────────

class TestScoreSource:
    def test_all_fields(self):
        result = score_source(
            make_result("https://cerebras.ai/pricing"),
            "cerebras free tier limits", bm25_score=0.7,
            metadata={"publishDate": days_ago(5)})
        assert result["url"] == "https://cerebras.ai/pricing"
        assert result["confidence"] == 0.7
        assert result["isPrimarySource"] is True
        assert isinstance(result["authority"], str)
        assert isinstance(result["freshness"], str)
        assert isinstance(result["finalScore"], float)

    def test_official_fresh_high_bm25(self):
        result = score_source(
            make_result("https://docs.stripe.com/api/pricing"),
            "stripe api pricing", bm25_score=0.85,
            metadata={"publishDate": days_ago(3)})
        assert result["finalScore"] > 0.75
        assert result["isPrimarySource"] is True
        assert result["authority"] == "official"
        assert result["freshness"] == "recent"

    def test_unknown_domain_neutral(self):
        result = score_source(
            make_result("https://techblog.io/post/1"),
            "how does machine learning work", bm25_score=0.5)
        assert result["authority"] == "general"
        assert result["freshness"] == "this-year"
        assert result["isPrimarySource"] is False


# ── 8. rankSearchResults ────────────────────────────────────────────────

class TestRankSearchResults:
    def test_prioritizes_authority(self):
        results = [
            make_result("https://randomblog.io/post"),
            make_result("https://github.com/openai/openai-python"),
            make_result("https://medium.com/article"),
        ]
        ranked = rank_search_results(results, "openai python sdk")
        assert ranked[0]["url"] == "https://github.com/openai/openai-python"

    def test_dedupes_by_domain(self):
        results = [
            make_result("https://example.com/a"),
            make_result("https://example.com/b"),
            make_result("https://example.com/c"),
            make_result("https://github.com/x"),
        ]
        ranked = rank_search_results(results, "query")
        assert len([r for r in ranked if "example.com" in r["url"]]) <= 2

    def test_empty(self):
        assert rank_search_results([], "query") == []

    def test_preserves_fields(self):
        results = [make_result("https://docs.python.org/tutorial",
                               "Python Docs", "Official docs")]
        ranked = rank_search_results(results, "python tutorial")
        assert ranked[0]["title"] == "Python Docs"
        assert ranked[0]["snippet"] == "Official docs"


# ── 9. scoreFetchedSources ──────────────────────────────────────────────

class TestScoreFetchedSources:
    def test_sorted_by_final_score(self):
        sources = [
            {"searchResult": make_result("https://randomblog.io/"), "bm25Score": 0.3},
            {"searchResult": make_result("https://docs.openai.com/pricing"),
             "bm25Score": 0.7, "metadata": {"publishDate": days_ago(10)}},
        ]
        scored = score_fetched_sources(sources, "openai pricing")
        assert scored[0]["finalScore"] >= scored[1]["finalScore"]

    def test_respects_max_per_domain(self):
        sources = [
            {"searchResult": make_result("https://example.com/a"), "bm25Score": 0.8},
            {"searchResult": make_result("https://example.com/b"), "bm25Score": 0.7},
            {"searchResult": make_result("https://example.com/c"), "bm25Score": 0.6},
        ]
        scored = score_fetched_sources(sources, "example query",
                                       max_per_domain=2)
        assert len([s for s in scored if "example.com" in s["url"]]) <= 2

    def test_public_fields(self):
        sources = [{"searchResult": make_result("https://github.com/repo"),
                    "bm25Score": 0.6}]
        result = score_fetched_sources(sources, "github repo")[0]
        for field, typ in (("url", str), ("title", str), ("snippet", str),
                           ("confidence", float), ("authority", str),
                           ("freshness", str), ("isPrimarySource", bool)):
            assert isinstance(result[field], typ)


# ── 10. edge cases ──────────────────────────────────────────────────────

class TestEdgeCases:
    def test_non_english_entity(self):
        entities = extract_entity_candidates("rakuten mobile pricing japan")
        assert "rakuten" in entities
        assert score_primary_source("https://rakuten.co.jp/mobile/pricing",
                                    "rakuten mobile pricing japan") > 0

    def test_unusual_ports(self):
        assert extract_hostname("http://localhost:3000/api") == "localhost"

    def test_query_params_in_path(self):
        assert score_primary_source("https://example.com/docs?lang=en",
                                    "some docs query") > 0

    def test_missing_metadata(self):
        score_freshness(None, None)
        freshness_label(None, None)
        extract_page_date(None, None)

    def test_url_no_path(self):
        score_domain_authority("https://example.com")
        assert score_domain_authority("https://github.com") == 0.9

    def test_docs_subdomain_unknown_company(self):
        assert score_domain_authority(
            "https://docs.unknown-startup.io/reference") == 0.9

    def test_pre_2000_rejected(self):
        assert extract_page_date({"publishDate": "1990-01-01"}) is None

    def test_future_date_no_crash(self):
        future = (datetime.now(timezone.utc)
                  + timedelta(days=365)).strftime("%Y-%m-%dT%H:%M:%SZ")
        score_freshness({"publishDate": future})
