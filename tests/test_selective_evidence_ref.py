"""selective-evidence.test.ts ported case-for-case (556-line reference
suite): query classification, structured-signal detection, evidence
selection (credibility / diversity / policy / edge cases), LLM
formatting."""

from __future__ import annotations

import re

from webpeel_spark.pure.selective_evidence import (
    classify_query,
    detect_structured_signal,
    format_evidence_for_llm,
    get_best_evidence_text,
    is_unusable_evidence_content,
    select_evidence,
    source_structured_score,
)
from webpeel_spark.pure.source_scoring import extract_hostname


def make_source(url, content, **opts):
    return {
        "url": url,
        "title": opts.get("title", f"Page from {extract_hostname(url)}"),
        "content": content,
        "snippet": opts.get("snippet", content[:80]),
        "structured": opts.get("structured"),
        "metadata": opts.get("metadata"),
    }


FACTUAL_CONTENT = """
## Pricing Plans

The free tier includes 1,000 API calls per month at no cost.
The Pro plan costs $49/month and includes 50,000 API calls.
The Enterprise plan costs $299/month with unlimited calls.

Rate limits: 100 requests/second on Pro, 500 req/s on Enterprise.
"""

TUTORIAL_CONTENT = """
## Getting Started with React

React is a JavaScript library for building user interfaces.
It was created by Facebook and released in 2013.

To install React, run: npm install react react-dom

Components are the building blocks of React applications.
Each component manages its own state and renders UI.
"""

COMPARISON_CONTENT = """
## React vs Vue Comparison

React uses JSX for templating while Vue uses HTML templates.
React has a larger ecosystem and more community packages.
Vue offers better documentation and a gentler learning curve.

Performance benchmarks show similar results for both frameworks.
Bundle sizes: React 42KB, Vue 33KB (minified + gzipped).
"""

TABLE_CONTENT = """
| Feature | React | Vue | Angular |
|---------|-------|-----|---------|
| Size | 42KB | 33KB | 143KB |
| Stars | 210K | 205K | 89K |
| License | MIT | MIT | MIT |
"""


class TestClassifyQuery:
    def test_pricing_factual(self):
        policy = classify_query("what is the price of OpenAI API")
        assert policy.type == "factual"
        assert policy.max_blocks_per_domain == 4

    def test_version_factual(self):
        assert classify_query("latest version of Node.js").type == "factual"

    def test_limit_rate_factual(self):
        assert classify_query(
            "cerebras free tier rate limits").type == "factual"

    def test_comparison(self):
        policy = classify_query("React vs Vue comparison")
        assert policy.type == "comparison"
        assert policy.min_domains == 3

    def test_pros_and_cons_comparison(self):
        assert classify_query(
            "pros and cons of kubernetes").type == "comparison"

    def test_alternatives_comparison(self):
        assert classify_query(
            "alternatives to MongoDB").type == "comparison"

    def test_how_to_exploratory(self):
        policy = classify_query("how does DNS resolution work")
        assert policy.type == "exploratory"
        assert policy.max_blocks_per_domain == 2
        assert policy.min_domains == 4

    def test_explain_exploratory(self):
        assert classify_query(
            "explain transformer architecture").type == "exploratory"

    def test_what_is_exploratory(self):
        assert classify_query("what is WebAssembly").type == "exploratory"

    def test_default_balanced(self):
        policy = classify_query("rust programming language")
        assert policy.type == "exploratory"
        assert policy.max_blocks_per_domain == 3

    def test_factual_higher_authority_weight(self):
        factual = classify_query("OpenAI API pricing")
        exploratory = classify_query("how does machine learning work")
        assert factual.authority_weight > exploratory.authority_weight

    def test_factual_higher_structured_weight(self):
        factual = classify_query("S3 storage costs per GB")
        comparison = classify_query("S3 vs GCS comparison")
        assert factual.structured_weight > comparison.structured_weight


class TestDetectStructuredSignal:
    def test_empty(self):
        assert detect_structured_signal("") == 0

    def test_prices(self):
        score = detect_structured_signal(
            "The plan costs $49.99 per month. Enterprise is $299/mo.")
        assert score > 0.1

    def test_tables(self):
        assert detect_structured_signal(TABLE_CONTENT) > 0.1

    def test_key_value(self):
        text = "Name: John Doe\nAge: 30\nLocation: New York\nRole: Engineer"
        assert detect_structured_signal(text) > 0.05

    def test_versions(self):
        assert detect_structured_signal(
            "Node.js v20.11.0 was released with performance improvements"
        ) > 0.05

    def test_numeric_density(self):
        text = ("Latency: 45ms p50, 120ms p99. Throughput: 500 MB per "
                "second. Uptime: 99.99%")
        assert detect_structured_signal(text) > 0.1

    def test_jsonld(self):
        assert detect_structured_signal(
            '<script type="application/ld+json">'
            '{"@context":"schema.org"}</script>') > 0.1

    def test_plain_prose_low(self):
        score = detect_structured_signal(
            "React is a JavaScript library for building user interfaces."
            " It was created by Facebook and is widely used in web "
            "development today.")
        assert score < 0.1


class TestSourceStructuredScore:
    def test_structured_data_boost(self):
        with_structured = source_structured_score(make_source(
            "https://example.com", FACTUAL_CONTENT,
            structured={"price": 49}))
        without = source_structured_score(
            make_source("https://example.com", FACTUAL_CONTENT))
        assert with_structured > without

    def test_content_derived_signal(self):
        assert source_structured_score(
            make_source("https://example.com", FACTUAL_CONTENT)) > 0


class TestCredibility:
    def test_high_authority_ranks_first(self):
        gov = make_source("https://data.gov/pricing",
                          "The federal rate is $150 per unit. "
                          "Updated quarterly.")
        blog = make_source("https://randomblog.xyz/post",
                           "I think the rate is about $150 per unit maybe.")
        result = select_evidence("federal rate per unit", [blog, gov],
                                 max_blocks=2)
        assert len(result.blocks) > 0
        assert result.blocks[0].source_url == "https://data.gov/pricing"

    def test_edu_preferred_for_academic(self):
        edu = make_source(
            "https://cs.stanford.edu/papers",
            "The transformer architecture uses multi-head self-attention "
            "mechanisms for parallel computation.")
        generic = make_source(
            "https://techblog.io/transformers",
            "Transformers use attention for parallel computation in "
            "neural networks.")
        result = select_evidence(
            "transformer architecture attention mechanism",
            [generic, edu], max_blocks=2)
        assert result.blocks[0].source_url == "https://cs.stanford.edu/papers"


class TestDomainDiversity:
    def test_per_domain_cap(self):
        long_content = "\n\n".join(
            f"## Section {i + 1}\n\nThis is detailed content about React "
            f"hooks including useState, useEffect, and useCallback for "
            f"section {i + 1}." for i in range(10))
        single = make_source("https://reactjs.org/docs", long_content)
        other = make_source(
            "https://developer.mozilla.org/react",
            "React hooks documentation and reference guide for modern "
            "web development.")
        result = select_evidence("React hooks guide", [single, other],
                                 max_blocks=8,
                                 policy_override={
                                     "max_blocks_per_domain": 3})
        react_blocks = [b for b in result.blocks
                        if "reactjs.org" in b.source_url]
        assert len(react_blocks) <= 3

    def test_promotes_underrepresented_domains(self):
        s1 = make_source(
            "https://example.com/a",
            "React is great for building component-based user interfaces "
            "with virtual DOM.\n\nReact hooks enable functional "
            "components to manage state effectively.")
        s2 = make_source(
            "https://example.com/b",
            "React components can be composed together for complex user "
            "interface patterns.\n\nThe React ecosystem includes Redux, "
            "React Router, and many other libraries.")
        s3 = make_source(
            "https://different-site.com/react",
            "An alternative perspective on React development and best "
            "practices for large applications.")
        result = select_evidence("how does React work", [s1, s2, s3],
                                 max_blocks=4,
                                 policy_override={"min_domains": 2})
        domains = {extract_hostname(b.source_url) for b in result.blocks}
        assert len(domains) >= 2


class TestStructuredSignalSelection:
    def test_prefers_structured_blocks(self):
        structured = make_source(
            "https://example.com/pricing", FACTUAL_CONTENT,
            structured={"plans": [{"name": "Pro", "price": 49}]})
        prose = make_source(
            "https://blog.example.com/review",
            "The service has various pricing tiers available for "
            "different use cases and team sizes. They offer competitive "
            "rates compared to alternatives in the market.")
        result = select_evidence("pricing plans and costs",
                                 [prose, structured], max_blocks=3)
        assert any(b.has_structured_signal for b in result.blocks)

    def test_content_derived_without_domaindata(self):
        table = make_source("https://docs.example.com/compare",
                            TABLE_CONTENT)
        result = select_evidence("framework comparison size", [table],
                                 max_blocks=3)
        assert any(b.has_structured_signal for b in result.blocks)


class TestPolicyByQueryType:
    def test_factual_policy_for_pricing(self):
        result = select_evidence(
            "AWS S3 storage pricing per GB",
            [make_source("https://aws.amazon.com/s3/pricing",
                         FACTUAL_CONTENT)], max_blocks=3)
        assert result.policy.type == "factual"

    def test_comparison_policy_for_vs(self):
        result = select_evidence(
            "React vs Angular performance benchmark",
            [make_source("https://example.com", COMPARISON_CONTENT)],
            max_blocks=3)
        assert result.policy.type == "comparison"

    def test_exploratory_policy_for_howto(self):
        result = select_evidence(
            "how to deploy a Node.js app",
            [make_source("https://example.com", TUTORIAL_CONTENT)],
            max_blocks=3)
        assert result.policy.type == "exploratory"

    def test_factual_more_blocks_per_domain(self):
        factual = select_evidence("OpenAI API rate limits", [],
                                  max_blocks=1)
        exploratory = select_evidence("how does machine learning work",
                                      [], max_blocks=1)
        assert (factual.policy.max_blocks_per_domain
                > exploratory.policy.max_blocks_per_domain)

    def test_exploratory_more_min_domains(self):
        factual = select_evidence("S3 pricing per GB", [])
        exploratory = select_evidence("what is quantum computing", [])
        assert exploratory.policy.min_domains > factual.policy.min_domains

    def test_policy_override(self):
        result = select_evidence(
            "any query", [],
            policy_override={"max_blocks_per_domain": 10,
                             "type": "factual"})
        assert result.policy.max_blocks_per_domain == 10
        assert result.policy.type == "factual"


class TestEdgeCases:
    def test_empty_sources(self):
        result = select_evidence("test", [])
        assert result.blocks == []
        assert result.total_candidates == 0
        assert result.sources_used == 0

    def test_empty_content(self):
        result = select_evidence(
            "test", [make_source("https://example.com", "")])
        assert result.blocks == []

    def test_max_chars_budget(self):
        result = select_evidence(
            "React hooks",
            [make_source("https://example.com", TUTORIAL_CONTENT)],
            max_chars=100, max_blocks=20)
        total = sum(len(b.text) for b in result.blocks)
        assert total <= 100 + 50  # small overflow from first-block rule

    def test_max_blocks_limit(self):
        long_content = "\n\n".join(
            f"## Section {i}\n\nContent about topic {i} with enough "
            f"text to be a real block." for i in range(20))
        result = select_evidence(
            "topic", [make_source("https://example.com", long_content)],
            max_blocks=3, max_chars=10000)
        assert len(result.blocks) <= 3

    def test_preserves_exact_numbers(self):
        result = select_evidence(
            "API pricing",
            [make_source("https://example.com/pricing", FACTUAL_CONTENT)],
            max_blocks=5)
        all_text = " ".join(b.text for b in result.blocks)
        if "$" in all_text:
            assert re.search(r"\$49/month", all_text)


class TestFormatForLLM:
    def test_empty(self):
        from webpeel_spark.pure.selective_evidence import SelectionResult

        formatted = format_evidence_for_llm(
            SelectionResult([], 0, 0, classify_query("test")))
        assert formatted == ""

    def test_groups_by_source(self):
        result = select_evidence(
            "React hooks useState useEffect",
            [make_source("https://reactjs.org/docs", TUTORIAL_CONTENT),
             make_source("https://blog.example.com/react",
                         COMPARISON_CONTENT)], max_blocks=6)
        formatted = format_evidence_for_llm(result)
        assert "[1]" in formatted
        assert "URL:" in formatted
        assert "---" in formatted

    def test_marks_structured(self):
        result = select_evidence(
            "pricing comparison",
            [make_source("https://example.com/pricing", FACTUAL_CONTENT,
                         structured={"price": 49})], max_blocks=3)
        formatted = format_evidence_for_llm(result)
        if any(b.has_structured_signal for b in result.blocks):
            assert "[structured]" in formatted

    def test_snippet_fallback_excludes_blocked(self):
        result = select_evidence(
            "OpenAI GPT-4 pricing per token",
            [make_source(
                "https://openai.com/api/pricing",
                "# ⚠️ openai.com — Access Blocked\n\nThis site uses "
                "advanced bot protection and blocked our request.",
                title="OpenAI Pricing",
                snippet="Official pricing: GPT-4 costs $30 per 1M input "
                        "tokens and $60 per 1M output tokens.")],
            max_blocks=3)
        formatted = format_evidence_for_llm(result)
        assert "[snippet]" in formatted
        assert "$30 per 1M input tokens" in formatted
        assert "Access Blocked" not in formatted


class TestEvidenceHelpers:
    """Direct coverage of the fallback helpers (ts:267-291)."""

    def test_unusable_none_and_empty(self):
        assert is_unusable_evidence_content(None)
        assert is_unusable_evidence_content("")
        assert is_unusable_evidence_content("   \n ")

    def test_unusable_patterns(self):
        assert is_unusable_evidence_content(
            "## ❌ Reddit Post Not Found\n\nThe post at r/foo could "
            "not be found.")
        assert is_unusable_evidence_content(
            "Server returned an error page (522)")
        assert is_unusable_evidence_content("status: fetch_failed")
        assert not is_unusable_evidence_content(
            "Perfectly good article content about DNS resolution.")

    def test_best_text_modes(self):
        good = make_source("https://a.com", "Real content " * 5)
        text, mode = get_best_evidence_text(good)
        assert mode == "content" and text == good["content"]
        blocked = make_source(
            "https://a.com", "fetch_failed",
            snippet="A usable snippet with enough characters here.")
        text, mode = get_best_evidence_text(blocked)
        assert mode == "snippet"
        short = make_source("https://a.com", "fetch_failed",
                            snippet="too short")
        assert get_best_evidence_text(short) == ("", "none")


class TestSparkOperator:
    """Distributed selector == pure selector per query group."""

    def test_operator_matches_pure(self):
        import pytest

        pytest.importorskip("pyspark")
        from webpeel_spark.operators.evidence import (
            format_evidence_contexts,
            select_evidence_blocks,
        )
        from webpeel_spark.pure.selective_evidence import select_evidence
        from webpeel_spark.session import get_spark

        spark = get_spark(cores=4)
        rows = []
        corpora = {
            "price limits for widget0": [
                ("https://data.gov/w0", "Gov", "The rate is $15 per "
                 "widget0 unit for every widget0 buyer.", "", '{"p":1}'),
                ("https://blog.example/w0", "Blog", "widget0 opinions "
                 "and general thoughts about pricing policy.", "", None),
            ],
            "how does widget1 work": [
                ("https://docs.example/w1", "Docs", "widget1 internals "
                 "explained with diagrams and examples here.", "", None),
                ("https://other.example/w1", "Other", "fetch_failed",
                 "widget1 summarized from search results snippet text.",
                 None),
            ],
        }
        for q, sources in corpora.items():
            for url, title, content, snippet, structured in sources:
                rows.append((q, url, title, content, snippet, structured))
        df = spark.createDataFrame(
            rows, "query string, url string, title string, "
                  "content string, snippet string, structured string")
        got = select_evidence_blocks(df, max_blocks=3).collect()
        by_query = {}
        for r in got:
            by_query.setdefault(r["query"], []).append(r)
        for q, sources in corpora.items():
            pure = select_evidence(q, [
                {"url": u, "title": t, "content": c, "snippet": sn,
                 "structured": st}
                for u, t, c, sn, st in sorted(sources)], max_blocks=3)
            spark_rows = sorted(by_query.get(q, []),
                                key=lambda r: r["rank"])
            assert len(spark_rows) == len(pure.blocks)
            for r, b in zip(spark_rows, pure.blocks):
                assert r["source_url"] == b.source_url
                assert r["text"] == b.text
                assert r["score"] == b.score
                assert r["content_mode"] == b.content_mode

        ctx = {r["query"]: r["context"]
               for r in format_evidence_contexts(df, max_blocks=3)
               .collect()}
        assert "[1]" in ctx["price limits for widget0"]
        assert "URL:" in ctx["how does widget1 work"]

    def test_empty_selection_yields_empty_context_row(self):
        """A query whose sources are all unusable must still appear in
        format_evidence_contexts with context '' — the reference
        returns '' for an empty selection, it does not drop the query
        (r5 review finding)."""
        import pytest

        pytest.importorskip("pyspark")
        from webpeel_spark.operators.evidence import (
            format_evidence_contexts,
        )
        from webpeel_spark.session import get_spark

        spark = get_spark(cores=4)
        df = spark.createDataFrame(
            [("dead query", "https://a.example/x", "T", "fetch_failed",
              "tiny", None),
             ("live query", "https://b.example/y", "T",
              "Plenty of good evidence content about the live query "
              "topic right here.", "", None)],
            "query string, url string, title string, content string, "
            "snippet string, structured string")
        ctx = {r["query"]: r["context"]
               for r in format_evidence_contexts(df).collect()}
        assert ctx["dead query"] == ""
        assert "URL:" in ctx["live query"]
