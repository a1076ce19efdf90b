"""source-credibility.ts port: behavior pins for the pure scorer (the
reference ships no dedicated suite for this module — these pin the
ported implementation branch-for-branch) plus a three-way parity check
(pure Python vs Catalyst operator; the DuckDB twin is the driver
oracle)."""

from __future__ import annotations

import pytest

from webpeel_spark.pure.source_credibility import (
    count_subdomains,
    extract_sld,
    extract_tld,
    get_source_credibility,
)


class TestHelpers:
    def test_extract_tld(self):
        assert extract_tld("example.com") == ".com"
        assert extract_tld("a.b.example.co") == ".co"
        assert extract_tld("localhost") == ""

    def test_extract_sld(self):
        assert extract_sld("blog.cloudflare.com") == "cloudflare.com"
        assert extract_sld("example.com") == "example.com"
        assert extract_sld("localhost") == "localhost"

    def test_count_subdomains(self):
        assert count_subdomains("example.com") == 0
        assert count_subdomains("www.example.com") == 0  # www ignored
        assert count_subdomains("blog.example.com") == 1
        assert count_subdomains("a.b.example.com") == 2
        assert count_subdomains("a.b.c.example.com") == 3


class TestOfficialTier:
    def test_gov(self):
        r = get_source_credibility("https://www.nasa.gov/missions")
        assert r["tier"] == "official"
        assert r["label"] == "Official Government Source"
        assert r["score"] == min(100, 10 + 20 + 55)
        assert "Official domain verified" in r["signals"]

    def test_edu(self):
        r = get_source_credibility("https://mit.edu/")
        assert r["tier"] == "official"
        assert r["label"] == "Official Educational Institution"

    def test_int(self):
        r = get_source_credibility("https://who.int/data")
        assert r["tier"] == "official"
        assert r["label"] == "International Organization"

    def test_official_domain_not_tld(self):
        r = get_source_credibility("https://arxiv.org/abs/1234.5678")
        assert r["tier"] == "official"
        assert r["label"] == "Official Source"

    def test_official_subdomain_host(self):
        r = get_source_credibility("https://docs.python.org/3/")
        assert r["tier"] == "official"

    def test_http_official_loses_https_points(self):
        r = get_source_credibility("http://usgs.gov/maps")
        assert r["tier"] == "official"
        assert r["score"] == min(100, 0 + 20 + 55)
        assert "HTTP only — no encryption" in r["warnings"]


class TestEstablished:
    def test_known_brand_with_category(self):
        r = get_source_credibility("https://www.google.com/search")
        # 10 https + 12 .com + 15 clean + 40 established = 77
        assert r["score"] == 77
        assert r["tier"] == "established"
        assert r["label"] == "Established Technology Company"

    def test_subdomain_of_established(self):
        r = get_source_credibility("https://blog.cloudflare.com/post")
        # 10 + 12 + 10 (1 subdomain) + 40 = 72
        assert r["score"] == 72
        assert r["label"] == "Established CDN & Security Provider"

    def test_established_without_category(self):
        r = get_source_credibility("https://stripe.com/docs")
        assert r["label"] == "Established Payment Platform"
        r2 = get_source_credibility("https://figma.com/")
        assert r2["label"] == "Established Design Platform"
        r3 = get_source_credibility("https://datadog.com/")
        assert r3["tier"] == "established"
        assert r3["label"] == "Established Website"  # no category entry


class TestCommunityPlatforms:
    def test_github_pages(self):
        r = get_source_credibility("https://someone.github.io/blog")
        assert r["label"] == "Personal Site on GitHub Pages"
        # 10 + 11 (.io) + 10 (1 sub) + 15 platform = 46 → community
        assert r["score"] == 46
        assert r["tier"] == "community"

    def test_platform_beats_established_bonus(self):
        """github.com is in BOTH tables — the platform bonus (15) wins
        over the established bonus (40), mutually exclusive."""
        r = get_source_credibility("https://github.com/user/repo")
        assert r["label"] == "Community Content on GitHub"
        # 10 + 12 + 15 clean + 15 platform = 52
        assert r["score"] == 52

    def test_hn(self):
        r = get_source_credibility("https://news.ycombinator.com/item?id=1")
        assert r["label"] == "Discussion on Hacker News"


class TestSuspicious:
    def test_free_tld_capped(self):
        r = get_source_credibility("https://free-stuff.tk/win")
        assert r["score"] <= 15
        assert r["tier"] == "suspicious"
        assert r["label"] == "Free Domain TLD (.tk) — Exercise Caution"
        assert any("free TLD" in w for w in r["warnings"])

    def test_phishing_keywords_capped(self):
        r = get_source_credibility(
            "https://paypal-secure-login.example-site.com/verify")
        assert r["score"] <= 19
        assert r["tier"] == "suspicious"
        assert any("impersonation" in w for w in r["warnings"])

    def test_phishing_keyword_on_established_not_capped(self):
        # aws.amazon.com contains 'amazon.' but IS established → no cap
        r = get_source_credibility("https://aws.amazon.com/s3/")
        assert r["score"] >= 60
        assert not any("impersonation" in w for w in r["warnings"])

    def test_invalid_url(self):
        r = get_source_credibility("not-a-url")
        assert r == {"tier": "suspicious", "score": 0,
                     "label": "Invalid URL — Cannot Assess",
                     "signals": [],
                     "warnings": ["URL could not be parsed"]}


class TestStructure:
    def test_deep_subdomains_warn(self):
        r = get_source_credibility("http://a.b.c.d.example.org/deep")
        assert any("Excessive subdomains" in w for w in r["warnings"])

    def test_unknown_clean_com(self):
        r = get_source_credibility("https://totally-unknown-site.com/")
        # 10 + 12 + 15 = 37 → new
        assert r["score"] == 37
        assert r["tier"] == "new"
        assert r["label"] == "Small or Recently Established Website"


@pytest.fixture(scope="module")
def spark():
    from webpeel_spark.session import get_spark

    s = get_spark(app_name="test-credibility", cores=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_catalyst_matches_pure_python(spark):
    """The Catalyst projection and the pure Python scorer agree on
    every branch-covering URL (the DuckDB twin is checked by the
    driver oracle)."""
    from webpeel_spark.operators.credibility import credibility_scores

    urls = [
        "https://www.nasa.gov/missions", "https://mit.edu/",
        "https://who.int/data", "https://arxiv.org/abs/1",
        "https://docs.python.org/3/", "http://usgs.gov/maps",
        "https://www.google.com/search", "https://blog.cloudflare.com/p",
        "https://stripe.com/docs", "https://datadog.com/",
        "https://someone.github.io/blog", "https://github.com/user/repo",
        "https://news.ycombinator.com/item", "https://medium.com/@w/s",
        "https://free-stuff.tk/win", "http://get-rich.ml/now",
        "https://paypal-secure-login.example-site.com/verify",
        "https://aws.amazon.com/s3/", "http://a.b.c.d.example.org/deep",
        "https://totally-unknown-site.com/", "https://myshop.store/c",
        "https://example.com:8080/with-port", "https://singlelabel/path",
        "not-a-url", "https://two.levels.example.net/x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: (r["tier"], r["score"], r["label"])
           for r in credibility_scores(df).collect()}
    for u in urls:
        p = get_source_credibility(u)
        assert got[u] == (p["tier"], p["score"], p["label"]), u
