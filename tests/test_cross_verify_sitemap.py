"""cross-verify.ts consensus core + sitemap.ts parse core ports.

Neither has a dedicated reference vitest suite (both are exercised via
live fetches); these pin the pure logic branch-for-branch and check the
Spark consensus aggregation against the pure port.
"""

from __future__ import annotations

import pytest

from webpeel_spark.pure.cross_verify import build_consensus, normalize_url
from webpeel_spark.pure.sitemap import parse_sitemap_xml


class TestNormalizeUrl:
    def test_strips_www_slash_query(self):
        assert normalize_url("https://www.a.com/path/?q=1") == "a.com/path"
        assert normalize_url("http://a.com/path") == "a.com/path"
        assert normalize_url("https://a.com/") == "a.com"
        assert normalize_url("https://a.com") == "a.com"

    def test_unparseable_returned_as_is(self):
        assert normalize_url("not a url") == "not a url"


class TestBuildConsensus:
    SOURCES = [
        {"engine": "duckduckgo", "topResults": [
            {"url": "https://www.a.com/x/", "title": "A from ddg"},
            {"url": "https://b.com/y", "title": "B from ddg"},
        ]},
        {"engine": "google", "topResults": [
            {"url": "https://a.com/x", "title": "A from google"},
            {"url": "https://c.com/z", "title": "C from google"},
        ]},
        {"engine": "baidu", "topResults": []},
    ]

    def test_agreement_over_active_engines_only(self):
        r = build_consensus(self.SOURCES)
        assert r["totalSources"] == 2   # baidu inactive
        top = r["consensus"][0]
        assert top["url"] == "a.com/x"
        assert top["appearsIn"] == ["duckduckgo", "google"]
        assert top["agreementScore"] == 1.0
        assert top["averagePosition"] == 1.0

    def test_first_seen_title_wins(self):
        r = build_consensus(self.SOURCES)
        assert r["consensus"][0]["title"] == "A from ddg"

    def test_sort_and_confidence(self):
        r = build_consensus(self.SOURCES)
        scores = [c["agreementScore"] for c in r["consensus"]]
        assert scores == sorted(scores, reverse=True)
        # top5 = [1.0, 0.5, 0.5] → mean 2/3 → rounded 0.67
        assert r["confidence"] == 0.67

    def test_empty(self):
        r = build_consensus([])
        assert r["consensus"] == [] and r["confidence"] == 0.0
        assert r["totalSources"] == 0


SITEMAP_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.com/page1</loc><lastmod>2026-01-02</lastmod>
    <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://a.com/page2</loc></url>
  <url><loc></loc></url>
</urlset>"""

SITEMAP_INDEX = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.com/sitemap-posts.xml</loc></sitemap>
  <sitemap><loc>https://a.com/sitemap-pages.xml</loc></sitemap>
</sitemapindex>"""


class TestParseSitemap:
    def test_urlset_entries(self):
        r = parse_sitemap_xml(SITEMAP_URLSET)
        assert r["kind"] == "urlset"
        assert len(r["urls"]) == 2   # empty <loc> skipped
        first = r["urls"][0]
        assert first["url"] == "https://a.com/page1"
        assert first["lastmod"] == "2026-01-02"
        assert first["changefreq"] == "daily"
        assert first["priority"] == 0.8
        assert r["urls"][1] == {"url": "https://a.com/page2"}

    def test_index_entries(self):
        r = parse_sitemap_xml(SITEMAP_INDEX)
        assert r["kind"] == "index"
        assert r["sitemaps"] == ["https://a.com/sitemap-posts.xml",
                                 "https://a.com/sitemap-pages.xml"]
        assert r["urls"] == []

    def test_max_urls_cap(self):
        body = "".join(f"<url><loc>https://a.com/p{i}</loc></url>"
                       for i in range(30))
        r = parse_sitemap_xml(f"<urlset>{body}</urlset>", max_urls=10)
        assert len(r["urls"]) == 10

    def test_garbage(self):
        r = parse_sitemap_xml("not xml at all <<<")
        assert r["kind"] == "unknown" and r["urls"] == []


@pytest.fixture(scope="module")
def spark():
    from webpeel_spark.session import get_spark

    return get_spark(app_name="test-cross-verify")


def test_consensus_results_matches_pure(spark):
    from webpeel_spark.operators.consensus import consensus_results

    rows = [
        ("duckduckgo", 0, 1, "https://www.a.com/x/", "A from ddg"),
        ("duckduckgo", 0, 2, "https://b.com/y", "B from ddg"),
        ("google", 1, 1, "https://a.com/x", "A from google"),
        ("google", 1, 2, "https://c.com/z", "C from google"),
    ]
    df = spark.createDataFrame(
        rows, "engine string, engine_idx int, position int, "
              "url string, title string")
    got = consensus_results(df).collect()

    pure = build_consensus([
        {"engine": "duckduckgo", "topResults": [
            {"url": r[3], "title": r[4]} for r in rows if r[0] == "duckduckgo"]},
        {"engine": "google", "topResults": [
            {"url": r[3], "title": r[4]} for r in rows if r[0] == "google"]},
    ])
    assert got[0]["url"] == pure["consensus"][0]["url"] == "a.com/x"
    assert got[0]["title"] == pure["consensus"][0]["title"]
    assert list(got[0]["appears_in"]) == pure["consensus"][0]["appearsIn"]
    assert got[0]["agreement_score"] == pure["consensus"][0]["agreementScore"]
    for g in got[1:]:
        match = next(c for c in pure["consensus"] if c["url"] == g["url"])
        assert g["agreement_score"] == round(match["agreementScore"], 6)
        assert g["average_position"] == round(match["averagePosition"], 6)
