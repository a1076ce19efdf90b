"""site-search.ts port — reference suite (13 cases) case-for-case."""

from __future__ import annotations

import pytest

from webpeel_spark.pure.site_search import (
    SITE_TEMPLATES,
    build_site_search_url,
    find_site_by_url,
    list_sites,
)


def test_ebay_url():
    r = build_site_search_url("ebay", "charizard card")
    assert r["site"] == "ebay"
    assert r["query"] == "charizard card"
    assert r["url"] == \
        "https://www.ebay.com/sch/i.html?_nkw=charizard%20card"


def test_amazon_url():
    r = build_site_search_url("amazon", "mechanical keyboard")
    assert r["site"] == "amazon"
    assert r["url"] == "https://www.amazon.com/s?k=mechanical%20keyboard"


def test_all_shopping_sites():
    for site in ("ebay", "amazon", "walmart", "target", "bestbuy", "etsy",
                 "aliexpress", "newegg"):
        r = build_site_search_url(site, "test query")
        assert r["url"].startswith("https://")
        assert r["site"] == site


def test_special_characters_encoded():
    r = build_site_search_url("ebay", 'hello world & "special" chars')
    assert " " not in r["url"]
    assert '"' not in r["url"]
    assert "&nkw" not in r["url"]
    assert "hello%20world" in r["url"]


def test_unknown_site_raises():
    with pytest.raises(ValueError, match="Unknown site"):
        build_site_search_url("nonexistent-site", "query")
    with pytest.raises(ValueError, match="nonexistent-site"):
        build_site_search_url("nonexistent-site", "query")


def test_list_sites():
    sites = list_sites()
    assert len(sites) >= 20
    valid = {"shopping", "social", "jobs", "general", "tech",
             "real-estate", "food"}
    for s in sites:
        assert isinstance(s["id"], str)
        assert isinstance(s["name"], str)
        assert s["category"] in valid


def test_reverse_lookup():
    assert find_site_by_url("https://www.ebay.com/sch/i.html?_nkw=test") \
        == "ebay"
    assert find_site_by_url("https://www.amazon.com/s?k=test") == "amazon"
    assert find_site_by_url("https://github.com/search?q=test") == "github"
    assert find_site_by_url("https://www.npmjs.com/search?q=test") == "npm"
    assert find_site_by_url("https://stackoverflow.com/search?q=test") \
        == "stackoverflow"


def test_reverse_lookup_unknown():
    assert find_site_by_url("https://www.unknown-site.com/search") is None
    assert find_site_by_url("https://www.example.com/") is None


def test_alias_x_twitter():
    rx = build_site_search_url("x", "typescript")
    rt = build_site_search_url("twitter", "typescript")
    assert rx["url"] == rt["url"]
    assert rx["site"] == "twitter"


def test_case_insensitive():
    assert build_site_search_url("EBAY", "test")["site"] == "ebay"


def test_required_sites_present():
    required = ["ebay", "amazon", "walmart", "target", "bestbuy", "etsy",
                "aliexpress", "newegg", "google", "bing", "duckduckgo",
                "reddit", "youtube", "twitter", "linkedin", "github",
                "stackoverflow", "npm", "pypi", "zillow", "realtor",
                "indeed", "glassdoor", "linkedin-jobs", "yelp",
                "doordash", "ubereats"]
    for site in required:
        assert site in SITE_TEMPLATES
    assert len(required) >= 20


def test_all_templates_https_no_spaces():
    for sid in SITE_TEMPLATES:
        url = build_site_search_url(sid, "test query")["url"]
        assert url.startswith("https://"), sid
        assert " " not in url, sid


def test_x_com_is_twitter():
    assert find_site_by_url("https://x.com/search?q=test") == "twitter"
    assert find_site_by_url("https://twitter.com/search?q=test") == "twitter"


def test_encode_uri_component_parity():
    # encodeURIComponent("hello world & \"special\" chars") verbatim
    r = build_site_search_url("ebay", 'hello world & "special" chars')
    assert r["url"].endswith(
        "_nkw=hello%20world%20%26%20%22special%22%20chars")
