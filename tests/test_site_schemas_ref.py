"""Reference-suite port: src/tests/schema-extraction.test.ts (31 cases)
against the new pure/site_schemas.py (schema-extraction.ts port:
bundled site schemas, URL matching, schema execution engine)."""

from webpeel_spark.pure.site_schemas import (
    extract_with_schema, find_schema_for_url, load_bundled_schemas,
)


# ── loadBundledSchemas ───────────────────────────────────────────────────

def test_returns_schema_list():
    schemas = load_bundled_schemas()
    assert isinstance(schemas, list) and len(schemas) > 0


def test_each_schema_required_fields():
    for s in load_bundled_schemas():
        assert s["name"] and s["version"] and s["domains"]
        assert s["baseSelector"] and s["fields"]
        for f in s["fields"]:
            assert f["name"] and f["type"]


def test_includes_expected_schemas():
    names = {s["name"] for s in load_bundled_schemas()}
    for expected in ("Booking.com Hotel Search", "Amazon Product Search",
                     "eBay Search Results", "Hacker News"):
        assert expected in names


# ── findSchemaForUrl ─────────────────────────────────────────────────────

def test_match_hn_by_domain():
    s = find_schema_for_url("https://news.ycombinator.com/")
    assert s and s["name"] == "Hacker News"


def test_match_ebay_domain_and_pattern():
    s = find_schema_for_url("https://www.ebay.com/sch/i.html?_nkw=card")
    assert s and s["name"] == "eBay Search Results"


def test_match_amazon_domain_and_pattern():
    s = find_schema_for_url("https://www.amazon.com/s?k=wireless+mouse")
    assert s and s["name"] == "Amazon Product Search"


def test_match_amazon_international():
    s = find_schema_for_url("https://www.amazon.co.uk/s?k=kettle")
    assert s and s["name"] == "Amazon Product Search"


def test_match_booking_search():
    s = find_schema_for_url(
        "https://www.booking.com/searchresults.html?ss=Paris")
    assert s and s["name"] == "Booking.com Hotel Search"


def test_booking_non_search_no_match():
    assert find_schema_for_url(
        "https://www.booking.com/hotel/fr/some-hotel.html") is None


def test_match_yelp_search():
    s = find_schema_for_url(
        "https://www.yelp.com/search?find_desc=pizza")
    assert s and s["name"] == "Yelp Business Search"


def test_match_walmart_search():
    s = find_schema_for_url("https://www.walmart.com/search?q=tv")
    assert s and s["name"] == "Walmart Product Search"


def test_unknown_domain_none():
    assert find_schema_for_url("https://unknown-site.example/search") is None


def test_invalid_url_none():
    assert find_schema_for_url("not a url") is None


def test_case_insensitive_domain():
    s = find_schema_for_url("https://NEWS.YCOMBINATOR.COM/")
    assert s and s["name"] == "Hacker News"


# ── extractWithSchema ────────────────────────────────────────────────────

SIMPLE_SCHEMA = {
    "name": "Test Product Listings",
    "version": "1.0",
    "domains": ["test.com"],
    "baseSelector": ".product",
    "fields": [
        {"name": "title", "selector": ".product-title", "type": "text"},
        {"name": "price", "selector": ".product-price", "type": "text"},
        {"name": "link", "selector": "a.product-link", "type": "attribute",
         "attribute": "href"},
        {"name": "image", "selector": "img.product-img", "type": "attribute",
         "attribute": "src"},
        {"name": "inStock", "selector": ".in-stock", "type": "exists"},
        {"name": "html", "selector": ".product-desc", "type": "html"},
    ],
}

PRODUCT_HTML = """
<!DOCTYPE html>
<html>
<body>
  <div class="product">
    <h3 class="product-title">Widget A</h3>
    <span class="product-price">$9.99</span>
    <a class="product-link" href="/products/widget-a">View</a>
    <img class="product-img" src="/img/widget-a.jpg" alt="Widget A">
    <span class="in-stock">In Stock</span>
    <div class="product-desc"><b>Great</b> widget</div>
  </div>
  <div class="product">
    <h3 class="product-title">Widget B</h3>
    <span class="product-price">$14.99</span>
    <a class="product-link" href="/products/widget-b">View</a>
    <img class="product-img" src="/img/widget-b.jpg" alt="Widget B">
    <div class="product-desc">Another widget</div>
  </div>
  <div class="product">
    <!-- empty, no title — should be filtered out -->
  </div>
</body>
</html>
"""


def test_item_count_skips_empty_titles():
    assert len(extract_with_schema(PRODUCT_HTML, SIMPLE_SCHEMA)) == 2


def test_text_fields():
    items = extract_with_schema(PRODUCT_HTML, SIMPLE_SCHEMA)
    assert items[0]["title"] == "Widget A"
    assert items[0]["price"] == "$9.99"
    assert items[1]["title"] == "Widget B"
    assert items[1]["price"] == "$14.99"


def test_attribute_fields():
    items = extract_with_schema(PRODUCT_HTML, SIMPLE_SCHEMA)
    assert items[0]["link"] == "/products/widget-a"
    assert items[0]["image"] == "/img/widget-a.jpg"


def test_exists_fields():
    items = extract_with_schema(PRODUCT_HTML, SIMPLE_SCHEMA)
    assert items[0]["inStock"] is True
    assert items[1]["inStock"] is False


def test_html_fields():
    items = extract_with_schema(PRODUCT_HTML, SIMPLE_SCHEMA)
    assert isinstance(items[0]["html"], str)
    assert "<b>Great</b>" in items[0]["html"]


def test_relative_urls_resolved_with_base():
    items = extract_with_schema(PRODUCT_HTML, SIMPLE_SCHEMA,
                                "https://shop.example.com")
    assert items[0]["link"] == "https://shop.example.com/products/widget-a"
    assert items[0]["image"] == "https://shop.example.com/img/widget-a.jpg"


def test_relative_urls_kept_without_base():
    items = extract_with_schema(PRODUCT_HTML, SIMPLE_SCHEMA)
    assert items[0]["link"] == "/products/widget-a"


def test_empty_html():
    assert extract_with_schema("", SIMPLE_SCHEMA) == []
    assert extract_with_schema("   ", SIMPLE_SCHEMA) == []


def test_base_selector_no_match():
    assert extract_with_schema("<html><body><p>hello</p></body></html>",
                               SIMPLE_SCHEMA) == []


def test_trim_transform():
    schema = {"name": "Trim Test", "version": "1.0", "domains": ["test.com"],
              "baseSelector": ".item",
              "fields": [{"name": "title", "selector": ".title",
                          "type": "text", "transform": "trim"}]}
    html = ('<div class="item"><span class="title">  Padded Title  '
            "</span></div>")
    assert extract_with_schema(html, schema)[0]["title"] == "Padded Title"


def test_number_transform():
    schema = {"name": "Number Test", "version": "1.0",
              "domains": ["test.com"], "baseSelector": ".item",
              "fields": [
                  {"name": "title", "selector": ".title", "type": "text"},
                  {"name": "count", "selector": ".count", "type": "text",
                   "transform": "number"}]}
    html = ('<div class="item"><span class="title">Item</span>'
            '<span class="count">42 reviews</span></div>')
    assert extract_with_schema(html, schema)[0]["count"] == 42


def test_strip_currency_transform():
    schema = {"name": "Currency Test", "version": "1.0",
              "domains": ["test.com"], "baseSelector": ".item",
              "fields": [
                  {"name": "title", "selector": ".title", "type": "text"},
                  {"name": "price", "selector": ".price", "type": "text",
                   "transform": "stripCurrency"}]}
    html = ('<div class="item"><span class="title">Item</span>'
            '<span class="price">$24.99</span></div>')
    assert extract_with_schema(html, schema)[0]["price"] == "24.99"


def test_self_referencing_attribute():
    schema = {"name": "Self Attr Test", "version": "1.0",
              "domains": ["test.com"], "baseSelector": "[data-product]",
              "fields": [
                  {"name": "title", "selector": "h3", "type": "text"},
                  {"name": "id", "selector": "", "type": "attribute",
                   "attribute": "data-product"}]}
    html = '<div data-product="prod-123"><h3>My Product</h3></div>'
    assert extract_with_schema(html, schema)[0]["id"] == "prod-123"


def test_multiple_values():
    schema = {"name": "Multiple Test", "version": "1.0",
              "domains": ["test.com"], "baseSelector": ".listing",
              "fields": [
                  {"name": "title", "selector": ".title", "type": "text"},
                  {"name": "tags", "selector": ".tag", "type": "text",
                   "multiple": True}]}
    html = """
      <div class="listing">
        <span class="title">Article</span>
        <span class="tag">tech</span>
        <span class="tag">news</span>
        <span class="tag">AI</span>
      </div>
    """
    items = extract_with_schema(html, schema)
    assert items[0]["tags"] == ["tech", "news", "AI"]


# ── Hacker News fixture ──────────────────────────────────────────────────

HN_HTML = """
<!DOCTYPE html>
<html>
<body>
<table id="hnmain">
<tbody>
  <tr class="athing" id="1001">
    <td class="title"><span class="rank">1.</span></td>
    <td class="title">
      <span class="titleline">
        <a href="https://example.com/article-1">TypeScript is great</a>
        <span class="sitestr">example.com</span>
      </span>
    </td>
  </tr>
  <tr class="athing" id="1002">
    <td class="title"><span class="rank">2.</span></td>
    <td class="title">
      <span class="titleline">
        <a href="https://news.example.com/article-2">Ask HN: How do you stay focused?</a>
        <span class="sitestr">news.example.com</span>
      </span>
    </td>
  </tr>
  <tr class="athing" id="1003">
    <td class="title"><span class="rank">3.</span></td>
    <td class="title">
      <span class="titleline">
        <a href="https://another.com/post">New open source tool released</a>
        <span class="sitestr">another.com</span>
      </span>
    </td>
  </tr>
</tbody>
</table>
</body>
</html>
"""


def _hn_schema():
    return next(s for s in load_bundled_schemas()
                if s["name"] == "Hacker News")


def test_hn_bundled_schema_extracts():
    assert len(extract_with_schema(HN_HTML, _hn_schema())) == 3


def test_hn_titles_and_links():
    items = extract_with_schema(HN_HTML, _hn_schema())
    assert items[0]["title"] == "TypeScript is great"
    assert items[0]["link"] == "https://example.com/article-1"
    assert items[0]["site"] == "example.com"
    assert items[1]["title"] == "Ask HN: How do you stay focused?"
    assert items[2]["title"] == "New open source tool released"


def test_hn_ranks():
    items = extract_with_schema(HN_HTML, _hn_schema())
    assert [i["rank"] for i in items] == ["1.", "2.", "3."]
