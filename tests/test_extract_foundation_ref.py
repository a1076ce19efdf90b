"""Reference-suite parity: extract.test.ts (15 extractStructured cases)
and foundation-fixes.test.ts's JSON-LD describe block (7 cases).

The foundation-fixes 'Zero-token safety net' block drives live
``peel()`` fetches — N/A by design (no network in the engine).
"""

from __future__ import annotations

from webpeel_spark.pure.jsonld import extract_jsonld
from webpeel_spark.pure.schema_extract import extract_structured


# ── extract.test.ts: extractStructured ──────────────────────────────────

class TestExtractStructured:
    def test_css_selectors(self):
        html = """<html><body>
          <h1 class="title">Page Title</h1>
          <p class="author">John Doe</p>
          <div class="content">Main content here</div>
        </body></html>"""
        result = extract_structured(html, selectors={
            "title": ".title", "author": ".author", "content": ".content"})
        assert result["title"] == "Page Title"
        assert result["author"] == "John Doe"
        assert result["content"] == "Main content here"

    def test_null_for_missing(self):
        html = "<html><body><h1>Title</h1></body></html>"
        result = extract_structured(html, selectors={
            "title": "h1", "author": ".author"})
        assert result["title"] == "Title"
        assert result["author"] is None

    def test_multiple_elements_as_array(self):
        html = """<html><body>
          <li class="item">Item 1</li>
          <li class="item">Item 2</li>
          <li class="item">Item 3</li>
        </body></html>"""
        result = extract_structured(html, selectors={"items": ".item"})
        assert isinstance(result["items"], list)
        assert len(result["items"]) == 3
        assert result["items"][0] == "Item 1"
        assert result["items"][2] == "Item 3"

    def test_schema_heuristic(self):
        html = """<html><body>
          <div class="title">Schema Title</div>
          <div class="price">$19.99</div>
        </body></html>"""
        result = extract_structured(html, schema={"properties": {
            "title": {"type": "string"}, "price": {"type": "string"}}})
        assert result["title"] == "Schema Title"
        assert result["price"] == "$19.99"

    def test_nested_selectors(self):
        html = """<html><body><article>
          <header><h1>Article Title</h1>
            <span class="date">2024-01-01</span></header>
          <div class="body">Article content</div>
        </article></body></html>"""
        result = extract_structured(html, selectors={
            "title": "article header h1", "date": "article .date",
            "content": "article .body"})
        assert result["title"] == "Article Title"
        assert result["date"] == "2024-01-01"
        assert result["content"] == "Article content"

    def test_id_selectors(self):
        html = """<html><body>
          <div id="main-title">Main Title</div>
          <div id="subtitle">Subtitle Text</div>
        </body></html>"""
        result = extract_structured(html, selectors={
            "title": "#main-title", "subtitle": "#subtitle"})
        assert result["title"] == "Main Title"
        assert result["subtitle"] == "Subtitle Text"

    def test_meta_tags_via_schema(self):
        html = """<html><head>
          <meta name="description" content="Page description" />
          <meta property="og:title" content="OG Title" />
        </head><body></body></html>"""
        result = extract_structured(html, schema={"properties": {
            "description": {"type": "string"}, "title": {"type": "string"}}})
        assert result["description"] == "Page description"
        assert result["title"] == "OG Title"

    def test_type_coercion(self):
        html = """<html><body>
          <div class="price">29.99</div>
          <div class="available">true</div>
          <div class="quantity">5 units</div>
        </body></html>"""
        result = extract_structured(html, schema={"properties": {
            "price": {"type": "number"},
            "available": {"type": "boolean"},
            "quantity": {"type": "number"}}})
        assert result["price"] == 29.99
        assert isinstance(result["price"], float)
        assert result["available"] is True
        assert result["quantity"] == 5

    def test_array_type(self):
        html = """<html><body>
          <span class="tags">Tag 1</span>
          <span class="tags">Tag 2</span>
          <span class="tags">Tag 3</span>
        </body></html>"""
        result = extract_structured(html, schema={"properties": {
            "tags": {"type": "array"}}})
        assert isinstance(result["tags"], list)
        assert len(result["tags"]) == 3

    def test_malformed_html(self):
        html = """<html><body>
          <div class="content">Valid content
          <p>Unclosed paragraph
        </body>"""
        result = extract_structured(html, selectors={"content": ".content"})
        assert "Valid content" in result["content"]

    def test_itemprop_attributes(self):
        html = """<html><body><div itemscope>
          <span itemprop="name">Product Name</span>
          <span itemprop="price">$99</span>
        </div></body></html>"""
        result = extract_structured(html, schema={"properties": {
            "name": {"type": "string"}, "price": {"type": "string"}}})
        assert result["name"] == "Product Name"
        assert result["price"] == "$99"

    def test_data_attributes(self):
        html = """<html><body>
          <div data-product-id="12345">Product</div>
          <div data-category="electronics">Category</div>
        </body></html>"""
        result = extract_structured(html, selectors={
            "productId": "[data-product-id]", "category": "[data-category]"})
        assert result["productId"] == "Product"
        assert result["category"] == "Category"

    def test_selectors_and_schema_combined(self):
        html = """<html><body>
          <h1 class="title">Explicit Title</h1>
          <div class="author">Author Name</div>
          <meta name="date" content="2024-01-01" />
        </body></html>"""
        result = extract_structured(
            html, selectors={"title": ".title"},
            schema={"properties": {"author": {"type": "string"},
                                   "date": {"type": "string"}}})
        assert result["title"] == "Explicit Title"
        assert result["author"] == "Author Name"
        assert result["date"] == "2024-01-01"

    def test_empty_schema(self):
        result = extract_structured(
            "<html><body><div>Content</div></body></html>", schema={})
        assert result == {}

    def test_multiple_matches_returns_array(self):
        html = """<html><body>
          <p>First paragraph</p>
          <p>Second paragraph</p>
        </body></html>"""
        result = extract_structured(html, selectors={"paragraph": "p"})
        assert isinstance(result["paragraph"], list)
        assert result["paragraph"][0] == "First paragraph"


# ── foundation-fixes.test.ts: JSON-LD extraction ────────────────────────

class TestFoundationJsonLd:
    def test_recipe(self):
        html = """<html><head>
        <script type="application/ld+json">{
          "@type": "Recipe",
          "name": "Chocolate Chip Cookies",
          "description": "Classic cookies everyone loves",
          "prepTime": "PT20M",
          "cookTime": "PT12M",
          "recipeYield": "24 cookies",
          "recipeIngredient": ["2 cups flour", "1 cup butter", "1 cup sugar", "2 eggs", "1 cup chocolate chips"],
          "recipeInstructions": [
            {"@type": "HowToStep", "text": "Preheat oven to 375°F."},
            {"@type": "HowToStep", "text": "Mix flour and butter."},
            {"@type": "HowToStep", "text": "Add chocolate chips and bake for 12 minutes."}
          ],
          "nutrition": {"calories": "200 calories"},
          "author": {"@type": "Person", "name": "Jane Baker"},
          "aggregateRating": {"ratingValue": "4.8", "ratingCount": "1234"}
        }</script>
        </head><body><p>Some page content</p></body></html>"""
        result = extract_jsonld(html)
        assert result is not None
        assert result.type == "Recipe"
        for needle in ("Chocolate Chip Cookies", "2 cups flour",
                       "Preheat oven", "20 min", "4.8"):
            assert needle in result.content

    def test_product(self):
        html = """<html><head>
        <script type="application/ld+json">{
          "@type": "Product",
          "name": "AirPods Pro",
          "description": "Active noise cancellation headphones",
          "brand": {"@type": "Brand", "name": "Apple"},
          "offers": {"@type": "Offer", "price": "249.99", "priceCurrency": "USD", "availability": "https://schema.org/InStock"},
          "aggregateRating": {"ratingValue": "4.7", "reviewCount": "5678"},
          "sku": "MTJV3AM/A"
        }</script>
        </head><body></body></html>"""
        result = extract_jsonld(html)
        assert result is not None
        assert result.type == "Product"
        for needle in ("AirPods Pro", "249.99", "Apple", "In Stock"):
            assert needle in result.content

    def test_news_article(self):
        html = """<html><head>
        <script type="application/ld+json">{
          "@type": "NewsArticle",
          "headline": "Breaking: AI Advances",
          "author": {"@type": "Person", "name": "John Smith"},
          "datePublished": "2026-02-24",
          "articleBody": "Artificial intelligence continues to advance rapidly. Researchers announced new breakthroughs today."
        }</script>
        </head><body></body></html>"""
        result = extract_jsonld(html)
        assert result is not None
        assert result.type == "NewsArticle"
        for needle in ("Breaking: AI Advances", "John Smith",
                       "advance rapidly"):
            assert needle in result.content

    def test_faq_page(self):
        html = """<html><head>
        <script type="application/ld+json">{
          "@type": "FAQPage",
          "mainEntity": [
            {"@type": "Question", "name": "What is WebPeel?", "acceptedAnswer": {"@type": "Answer", "text": "A web fetcher for AI agents."}},
            {"@type": "Question", "name": "Is it free?", "acceptedAnswer": {"@type": "Answer", "text": "Yes, 500 requests per week."}}
          ]
        }</script>
        </head><body></body></html>"""
        result = extract_jsonld(html)
        assert result is not None
        assert result.type == "FAQPage"
        for needle in ("What is WebPeel", "web fetcher", "500 requests"):
            assert needle in result.content

    def test_graph_arrays(self):
        html = """<html><head>
        <script type="application/ld+json">{
          "@graph": [
            {"@type": "WebSite", "name": "Example"},
            {"@type": "Recipe", "name": "Test Recipe", "recipeIngredient": ["flour", "sugar"], "recipeInstructions": ["Mix all"]}
          ]
        }</script>
        </head><body></body></html>"""
        result = extract_jsonld(html)
        assert result is not None
        assert result.type == "Recipe"

    def test_unsupported_type_returns_none(self):
        html = """<html><head>
        <script type="application/ld+json">{"@type": "WebSite", "name": "Example"}</script>
        </head><body></body></html>"""
        assert extract_jsonld(html) is None

    def test_malformed_json_returns_none(self):
        html = """<html><head>
        <script type="application/ld+json">{broken json here</script>
        </head><body></body></html>"""
        assert extract_jsonld(html) is None
