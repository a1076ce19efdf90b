"""Reference-suite ports: schema-postprocess
(src/tests/schema-postprocess.test.ts) and schema-templates
(src/tests/schema-templates.test.ts), case-for-case."""

from __future__ import annotations

from webpeel_spark.pure.schema_postprocess import (
    default_quick_answer_fn,
    extract_value_from_passage,
    smart_extract_schema_fields,
)
from webpeel_spark.pure.schema_templates import (
    SCHEMA_TEMPLATES,
    get_schema_template,
    list_schema_templates,
)


# ── extractValueFromPassage ─────────────────────────────────────────────

class TestPriceExtraction:
    def test_dollar_amount(self):
        assert extract_value_from_passage(
            "The iPhone 16 costs $799 and is available now", "price") \
            == "$799"

    def test_dollar_with_cents(self):
        assert extract_value_from_passage(
            "Price: $1,299.99 for the Pro model", "price") == "$1,299.99"

    def test_euro_amount(self):
        assert extract_value_from_passage(
            "The price is €599 in Europe", "price") == "€599"

    def test_starting_at_price(self):
        assert "$9.99" in extract_value_from_passage(
            "Starting at $9.99 per month", "price")


class TestDateExtraction:
    def test_iso_date(self):
        assert extract_value_from_passage(
            "Published 2023-11-21\n\n5 min read", "date") == "2023-11-21"

    def test_written_date(self):
        assert extract_value_from_passage(
            "Published on November 21, 2023 by the team", "date") \
            == "November 21, 2023"

    def test_short_month_date(self):
        assert extract_value_from_passage(
            "Last updated Jan 5, 2024", "date") == "Jan 5, 2024"


class TestAuthorExtraction:
    def test_by_author_pattern(self):
        assert extract_value_from_passage(
            "Written by John Smith on the Cloudflare blog", "author") \
            == "John Smith"

    def test_author_colon_pattern(self):
        assert extract_value_from_passage(
            "Author: Jane Doe | Published: 2023", "author") == "Jane Doe"


class TestTitleExtraction:
    def test_from_heading(self):
        assert extract_value_from_passage(
            "# Workers AI Update: Hello, Mistral 7B!\n\n2023-11-21",
            "title") == "Workers AI Update: Hello, Mistral 7B!"

    def test_skips_dates_and_metadata(self):
        passage = ("2023-11-21\n\n5 min read\n\nToday we are excited to "
                   "announce our new feature")
        result = extract_value_from_passage(passage, "title")
        assert "2023-11-21" not in result
        assert "min read" not in result
        assert len(result) > 10


class TestRatingExtraction:
    def test_star_rating(self):
        assert extract_value_from_passage(
            "Rated 4.5 out of 5 stars by users", "rating") == "4.5"

    def test_slash_rating(self):
        assert extract_value_from_passage(
            "Rating: 8.5/10 based on reviews", "rating") == "8.5"


class TestEmailUrlExtraction:
    def test_email(self):
        assert extract_value_from_passage(
            "Contact us at hello@example.com for support", "email") \
            == "hello@example.com"

    def test_url(self):
        assert extract_value_from_passage(
            "Visit our site at https://example.com/page for details",
            "url") == "https://example.com/page"

    def test_image_url(self):
        assert extract_value_from_passage(
            "Main image: https://cdn.example.com/photo.jpg available",
            "image") == "https://cdn.example.com/photo.jpg"


class TestBrandExtraction:
    def test_by_brand_pattern(self):
        assert extract_value_from_passage(
            "Made by Apple for the modern user", "brand") == "Apple"

    def test_capitalized_brand(self):
        assert extract_value_from_passage(
            "Samsung announced their new Galaxy lineup", "brand") \
            == "Samsung"


class TestDefaultExtraction:
    def test_first_sentence_for_unknown_fields(self):
        result = extract_value_from_passage(
            "First sentence here. Second sentence is longer and less "
            "relevant.", "customField")
        assert result == "First sentence here."

    def test_empty_passage(self):
        assert extract_value_from_passage("", "price") == ""
        assert extract_value_from_passage("   ", "title") == ""


# ── smartExtractSchemaFields ────────────────────────────────────────────

def mock_qa(opts):
    return {"answer": opts["content"][:100], "confidence": 0.5}


class TestSmartExtract:
    def test_uses_page_title(self):
        result = smart_extract_schema_fields(
            "Some content here about stuff",
            {"title": "article title or headline"}, mock_qa,
            {"pageTitle":
             "Workers AI Update: Hello, Mistral 7B! - Cloudflare Blog"})
        assert result["title"] == "Workers AI Update: Hello, Mistral 7B!"

    def test_strips_site_suffix(self):
        result = smart_extract_schema_fields(
            "content", {"title": "title"}, mock_qa,
            {"pageTitle": "iPhone 16 - Wikipedia"})
        assert result["title"] == "iPhone 16"

    def test_author_by_pattern(self):
        result = smart_extract_schema_fields(
            "# My Article\n\nby John Smith | November 2023\n\n"
            "Article content here...", {"author": "author name"}, mock_qa)
        assert result["author"] == "John Smith"

    def test_date_from_top(self):
        result = smart_extract_schema_fields(
            "# Workers AI Update\n\n2023-11-21\n\n5 min read\n\n"
            "Content here...", {"date": "publication date"}, mock_qa)
        assert result["date"] == "2023-11-21"

    def test_price_regex(self):
        result = smart_extract_schema_fields(
            "The iPhone 16 starts at $799 for the base model. The Pro "
            "version costs $999.", {"price": "current price"}, mock_qa)
        assert result["price"] == "$799"

    def test_email(self):
        result = smart_extract_schema_fields(
            "Contact us at hello@example.com for more info",
            {"email": "email address"}, mock_qa)
        assert result["email"] == "hello@example.com"

    def test_bm25_fallback_for_summary(self):
        result = smart_extract_schema_fields(
            "A long article about various topics in technology and "
            "science...", {"summary": "article summary"}, mock_qa)
        assert len(result["summary"]) > 0

    def test_brand_from_page_title(self):
        result = smart_extract_schema_fields(
            "Content about the device...", {"brand": "brand name"},
            mock_qa, {"pageTitle": "Apple iPhone 16 - Specifications"})
        assert result["brand"] == "Apple"


class TestSmartExtractPrecision:
    def test_brand_by_pattern_beats_title_word(self):
        result = smart_extract_schema_fields(
            "# IPhone 16\n\n*2024 smartphone by Apple*\n\nThe iPhone 16 "
            "is developed by Apple Inc.", {"brand": "brand name"},
            mock_qa, {"pageTitle": "IPhone 16"})
        assert result["brand"] == "Apple"

    def test_source_from_url_domain(self):
        result = smart_extract_schema_fields(
            "Some content", {"source": "publication name"}, mock_qa,
            {"pageUrl": "https://blog.cloudflare.com/some-post"})
        assert result["source"] == "Blog Cloudflare"

    def test_source_from_title_suffix(self):
        result = smart_extract_schema_fields(
            "Some content", {"source": "publication name"}, mock_qa,
            {"pageTitle": "Some Article - The New York Times",
             "pageUrl": "https://example.com"})
        assert result["source"] == "The New York Times"

    def test_summary_first_substantive_paragraph(self):
        result = smart_extract_schema_fields(
            "# My Title\n\n2023-11-21\n\n5 min read\n\nThis is the actual "
            "first paragraph about something interesting and important.",
            {"summary": "article summary"}, mock_qa)
        assert "This is the actual first paragraph" in result["summary"]
        assert "2023-11-21" not in result["summary"]
        assert "min read" not in result["summary"]

    def test_body_returns_content(self):
        content = ("# Title\n\nParagraph one.\n\nParagraph two.\n\n"
                   "Paragraph three.")
        result = smart_extract_schema_fields(
            content, {"body": "article body"}, mock_qa)
        assert result["body"] == content[:2000]

    def test_tags_from_headings(self):
        result = smart_extract_schema_fields(
            "# Main Title\n\nIntro.\n\n## History\n\nText.\n\n"
            "## Features\n\nText.\n\n## Pricing\n\nText.",
            {"tags": "article tags"}, mock_qa)
        assert "History" in result["tags"]
        assert "Features" in result["tags"]
        assert "Pricing" in result["tags"]


class TestRealQuickAnswerIntegration:
    def test_default_adapter_end_to_end(self):
        """The wired stack: template → quick_answer → value extraction."""
        content = ("# Road Bike X200\n\nby Maria Garcia | March 3, 2024\n\n"
                   "The Road Bike X200 costs $1,499.00 and is rated "
                   "4.8 out of 5 stars by more than two hundred riders.\n\n"
                   "Contact sales@bikes.example.com for fleet pricing.")
        fields = get_schema_template("product")["fields"]
        result = smart_extract_schema_fields(
            content, fields, default_quick_answer_fn,
            {"pageTitle": "Road Bike X200 - Example Bikes",
             "pageUrl": "https://bikes.example.com/x200"})
        assert result["name"] == "Road Bike X200"
        assert result["price"] == "$1,499.00"
        assert result["rating"] == "4.8"
        assert set(result) == set(fields)


# ── schema-templates ────────────────────────────────────────────────────

class TestSchemaTemplates:
    def test_known_name(self):
        template = get_schema_template("product")
        assert template is not None
        assert template["name"] == "Product"
        assert isinstance(template["fields"], dict)

    def test_case_insensitive(self):
        upper = get_schema_template("PRODUCT")
        mixed = get_schema_template("Product")
        lower = get_schema_template("product")
        assert upper is not None and mixed is not None and lower is not None
        assert upper["fields"] == lower["fields"]
        assert mixed["fields"] == lower["fields"]

    def test_unknown_name(self):
        assert get_schema_template("nonexistent-template-xyz") is None

    def test_json_string(self):
        assert get_schema_template('{"foo":"bar"}') is None

    def test_json_array_string(self):
        assert get_schema_template('[{"foo":"bar"}]') is None

    def test_list_templates(self):
        names = list_schema_templates()
        for expected in ("product", "article", "listing", "contact",
                         "event", "recipe", "job", "review"):
            assert expected in names
        assert len(names) == len(SCHEMA_TEMPLATES)

    def test_all_templates_have_fields(self):
        for key, template in SCHEMA_TEMPLATES.items():
            assert template["fields"], key
            for field_key, field_desc in template["fields"].items():
                assert isinstance(field_desc, str) and field_desc, \
                    f"{key}.{field_key}"

    def test_product_fields(self):
        t = get_schema_template("product")
        for f in ("name", "price", "description", "brand", "rating",
                  "availability"):
            assert f in t["fields"]

    def test_article_fields(self):
        t = get_schema_template("article")
        for f in ("title", "author", "date", "summary", "body"):
            assert f in t["fields"]

    def test_article_template_for_bm25(self):
        t = get_schema_template("article")
        assert t is not None
        assert t["fields"]["title"]
        assert t["fields"]["author"]
        assert t["fields"]["date"]
