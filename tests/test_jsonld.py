"""JSON-LD converter tests (json-ld.ts behaviours)."""

import json

from webpeel_spark.pure.jsonld import (
    extract_jsonld,
    parse_availability,
    parse_iso8601_duration,
)


def _page(payload) -> str:
    return (
        '<html><head><script type="application/ld+json">'
        + json.dumps(payload)
        + "</script></head><body></body></html>"
    )


class TestDuration:
    def test_minutes(self):
        assert parse_iso8601_duration("PT20M") == "20 min"

    def test_hours_minutes(self):
        assert parse_iso8601_duration("PT1H30M") == "1 hr 30 min"

    def test_days_hours(self):
        assert parse_iso8601_duration("P2DT3H") == "2 days 3 hr"

    def test_seconds_only(self):
        assert parse_iso8601_duration("PT45S") == "45 sec"

    def test_unparseable_passthrough(self):
        assert parse_iso8601_duration("whenever") == "whenever"


class TestAvailability:
    def test_camel_split(self):
        assert parse_availability("https://schema.org/InStock") == "In Stock"
        assert parse_availability("https://schema.org/OutOfStock") == "Out Of Stock"


class TestRecipe:
    def test_full_recipe(self):
        r = extract_jsonld(_page({
            "@type": "Recipe", "name": "Cake", "description": "Tasty.",
            "recipeIngredient": ["1 cup flour", "2 eggs"],
            "recipeInstructions": [
                {"@type": "HowToStep", "text": "Mix."},
                {"@type": "HowToStep", "text": "Bake."},
            ],
            "prepTime": "PT20M", "cookTime": "PT1H30M",
            "recipeYield": "8 servings",
            "nutrition": {"calories": "320 kcal"},
            "aggregateRating": {"ratingValue": 4.5, "ratingCount": 12},
            "author": {"name": "Chef"},
        }))
        assert r.type == "Recipe"
        assert r.title == "Cake"
        assert "# Cake" in r.content
        assert "**Prep Time:** 20 min | **Cook Time:** 1 hr 30 min" in r.content
        assert "- 1 cup flour" in r.content
        assert "1. Mix." in r.content and "2. Bake." in r.content
        assert "Rating: 4.5/5 (12 reviews)" in r.content

    def test_recipe_requires_ingredients(self):
        assert extract_jsonld(_page({"@type": "Recipe", "name": "X"})) is None


class TestProduct:
    def test_lowest_offer_price(self):
        r = extract_jsonld(_page({
            "@type": "Product", "name": "Widget",
            "offers": [{"price": "19.99", "priceCurrency": "USD"},
                       {"price": "14.99", "priceCurrency": "USD",
                        "availability": "https://schema.org/InStock"}],
        }))
        assert "**Price:** 14.99 USD" in r.content
        assert "**Availability:** In Stock" in r.content


class TestArticle:
    def test_requires_body(self):
        assert extract_jsonld(_page({"@type": "Article", "headline": "H"})) is None

    def test_with_body(self):
        r = extract_jsonld(_page({
            "@type": "NewsArticle", "headline": "Big News",
            "articleBody": "The full body text.",
            "author": {"name": "Rep"}, "datePublished": "2024-01-01",
        }))
        assert r.type == "NewsArticle"
        assert "# Big News" in r.content
        assert "By Rep | Published: 2024-01-01" in r.content
        assert "The full body text." in r.content


class TestFAQ:
    def test_faq(self):
        r = extract_jsonld(_page({
            "@type": "FAQPage",
            "mainEntity": [
                {"@type": "Question", "name": "Why?",
                 "acceptedAnswer": {"text": "Because of reasons that are long enough."}},
                {"@type": "Question", "name": "How?",
                 "acceptedAnswer": {"text": "Like this, with plenty of detail included."}},
            ],
        }))
        assert r.type == "FAQPage"
        assert "## Why?" in r.content and "## How?" in r.content


class TestGraphAndHtmlStripping:
    def test_graph_flattened(self):
        r = extract_jsonld(_page({
            "@graph": [
                {"@type": "WebSite", "name": "S"},
                {"@type": "HowTo", "name": "Fix It",
                 "step": [{"@type": "HowToStep", "text": "Do the thing."}]},
            ]
        }))
        assert r.type == "HowTo"
        assert "1. Do the thing." in r.content

    def test_html_in_fields_stripped(self):
        r = extract_jsonld(_page({
            "@type": "Event", "name": "Show",
            "description": "<p>An <b>event</b> &amp; more</p>",
            "startDate": "2024-06-01",
        }))
        assert "An event & more" in r.content
        assert "<p>" not in r.content

    def test_malformed_skipped(self):
        html = ('<html><head><script type="application/ld+json">{bad json'
                "</script></head><body></body></html>")
        assert extract_jsonld(html) is None
