"""Reference-suite port: structured-extract
(src/tests/structured-extract.test.ts, case-for-case).

The LLM-transport cases (mocked fetch to openai/anthropic, router
integration) are N/A — external service — but their PURE substance
(code-fence JSON parsing, schema type coercion, null for missing
fields, required-field accounting) is covered directly against
parse_llm_json / validate_and_coerce, which is the exact code the
reference exercises through its mock."""

from __future__ import annotations

import pytest

from webpeel_spark.pure.structured_extract import (
    coerce_value,
    extract_structured,
    heuristic_extract_boolean,
    heuristic_extract_number,
    heuristic_extract_string,
    is_type_schema,
    parse_llm_json,
    simple_to_extraction_schema,
    validate_and_coerce,
)

SAMPLE_CONTENT = """
# Acme Corp

Acme Corp is an open source company building AI-powered tools.

**Company Mission**: To make AI accessible to everyone.

**Is Open Source**: Yes, our core product is open source.

**Employees**: 42

**Founded**: 2020
"""

SAMPLE_SCHEMA = {
    "type": "object",
    "properties": {
        "company_mission": {"type": "string",
                            "description": "The company mission statement"},
        "is_open_source": {"type": "boolean",
                           "description": "Whether the product is open source"},
        "employees": {"type": "number",
                      "description": "Number of employees"},
    },
}


# ── simpleToExtractionSchema ────────────────────────────────────────────

class TestSimpleToExtractionSchema:
    def test_converts_map(self):
        result = simple_to_extraction_schema(
            {"company_name": "string", "is_active": "boolean",
             "score": "number"})
        assert result["type"] == "object"
        assert result["properties"]["company_name"] == {"type": "string"}
        assert result["properties"]["is_active"] == {"type": "boolean"}
        assert result["properties"]["score"] == {"type": "number"}

    def test_empty_input(self):
        result = simple_to_extraction_schema({})
        assert result["type"] == "object"
        assert len(result["properties"]) == 0

    def test_preserves_field_names(self):
        fields = {"a": "string", "b": "boolean", "c": "number",
                  "d": "array", "e": "object"}
        result = simple_to_extraction_schema(fields)
        assert list(result["properties"]) == ["a", "b", "c", "d", "e"]


# ── isTypeSchema ────────────────────────────────────────────────────────

class TestIsTypeSchema:
    def test_type_name_values(self):
        assert is_type_schema({"name": "string", "active": "boolean",
                               "count": "number"}) is True

    def test_array_and_object(self):
        assert is_type_schema({"items": "array", "meta": "object"}) is True

    def test_css_selectors(self):
        assert is_type_schema({"title": "h1", "price": ".price-tag"}) is False

    def test_mixed_values(self):
        assert is_type_schema({"name": "string", "title": "h1"}) is False

    def test_empty_object(self):
        assert is_type_schema({}) is False

    def test_non_string_values(self):
        assert is_type_schema({"count": "string", "valid": "boolean"}) is True
        assert is_type_schema({"count": 42}) is False


# ── empty content ───────────────────────────────────────────────────────

class TestEmptyContent:
    def test_empty_string(self):
        result = extract_structured("", SAMPLE_SCHEMA)
        assert result["data"] == {}
        assert result["confidence"] == 0
        assert result["tokensUsed"] == 0

    def test_whitespace_only(self):
        result = extract_structured("   \n\t  ", SAMPLE_SCHEMA)
        assert result["data"] == {}
        assert result["confidence"] == 0


# ── schema validation ───────────────────────────────────────────────────

class TestSchemaValidation:
    def test_null_schema(self):
        with pytest.raises(ValueError, match="Invalid schema"):
            extract_structured("content", None)

    def test_non_object_type(self):
        with pytest.raises(ValueError, match="Invalid schema"):
            extract_structured("content",
                               {"type": "array", "properties": {}})

    def test_missing_properties(self):
        with pytest.raises(ValueError, match="Invalid schema"):
            extract_structured("content", {"type": "object"})


# ── heuristic extraction ────────────────────────────────────────────────

class TestHeuristicExtraction:
    def test_string_fields(self):
        result = extract_structured(SAMPLE_CONTENT, SAMPLE_SCHEMA)
        assert result["tokensUsed"] == 0
        assert result["confidence"] > 0
        assert result["confidence"] <= 0.75

    def test_boolean_positive(self):
        content = "is_open_source: Yes, this is fully open source."
        schema = {"type": "object",
                  "properties": {"is_open_source": {"type": "boolean"}}}
        result = extract_structured(content, schema)
        assert result["data"]["is_open_source"] is True

    def test_boolean_negative(self):
        content = "is_open_source: No, this is proprietary software."
        schema = {"type": "object",
                  "properties": {"is_open_source": {"type": "boolean"}}}
        result = extract_structured(content, schema)
        assert result["data"]["is_open_source"] is False

    def test_number_fields(self):
        content = "employees: 42\nfounded: 2020"
        schema = {"type": "object",
                  "properties": {"employees": {"type": "number"},
                                 "founded": {"type": "number"}}}
        result = extract_structured(content, schema)
        assert result["data"]["employees"] == 42
        assert result["data"]["founded"] == 2020

    def test_missing_fields_null(self):
        content = "This is a page about cats."
        schema = {"type": "object",
                  "properties": {"company_mission": {"type": "string"}}}
        result = extract_structured(content, schema)
        assert result["data"]["company_mission"] is None

    def test_confidence_proportional_to_fill(self):
        content = "company_mission: Build great things.\nemployees: 10"
        result = extract_structured(content, SAMPLE_SCHEMA)
        assert 0.3 <= result["confidence"] <= 0.5

    def test_json_like_string_fields(self):
        content = '"company_mission": "To innovate and inspire."'
        schema = {"type": "object",
                  "properties": {"company_mission": {"type": "string"}}}
        result = extract_structured(content, schema)
        assert isinstance(result["data"]["company_mission"], str)

    def test_confidence_point_one_when_nothing_found(self):
        content = ("A page with completely unrelated content about the "
                   "weather.")
        schema = {"type": "object",
                  "properties": {"turnip_count": {"type": "number"},
                                 "pixel_density": {"type": "number"}}}
        result = extract_structured(content, schema)
        assert result["confidence"] == pytest.approx(0.1)


# ── coercion + model-JSON parsing (substance of the LLM-path cases) ─────

class TestCoercion:
    def test_string_to_boolean(self):
        assert coerce_value("true", "boolean") is True
        assert coerce_value("yes", "boolean") is True
        assert coerce_value("no", "boolean") is False
        assert coerce_value("maybe", "boolean") is None

    def test_number_string_to_number(self):
        assert coerce_value("42", "number") == 42
        assert coerce_value("1,234.5", "number") == 1234.5
        assert coerce_value("n/a", "number") is None

    def test_array_wrap(self):
        assert coerce_value("x", "array") == ["x"]
        assert coerce_value([1, 2], "array") == [1, 2]

    def test_object_passthrough(self):
        assert coerce_value({"a": 1}, "object") == {"a": 1}
        assert coerce_value("x", "object") is None

    def test_missing_fields_coerce_to_null(self):
        data, missing = validate_and_coerce(
            {"company_mission": "Test"}, SAMPLE_SCHEMA)
        assert data["company_mission"] == "Test"
        assert data["is_open_source"] is None
        assert data["employees"] is None
        assert missing == []

    def test_required_field_accounting(self):
        schema = {"type": "object",
                  "properties": {"a": {"type": "string"},
                                 "b": {"type": "string"}},
                  "required": ["b"]}
        data, missing = validate_and_coerce({"a": "x"}, schema)
        assert missing == ["b"]


class TestParseLlmJson:
    def test_code_fence(self):
        text = '```json\n{"a": 1, "b": "two"}\n```'
        assert parse_llm_json(text) == {"a": 1, "b": "two"}

    def test_bare_fence(self):
        text = '```\n{"a": true}\n```'
        assert parse_llm_json(text) == {"a": True}

    def test_raw_json(self):
        assert parse_llm_json('  {"x": null} ') == {"x": None}

    def test_embedded_object(self):
        text = 'Here is the data: {"k": "v"} as requested.'
        assert parse_llm_json(text) == {"k": "v"}

    def test_unparseable_raises(self):
        with pytest.raises(ValueError, match="Could not parse JSON"):
            parse_llm_json("Sorry, I cannot extract that data.")


# ── edge cases ──────────────────────────────────────────────────────────

class TestEdgeCases:
    def test_required_fields_schema(self):
        schema = {"type": "object",
                  "properties": {"name": {"type": "string"},
                                 "required_field": {"type": "string"}},
                  "required": ["required_field"]}
        result = extract_structured("name: Test Company", schema)
        assert result["data"]["required_field"] is None

    def test_markdown_bold_pattern(self):
        content = "**Company Mission**: To revolutionize data extraction."
        schema = {"type": "object",
                  "properties": {"company_mission": {"type": "string"}}}
        result = extract_structured(content, schema)
        assert result["confidence"] >= 0.3

    def test_tokens_used_zero(self):
        result = extract_structured(SAMPLE_CONTENT, SAMPLE_SCHEMA)
        assert result["tokensUsed"] == 0

    def test_colon_separated_values(self):
        content = "employees: 150\nfounded: 2018\nrevenue: 5000000"
        schema = {"type": "object",
                  "properties": {"employees": {"type": "number"},
                                 "founded": {"type": "number"}}}
        result = extract_structured(content, schema)
        assert result["data"]["employees"] == 150
        assert result["data"]["founded"] == 2018

    def test_single_field_schema(self):
        schema = {"type": "object",
                  "properties": {"title": {"type": "string"}}}
        result = extract_structured("# My Title\nSome content", schema)
        assert result["confidence"] > 0


# ── concept-aware extractor spot checks (behavior pins) ─────────────────

class TestConceptExtractors:
    def test_company_from_title(self):
        md = "# Acme Corp — Home\nWelcome to our site."
        assert heuristic_extract_string("company", md) == "Acme Corp"

    def test_title_strips_markdown(self):
        md = "# 📦 [my-pkg](https://example.com/pkg) **v2**"
        assert heuristic_extract_string("title", md) == "my-pkg v2"

    def test_version(self):
        assert heuristic_extract_string(
            "version", "**Version:** 2.14.1") == "2.14.1"

    def test_date_iso(self):
        assert heuristic_extract_string(
            "published_date", "released 2024-03-01 worldwide") == "2024-03-01"

    def test_price(self):
        assert heuristic_extract_string(
            "price", "It costs $1,299.00 / month today") \
            == "$1,299.00 / month"

    def test_stars_string_and_number(self):
        md = "⭐ 12,345 stars · 🍴 678 forks"
        assert heuristic_extract_string("stars", md) == "12345"
        assert heuristic_extract_number("stars", md) == 12345
        assert heuristic_extract_number("forks", md) == 678

    def test_founded_year_context(self):
        md = "The studio was founded in 1997 by two artists."
        assert heuristic_extract_number("founded_year", md) == 1997

    def test_free_tier_boolean(self):
        assert heuristic_extract_boolean(
            "has_free_tier", "We offer a generous free plan.") is True
        assert heuristic_extract_boolean(
            "has_free_tier", "Paid only, no free option.") is False

    def test_domain_hints_overlay(self):
        schema = {"type": "object",
                  "properties": {"stars": {"type": "number"},
                                 "language": {"type": "string"}}}
        result = extract_structured("no signals here at all", schema,
                                    domain_hints={"stars": "9001",
                                                  "language": "Rust"})
        assert result["data"]["stars"] == 9001
        assert result["data"]["language"] == "Rust"
        assert result["confidence"] == 0.9
