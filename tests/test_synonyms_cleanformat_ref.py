"""Reference-suite ports: src/tests/synonyms.test.ts (16 cases) and
src/tests/clean-format.test.ts (13 cases) against pure/synonyms and
pure/markdown.clean_for_ai."""

from webpeel_spark.pure.markdown import clean_for_ai
from webpeel_spark.pure.stemmer import stem
from webpeel_spark.pure.synonyms import (
    STEMMED_SYNONYM_GROUPS, SYNONYM_GROUPS, expand_with_synonyms,
)


# ── SYNONYM_GROUPS structure ─────────────────────────────────────────────

def test_groups_non_empty():
    assert len(SYNONYM_GROUPS) > 10


def test_each_group_at_least_two_words():
    assert all(len(g) >= 2 for g in SYNONYM_GROUPS)


def test_stemmed_groups_same_length():
    assert len(STEMMED_SYNONYM_GROUPS) == len(SYNONYM_GROUPS)


def test_stemmed_words_lowercase():
    for group in STEMMED_SYNONYM_GROUPS:
        for word in group:
            assert word == word.lower()


# ── expandWithSynonyms — basic ───────────────────────────────────────────

def test_original_terms_weight_one():
    result = expand_with_synonyms(["price"])
    originals = [e for e in result if e.is_original]
    assert originals and originals[0].weight == 1.0


def test_synonyms_weight_half():
    synonyms = [e for e in expand_with_synonyms(["price"])
                if not e.is_original]
    assert synonyms
    assert all(e.weight == 0.5 for e in synonyms)


def test_originals_always_included():
    terms = ["price", "build"]
    out = [e.term for e in expand_with_synonyms(terms)]
    assert all(t in out for t in terms)


def test_no_duplicates():
    terms = [e.term for e in expand_with_synonyms(["price", "cost"])]
    assert len(terms) == len(set(terms))


def test_empty_input():
    assert expand_with_synonyms([]) == []


def test_unknown_term_only_original():
    result = expand_with_synonyms(["xyzunknown"])
    assert len(result) == 1
    assert result[0].term == "xyzunknown" and result[0].is_original


# ── specific synonym groups ──────────────────────────────────────────────

def test_cost_expands_to_price_terms():
    terms = [e.term for e in expand_with_synonyms([stem("cost")])]
    assert (stem("price") in terms or stem("fee") in terms
            or stem("rate") in terms)


def test_install_setup_same_group():
    terms = [e.term for e in expand_with_synonyms([stem("install")])]
    assert stem("setup") in terms


def test_advantage_benefit_same_group():
    terms = [e.term for e in expand_with_synonyms([stem("advantage")])]
    assert stem("benefit") in terms


def test_error_bug_synonyms():
    terms = [e.term for e in expand_with_synonyms([stem("error")])]
    assert stem("bug") in terms


def test_multiple_terms_expand_respective_sets():
    expanded = [e.term
                for e in expand_with_synonyms([stem("price"), stem("install")])]
    assert stem("cost") in expanded
    assert stem("setup") in expanded


def test_stemmed_roundtrip():
    assert stem("pricing") == stem("price")
    r1 = sorted(e.term for e in expand_with_synonyms([stem("pricing")]))
    r2 = sorted(e.term for e in expand_with_synonyms([stem("price")]))
    assert r1 == r2


# ── cleanForAI ───────────────────────────────────────────────────────────

def test_links_to_plain_text():
    assert clean_for_ai("[Google](https://google.com)") == "Google"


def test_images_to_descriptive_text():
    assert clean_for_ai("![Logo](https://example.com/logo.png)") \
        == "[Image: Logo]"


def test_images_without_alt_removed():
    assert clean_for_ai("![](https://example.com/spacer.gif)") == ""


def test_headings_preserved():
    assert clean_for_ai("## Hello World\n\nSome text") \
        == "## Hello World\n\nSome text"


def test_bold_italic_preserved():
    assert clean_for_ai("**bold** and *italic*") == "**bold** and *italic*"


def test_code_blocks_preserved():
    s = "```javascript\nconst x = 1;\n```"
    assert clean_for_ai(s) == s


def test_lists_preserved():
    assert clean_for_ai("- item 1\n- item 2") == "- item 1\n- item 2"


def test_reference_link_definitions_removed():
    assert clean_for_ai("[ref]: https://example.com") == ""


def test_citation_references_removed():
    assert clean_for_ai("Einstein proposed[1] this theory[2].") \
        == "Einstein proposed this theory."


def test_standalone_bare_urls_removed():
    assert clean_for_ai("Visit:\nhttps://example.com\nfor more") \
        == "Visit:\n\nfor more"


def test_html_comments_removed():
    assert clean_for_ai("before <!-- comment --> after") == "before  after"


def test_excessive_newlines_collapsed():
    assert clean_for_ai("a\n\n\n\n\nb") == "a\n\nb"


def test_complex_real_world_content():
    content = """# Web Scraping

[Web scraping](https://en.wikipedia.org/wiki/Web_scraping) is [data extraction](https://example.com/data) used for websites.[1][2]

![diagram](https://example.com/diagram.png)

## Techniques

- [Crawl4AI](https://github.com/crawl4ai) — open source
- [Firecrawl](https://firecrawl.dev) — managed service

[1]: https://example.com/ref1
[2]: https://example.com/ref2"""
    result = clean_for_ai(content)
    assert "# Web Scraping" in result
    assert "Web scraping is data extraction used for websites." in result
    assert "Crawl4AI — open source" in result
    assert "https://" not in result
    assert "](" not in result
