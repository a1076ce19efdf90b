"""Reference-suite port: src/tests/markdown.test.ts (44 cases) against
pure/markdown — filterByTags include/exclude/selector semantics,
detectMainContent, calculateQuality, estimateTokens,
truncateToTokenBudget, cleanMarkdownNoise."""

import re

from webpeel_spark.pure.markdown import (
    calculate_quality,
    clean_markdown_noise,
    detect_main_content,
    estimate_tokens,
    filter_by_tags,
    truncate_to_token_budget,
)


def wrap(inner):
    return f"<html><body>{inner}</body></html>"


# ── filterByTags ─────────────────────────────────────────────────────────

def test_filter_by_article_tag():
    html = wrap("<nav>Navigation</nav><article>Main article content"
                "</article><footer>Footer</footer>")
    r = filter_by_tags(html, ["article"])
    assert "Main article content" in r
    assert "Navigation" not in r and "Footer" not in r


def test_filter_by_main_tag():
    html = wrap("<header>Header</header><main>Main content here</main>"
                "<aside>Sidebar</aside>")
    r = filter_by_tags(html, ["main"])
    assert "Main content here" in r
    assert "Header" not in r and "Sidebar" not in r


def test_filter_by_class_selector():
    html = wrap('<div class="sidebar">Sidebar content</div>'
                '<div class="content">Main content</div>'
                '<div class="ads">Advertisements</div>')
    r = filter_by_tags(html, [".content"])
    assert "Main content" in r
    assert "Sidebar content" not in r and "Advertisements" not in r


def test_filter_by_id_selector():
    html = wrap('<div id="header">Header</div>'
                '<div id="main">Main content area</div>'
                '<div id="footer">Footer</div>')
    r = filter_by_tags(html, ["#main"])
    assert "Main content area" in r
    assert "Header" not in r and "Footer" not in r


def test_filter_multiple_includes():
    html = wrap("<nav>Nav</nav><article>Article 1</article>"
                "<main>Main content</main><footer>Footer</footer>")
    r = filter_by_tags(html, ["article", "main"])
    assert "Article 1" in r and "Main content" in r
    assert "Nav" not in r and "Footer" not in r


def test_filter_empty_includes_returns_full():
    html = wrap("<article>Content</article>")
    assert "Content" in filter_by_tags(html, [])


def test_filter_none_includes_returns_full():
    html = wrap("<article>Content</article>")
    assert "Content" in filter_by_tags(html, None)


def test_exclude_tags():
    html = wrap("<nav>Navigation</nav><article>Main content</article>"
                "<footer>Footer</footer>")
    r = filter_by_tags(html, None, ["nav", "footer"])
    assert "Main content" in r
    assert "Navigation" not in r and "Footer" not in r


def test_exclude_multiple_tags():
    html = ("<html><head><script>alert('hi')</script></head><body>"
            "<nav>Nav</nav><aside>Sidebar</aside>"
            "<article>Content</article><footer>Footer</footer>"
            "</body></html>")
    r = filter_by_tags(html, None, ["nav", "aside", "footer", "script"])
    assert "Content" in r
    for gone in ("Nav", "Sidebar", "Footer", "alert"):
        assert gone not in r


def test_exclude_css_selectors():
    html = wrap('<div class="ad">Advertisement</div>'
                '<div class="content">Main content</div>'
                '<div class="banner">Banner</div>')
    r = filter_by_tags(html, None, [".ad", ".banner"])
    assert "Main content" in r
    assert "Advertisement" not in r and "Banner" not in r


def test_exclude_empty_array():
    assert "Content" in filter_by_tags(wrap("<article>Content</article>"),
                                       None, [])


def test_exclude_none():
    assert "Content" in filter_by_tags(wrap("<article>Content</article>"),
                                       None, None)


def test_exclude_applied_before_include():
    html = wrap("<article><nav>Article nav</nav>"
                "<p>Article content</p></article>")
    r = filter_by_tags(html, ["article"], ["nav"])
    assert "Article content" in r
    assert "Article nav" not in r


def test_content_within_matched_tags_preserved():
    html = wrap("<article><h1>Title</h1><p>Paragraph 1</p>"
                '<p>Paragraph 2</p><img src="test.jpg" alt="Test" />'
                '<a href="/link">Link</a></article>')
    r = filter_by_tags(html, ["article"])
    for kept in ("Title", "Paragraph 1", "Paragraph 2", "test.jpg", "Link"):
        assert kept in r


def test_includes_match_nothing_returns_empty():
    assert filter_by_tags(wrap("<div>Content</div>"), ["article"]) == ""


def test_complex_nested_structures():
    html = wrap('<div class="container"><nav>Nav</nav><main><article>'
                "<header>Article header</header>"
                "<section>Article content</section></article></main>"
                "<aside>Sidebar</aside></div>")
    r = filter_by_tags(html, ["article"], ["nav", "aside", "header"])
    assert "Article content" in r
    for gone in ("Nav", "Sidebar", "Article header"):
        assert gone not in r


def test_attribute_selectors():
    html = wrap('<div role="main">Main content</div>'
                '<div role="navigation">Nav</div>')
    r = filter_by_tags(html, ['[role="main"]'])
    assert "Main content" in r and "Nav" not in r


# ── detectMainContent ────────────────────────────────────────────────────

def test_detect_article_role_main():
    html = wrap('<nav>Nav content</nav><article role="main">This is the '
                "main article content with sufficient length to be "
                "detected as meaningful content area. Adding more text to "
                "exceed the minimum character requirement of one hundred "
                "characters for proper detection by the algorithm."
                "</article>")
    content, detected = detect_main_content(html)
    assert detected is True
    assert "main article content" in content
    assert "Nav content" not in content


def test_detect_main_article():
    html = wrap("<main><article>Article inside main with plenty of text "
                "to make it meaningful and worth extracting. Here is more "
                "content padding to ensure we cross the minimum threshold "
                "for detection.</article></main>")
    content, detected = detect_main_content(html)
    assert detected is True and "Article inside main" in content


def test_detect_standalone_article():
    html = wrap("<header>Header</header><article>Standalone article with "
                "enough content to be detected as the main content area of "
                "the page. Here is more content padding to ensure we cross "
                "the minimum threshold.</article><footer>Footer</footer>")
    content, detected = detect_main_content(html)
    assert detected is True and "Standalone article" in content


def test_detect_main_tag():
    html = wrap("<header>Header</header><main>Main content area with "
                "substantial text that makes it the primary content of "
                "this webpage. Here is more content padding to ensure we "
                "cross the minimum threshold.</main>"
                "<footer>Footer</footer>")
    content, detected = detect_main_content(html)
    assert detected is True and "Main content area" in content


def test_detect_skips_short_main():
    html = wrap("<article>Short</article><div>This is a much longer "
                "content block that contains substantial text and should "
                "be detected as the main content area.</div>")
    content, _ = detect_main_content(html)
    assert "much longer content block" in content


def test_detect_falls_back_to_largest_block():
    html = wrap("<div>Short div</div><section>This section contains a lot "
                "of text that makes it the primary content. It has many "
                "words and sentences that provide value to readers. This "
                "is definitely the main content area that should be "
                "extracted.</section><div>Another short div</div>")
    content, _ = detect_main_content(html)
    assert "section contains a lot of text" in content


def test_detect_nothing_returns_full():
    html = wrap("<div>Short 1</div><div>Short 2</div>")
    content, detected = detect_main_content(html)
    assert detected is False
    assert "Short 1" in content and "Short 2" in content


# ── calculateQuality ─────────────────────────────────────────────────────

def test_quality_in_unit_interval():
    q = calculate_quality("Some markdown content",
                          "<html><body><p>Some markdown content</p>"
                          "</body></html>")
    assert 0 <= q <= 1


def test_quality_zero_for_empty():
    assert calculate_quality("", "<html></html>") == 0


def test_quality_low_for_very_short():
    q = calculate_quality("abc", "<html><body><p>abc</p></body></html>")
    assert q < 0.5


def test_quality_high_for_good_extraction():
    good = ("# Main Article\n\nThis is a good article with meaningful "
            "content. It has paragraphs and structure.")
    html = ("<html><head><script>lots of js</script></head><body>"
            "<nav>nav</nav><article><h1>Main Article</h1><p>This is a "
            "good article with meaningful content. It has paragraphs and "
            "structure.</p></article><footer>footer</footer></body></html>")
    assert calculate_quality(good, html) > 0.5


def test_quality_penalizes_poor_extraction():
    poor = ("<html><head><script>code</script></head><body><nav>nav</nav>"
            "<p>Content</p></body></html>")
    assert calculate_quality(poor, poor) < 0.8


# ── estimateTokens ───────────────────────────────────────────────────────

def test_estimate_short():
    assert 0 < estimate_tokens("Hello world") < 10


def test_estimate_longer():
    assert estimate_tokens(
        "This is a much longer piece of text that contains multiple "
        "sentences and should result in more tokens being estimated.") > 20


def test_estimate_empty_zero():
    assert estimate_tokens("") == 0


# ── truncateToTokenBudget ────────────────────────────────────────────────

def test_truncate_under_budget_unchanged():
    assert truncate_to_token_budget("Short content", 100) == "Short content"


def test_truncate_over_budget():
    content = "A" * 1000
    r = truncate_to_token_budget(content, 50)
    assert len(r) < len(content)
    assert "truncated" in r


def test_truncate_preserves_first_heading():
    content = ("# Main Title\n\nParagraph 1\n\n## Section 2\n\n"
               "Paragraph 2\n\n" + "A" * 1000)
    r = truncate_to_token_budget(content, 50)
    assert "# Main Title" in r and "truncated" in r


def test_truncate_notice_text():
    r = truncate_to_token_budget("A" * 1000, 50)
    assert "[Content truncated to ~50 tokens]" in r


# ── cleanMarkdownNoise ───────────────────────────────────────────────────

def test_noise_removes_empty_links():
    r = clean_markdown_noise(
        "Some text [](https://example.com) more text")
    assert "[](" not in r
    assert "Some text" in r and "more text" in r


def test_noise_removes_empty_links_with_spaces():
    r = clean_markdown_noise("Text [  ](https://example.com) end")
    assert "[  ](" not in r
    assert "Text" in r and "end" in r


def test_noise_removes_image_only_links():
    r = clean_markdown_noise(
        "Content [![](https://img.example.com/icon.png)]"
        "(https://example.com) more")
    assert "[![](" not in r
    assert "Content" in r and "more" in r


def test_noise_collapses_newlines():
    r = clean_markdown_noise(
        "Paragraph one\n\n\n\nParagraph two\n\n\n\n\nParagraph three")
    assert not re.search(r"\n{3,}", r)
    for p in ("Paragraph one", "Paragraph two", "Paragraph three"):
        assert p in r


def test_noise_strips_trailing_line_whitespace():
    r = clean_markdown_noise(
        "Line with spaces   \nAnother line\t  \nClean line")
    assert all(line == line.rstrip() for line in r.split("\n"))


def test_noise_trims_whole_string():
    assert clean_markdown_noise("\n\nSome content\n\n") == "Some content"


def test_noise_preserves_normal_links():
    r = clean_markdown_noise("Click [here](https://example.com) to continue")
    assert "[here](https://example.com)" in r


def test_noise_preserves_inline_images():
    r = clean_markdown_noise(
        "An image: ![logo](https://example.com/logo.png) done")
    assert "![logo](https://example.com/logo.png)" in r
