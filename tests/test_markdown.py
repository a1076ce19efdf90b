"""markdown.py tests — ported from src/tests/markdown.test.ts (case list
at :9-575): filterByTags, detectMainContent, calculateQuality,
estimateTokens, truncateToTokenBudget, cleanMarkdownNoise, plus
htmlToMarkdown conversion invariants."""

import pytest

from webpeel_spark.pure.markdown import (
    calculate_quality,
    clean_for_ai,
    clean_markdown_noise,
    detect_main_content,
    estimate_tokens,
    filter_by_tags,
    html_to_markdown,
    html_to_text,
    select_content,
    truncate_to_token_budget,
)


class TestFilterByTags:
    def test_by_tag_article(self):
        html = "<html><body><nav>Navigation</nav><article>Main article content</article><footer>Footer</footer></body></html>"
        r = filter_by_tags(html, ["article"])
        assert "Main article content" in r
        assert "Navigation" not in r
        assert "Footer" not in r

    def test_by_tag_main(self):
        html = "<html><body><header>Header</header><main>Main content here</main><aside>Sidebar</aside></body></html>"
        r = filter_by_tags(html, ["main"])
        assert "Main content here" in r
        assert "Header" not in r
        assert "Sidebar" not in r

    def test_by_class(self):
        html = '<html><body><div class="sidebar">Sidebar content</div><div class="content">Main content</div><div class="ads">Advertisements</div></body></html>'
        r = filter_by_tags(html, [".content"])
        assert "Main content" in r
        assert "Sidebar content" not in r
        assert "Advertisements" not in r

    def test_by_id(self):
        html = '<html><body><div id="header">Header</div><div id="main">Main content area</div><div id="footer">Footer</div></body></html>'
        r = filter_by_tags(html, ["#main"])
        assert "Main content area" in r
        assert "Header" not in r
        assert "Footer" not in r

    def test_multiple_includes(self):
        html = "<html><body><nav>Nav</nav><article>Article 1</article><main>Main content</main><footer>Footer</footer></body></html>"
        r = filter_by_tags(html, ["article", "main"])
        assert "Article 1" in r
        assert "Main content" in r
        assert "Nav" not in r
        assert "Footer" not in r

    def test_empty_includes_returns_full(self):
        html = "<html><body><article>Content</article></body></html>"
        assert "Content" in filter_by_tags(html, [])
        assert "Content" in filter_by_tags(html, None)

    def test_exclude(self):
        html = "<html><body><nav>Navigation</nav><article>Main content</article><footer>Footer</footer></body></html>"
        r = filter_by_tags(html, None, ["nav", "footer"])
        assert "Main content" in r
        assert "Navigation" not in r
        assert "Footer" not in r

    def test_exclude_before_include(self):
        html = '<html><body><article><div class="ads">Ads inside article</div>Real content</article></body></html>'
        r = filter_by_tags(html, ["article"], [".ads"])
        assert "Real content" in r
        assert "Ads inside article" not in r

    def test_include_no_match_returns_empty(self):
        html = "<html><body><div>Stuff</div></body></html>"
        assert filter_by_tags(html, ["article"]) == ""


class TestSelectContent:
    def test_selects_matching(self):
        html = '<html><body><div class="a">AAA</div><div class="b">BBB</div></body></html>'
        r = select_content(html, ".a")
        assert "AAA" in r and "BBB" not in r

    def test_fallback_to_full_page(self):
        html = '<html><body><div class="a">AAA</div></body></html>'
        assert select_content(html, ".missing") == html


class TestDetectMainContent:
    def test_article_role_main(self):
        html = '<html><body><nav>Nav content</nav><article role="main">This is the main article content with sufficient length to be detected as meaningful content area. Adding more text to exceed the minimum character requirement of one hundred characters for proper detection by the algorithm.</article></body></html>'
        html_out, detected = detect_main_content(html)
        assert detected
        assert "main article content" in html_out
        assert "Nav content" not in html_out

    def test_main_article(self):
        html = "<html><body><main><article>Article inside main with plenty of text to make it meaningful and worth extracting. Here is more content padding to ensure we cross the minimum threshold for detection.</article></main></body></html>"
        html_out, detected = detect_main_content(html)
        assert detected
        assert "Article inside main" in html_out

    def test_main_tag(self):
        html = "<html><body><header>Header</header><main>Main content area with substantial text that makes it the primary content of this webpage. Here is more content padding to ensure we cross the minimum threshold.</main><footer>Footer</footer></body></html>"
        html_out, detected = detect_main_content(html)
        assert detected
        assert "Main content area" in html_out

    def test_fallback_to_largest_block(self):
        html = "<html><body><div><div>Short div</div><section>This section contains a lot of text that makes it the primary content. It has many words and sentences that provide value to readers. This is definitely the main content area that should be extracted and even more words to pass coverage checks here today okay.</section><div>Another short div</div></div></body></html>"
        html_out, _ = detect_main_content(html)
        assert "section contains a lot of text" in html_out

    def test_no_main_content(self):
        html = "<html><body><div>Short 1</div><div>Short 2</div></body></html>"
        html_out, detected = detect_main_content(html)
        assert not detected
        assert "Short 1" in html_out and "Short 2" in html_out


class TestCalculateQuality:
    def test_range(self):
        q = calculate_quality("Some markdown content",
                              "<html><body><p>Some markdown content</p></body></html>")
        assert 0 <= q <= 1

    def test_empty_is_zero(self):
        assert calculate_quality("", "<html></html>") == 0

    def test_short_is_low(self):
        assert calculate_quality("abc", "<html><body><p>abc</p></body></html>") < 0.5


class TestEstimateTokens:
    def test_short(self):
        assert estimate_tokens("word") == 1

    def test_rule_of_thumb(self):
        assert estimate_tokens("x" * 400) == 100

    def test_empty(self):
        assert estimate_tokens("") == 0


class TestTruncate:
    def test_under_budget(self):
        content = "Short content"
        assert truncate_to_token_budget(content, 1000) == content

    def test_truncates(self):
        content = "\n".join(["line " + "x" * 80] * 100)
        r = truncate_to_token_budget(content, 50)
        assert len(r) < len(content)

    def test_preserves_first_heading(self):
        content = "# Heading\n" + "y" * 800 + "\n" + "z" * 800
        r = truncate_to_token_budget(content, 30)
        assert "# Heading" in r

    def test_truncation_notice(self):
        content = "\n".join(["line " + "x" * 80] * 100)
        r = truncate_to_token_budget(content, 50)
        assert "[Content truncated to ~50 tokens]" in r


class TestCleanMarkdownNoise:
    def test_removes_empty_links(self):
        assert "](" not in clean_markdown_noise("before [](https://x.com/y) after")

    def test_removes_empty_links_with_spaces(self):
        assert "](" not in clean_markdown_noise("before [ ](https://x.com/y) after")

    def test_collapses_newlines(self):
        r = clean_markdown_noise("a\n\n\n\n\nb")
        assert "\n\n\n" not in r

    def test_trailing_whitespace(self):
        r = clean_markdown_noise("hello   \nworld\t\t")
        for line in r.split("\n"):
            assert line == line.rstrip()

    def test_preserves_normal_links(self):
        r = clean_markdown_noise("see [docs](https://example.com/docs) now")
        assert "[docs](https://example.com/docs)" in r

    def test_preserves_normal_images(self):
        r = clean_markdown_noise("![alt text](https://example.com/i.png)")
        assert "![alt text](https://example.com/i.png)" in r

    def test_collapses_repeated_cta_links(self):
        link = "[Try Now](https://x.com/cta)"
        text = "\n\n".join([f"para {i} {link}" for i in range(8)])
        r = clean_markdown_noise(text)
        assert r.count("[Try Now]") == 2

    def test_removes_button_text(self):
        assert "Button Text" not in clean_markdown_noise("above\nButton Text\nbelow")


class TestHtmlToMarkdown:
    def test_basic_conversion(self):
        md = html_to_markdown(
            "<html><body><article><h1>Title</h1><p>Hello <strong>world</strong> with "
            '<a href="https://x.com">link</a>.</p></article></body></html>'
        )
        assert "# Title" in md
        assert "**world**" in md
        assert "[link](https://x.com)" in md

    def test_junk_removed(self):
        md = html_to_markdown(
            '<html><body><nav>NAVBAR</nav><div class="cookie-banner">cookies!</div>'
            "<article><h1>T</h1><p>Real content stays in the output here.</p></article>"
            "</body></html>"
        )
        assert "NAVBAR" not in md
        assert "cookies!" not in md
        assert "Real content" in md

    def test_cta_line_filter(self):
        md = html_to_markdown(
            "<html><body><article><p>Real text of the story continues here.</p>"
            "<p>Upload Resume</p><p>Apply now</p></article></body></html>"
        )
        assert "Upload Resume" not in md
        assert "Apply now" not in md
        assert "Real text" in md

    def test_oversize_raises(self):
        with pytest.raises(ValueError):
            html_to_markdown("<p>" + "x" * (10 * 1024 * 1024 + 1) + "</p>")


class TestHtmlToText:
    def test_structured_text(self):
        t = html_to_text(
            "<html><body><h1>Head</h1><p>Para one.</p><ul><li>Item</li></ul></body></html>"
        )
        assert "Head" in t and "Para one." in t and "Item" in t
        assert "<" not in t


class TestCleanForAI:
    def test_links_to_text(self):
        assert clean_for_ai("see [docs](https://x.com)") == "see docs"

    def test_images_to_placeholder(self):
        assert clean_for_ai("![alt](u.png)") == "[Image: alt]"
        assert clean_for_ai("x ![](u.png) y") == "x  y"

    def test_citations_removed(self):
        assert clean_for_ai("fact[1] more[23]") == "fact more"


class TestCleanDomSequentialOrder:
    def test_footer_measured_after_nested_header_removed(self):
        # markdown.ts:245-255 removes headers FIRST, then measures
        # footers: a footer whose text clears 200 chars only via a
        # nested junk header must still be dropped
        pad = "x" * 150
        html = (f"<html><body><main>Main content body {'word ' * 60}</main>"
                f"<footer><header>{pad}</header>short footer text</footer>"
                f"</body></html>")
        from webpeel_spark.pure.markdown import clean_html

        out = clean_html(html)
        assert "short footer text" not in out
        assert pad not in out

    def test_long_footer_kept(self):
        keep = "f" * 250
        html = (f"<html><body><main>Main content body {'word ' * 60}</main>"
                f"<footer>{keep}</footer></body></html>")
        from webpeel_spark.pure.markdown import clean_html

        out = clean_html(html)
        assert keep in out
