"""Markdown-emitter parity tests — the Turndown-equivalent conversion
semantics under the reference's config (markdown.ts:538-578)."""

from webpeel_spark.pure.mdemit import escape_markdown, html_to_markdown_raw


def conv(html: str) -> str:
    return html_to_markdown_raw(f"<html><body>{html}</body></html>")


class TestBlocks:
    def test_atx_headings(self):
        assert conv("<h1>One</h1>") == "# One"
        assert conv("<h3>Three</h3>") == "### Three"
        assert conv("<h6>Six</h6>") == "###### Six"

    def test_paragraph_separation(self):
        assert conv("<p>a</p><p>b</p>") == "a\n\nb"

    def test_blockquote(self):
        assert conv("<blockquote><p>quoted</p></blockquote>") == "> quoted"

    def test_hr(self):
        assert conv("<p>a</p><hr><p>b</p>") == "a\n\n* * *\n\nb"

    def test_br(self):
        assert conv("<p>a<br>b</p>") == "a  \nb"


class TestInline:
    def test_strong_em(self):
        assert conv("<p><strong>bold</strong> and <em>it</em></p>") == "**bold** and _it_"

    def test_b_i_aliases(self):
        assert conv("<p><b>bold</b> and <i>it</i></p>") == "**bold** and _it_"

    def test_empty_emphasis_dropped(self):
        assert conv("<p>x<em>  </em>y</p>") == "xy"  # Turndown blank-rule: inline blank -> ''

    def test_link_inlined(self):
        assert conv('<p><a href="https://x.com/a">text</a></p>') == "[text](https://x.com/a)"

    def test_link_title(self):
        assert conv('<p><a href="/a" title="T">x</a></p>') == '[x](/a "T")'

    def test_link_paren_escape(self):
        assert conv('<p><a href="/a(1)">x</a></p>') == "[x](/a\\(1\\))"

    def test_inline_code(self):
        assert conv("<p>run <code>cmd --x</code> now</p>") == "run `cmd --x` now"

    def test_inline_code_backtick_handling(self):
        assert conv("<p><code>a`b</code></p>") == "``a`b``"

    def test_strikethrough(self):
        assert conv("<p><del>gone</del></p>") == "~gone~"


class TestImages:
    def test_alt_image_kept(self):
        assert conv('<img src="i.png" alt="pic">') == "![pic](i.png)"

    def test_altless_image_dropped(self):
        assert conv('<p>a <img src="i.png"> b</p>') == "a  b"  # Turndown keeps the void-adjacent space


class TestCode:
    def test_fenced_with_language(self):
        out = conv('<pre><code class="language-python">def f():\n    pass</code></pre>')
        assert out == "```python\ndef f():\n    pass\n```"

    def test_fenced_no_language(self):
        assert conv("<pre><code>x = 1</code></pre>") == "```\nx = 1\n```"

    def test_pre_preserves_whitespace(self):
        out = conv("<pre><code>a\n  b\n    c</code></pre>")
        assert "a\n  b\n    c" in out


class TestLists:
    def test_unordered(self):
        assert conv("<ul><li>one</li><li>two</li></ul>") == "-   one\n-   two"

    def test_ordered(self):
        assert conv("<ol><li>one</li><li>two</li></ol>") == "1.  one\n2.  two"

    def test_ordered_start(self):
        assert conv('<ol start="3"><li>x</li><li>y</li></ol>') == "3.  x\n4.  y"

    def test_nested(self):
        out = conv("<ul><li>a<ul><li>b</li></ul></li></ul>")
        assert out == "-   a\n    -   b"

    def test_task_list(self):
        out = conv('<ul><li><input type="checkbox" checked>done</li>'
                   '<li><input type="checkbox">todo</li></ul>')
        assert "[x] done" in out
        assert "[ ] todo" in out


class TestTables:
    def test_gfm_pipe_table(self):
        out = conv(
            "<table><thead><tr><th>A</th><th>B</th></tr></thead>"
            "<tbody><tr><td>1</td><td>2</td></tr></tbody></table>"
        )
        assert out == "| A | B |\n| --- | --- |\n| 1 | 2 |"

    def test_th_first_row_without_thead(self):
        out = conv("<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>")
        assert "| --- | --- |" in out

    def test_alignment(self):
        out = conv(
            '<table><thead><tr><th align="left">L</th><th align="center">C</th>'
            '<th align="right">R</th></tr></thead>'
            "<tbody><tr><td>1</td><td>2</td><td>3</td></tr></tbody></table>"
        )
        assert "| :-- | :-: | --: |" in out


class TestWhitespaceAndEscaping:
    def test_whitespace_collapse(self):
        assert conv("<p>a   \n\t  b</p>") == "a b"

    def test_escape_asterisks(self):
        assert conv("<p>2 * 3 = 6</p>") == "2 \\* 3 = 6"

    def test_escape_underscores(self):
        assert conv("<p>snake_case_name</p>") == "snake\\_case\\_name"

    def test_escape_brackets(self):
        assert conv("<p>[note]</p>") == "\\[note\\]"

    def test_no_escape_in_code(self):
        assert conv("<p><code>a_b*c</code></p>") == "`a_b*c`"

    def test_escape_table(self):
        assert escape_markdown("1. item") == "1\\. item"
        assert escape_markdown("# hash") == "\\# hash"
        assert escape_markdown("-dash") == "\\-dash"

    def test_head_content_skipped(self):
        out = html_to_markdown_raw(
            "<html><head><title>TAB TITLE</title><meta name='x' content='y'>"
            "</head><body><p>body text</p></body></html>"
        )
        assert out == "body text"
        assert "TAB TITLE" not in out

    def test_blank_div_emits_nothing(self):
        assert conv("<p>a</p><div>   </div><p>b</p>") == "a\n\nb"


def test_isspace_matches_regex_whitespace_class():
    """_all_text_blank replaces the former ^\\s*$ regex with
    str.isspace(); round-8 advisory claimed U+001C-001F diverge.  They
    do not: CPython's str.isspace() and sre's \\s both call
    Py_UNICODE_ISSPACE.  Pin the equivalence over every codepoint that
    either side considers whitespace plus the full Latin-1 range and
    the advisory's control block."""
    import re

    ws = re.compile(r"\s")
    candidates = (
        list(range(0x0000, 0x0300))         # ASCII + Latin-1 + advisory block
        + [0x85, 0xA0, 0x1680, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
        + list(range(0x2000, 0x2010))
    )
    for cp in candidates:
        c = chr(cp)
        assert c.isspace() == bool(ws.match(c)), hex(cp)
