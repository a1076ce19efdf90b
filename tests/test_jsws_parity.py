"""JS-vs-Python whitespace-class parity (round 9).

JS ``\\s`` and Python ``\\s`` disagree on three classes (verified
against Node v20: ``"a\\uFEFFb".replace(/\\s+/g," ")`` → ``"a b"``,
while U+0085 and U+001C-1F pass through untouched):

- U+FEFF — whitespace in JS only;
- U+0085 (NEL), U+001C-U+001F — whitespace in Python only.

The byte-identity core (markdown / mdemit / readability / pruner /
metadata / jsonld / jobs-clean / shared stripHtml) runs on the exact
ECMA class via ``pure.jstext``; these tests pin both the class itself
and its effect through real pipeline functions with the divergent
characters embedded in page text.
"""

from __future__ import annotations

import re

from webpeel_spark.pure.jstext import (
    JS_NWS, JS_WS, JS_WS_SET, collapse_ws, is_js_blank, js_trim,
)

BOM = "﻿"
NEL = "\x85"
FS = "\x1c"


class TestClassItself:
    def test_exhaustive_class_vs_set(self):
        rx = re.compile(JS_WS)
        nrx = re.compile(JS_NWS)
        for cp in list(range(0x3100)) + [0x2028, 0x2029, 0xFEFF, 0x205F]:
            ch = chr(cp)
            assert bool(rx.match(ch)) == (ch in JS_WS_SET), hex(cp)
            assert bool(nrx.match(ch)) == (ch not in JS_WS_SET), hex(cp)

    def test_divergence_pins(self):
        # JS-only whitespace
        assert collapse_ws(f"a{BOM}b") == "a b"
        assert js_trim(f"{BOM}x{BOM}") == "x"
        assert is_js_blank(BOM + " 　")
        # Python-only whitespace must pass through
        assert collapse_ws(f"a{NEL}b") == f"a{NEL}b"
        assert collapse_ws(f"a{FS}b") == f"a{FS}b"
        assert js_trim(f"{NEL}x") == f"{NEL}x"
        assert not is_js_blank(NEL)
        # both agree on the common set
        assert collapse_ws("a \t\n  b") == "a b"


class TestThroughPipeline:
    def test_html_to_text_js_trim_edges(self):
        """The reference's htmlToText collapses only ``[ \\t]+`` (a
        mid-text ZWNBSP survives) but .trim()s each element's text —
        JS trim removes edge U+FEFF and keeps edge U+0085."""
        from webpeel_spark.pure.markdown import html_to_text

        out = html_to_text(f"<p>{BOM}one{BOM}two{BOM}</p>")
        assert out == f"one{BOM}two"
        out2 = html_to_text(f"<p>{NEL}three</p>")
        assert out2 == f"{NEL}three"

    def test_turndown_blank_node_with_bom(self):
        """A paragraph containing only ZWNBSP is blank to turndown's
        /^\\s*$/ and must vanish from the markdown."""
        from webpeel_spark.pure.markdown import html_to_markdown

        md = html_to_markdown(f"<article><p>{BOM}</p>"
                              f"<p>real body text here</p></article>")
        assert "real body text here" in md
        assert BOM not in md

    def test_strip_html_trim_is_js(self):
        from webpeel_spark.pure.extractors.shared_util import strip_html

        assert strip_html(f"{BOM}<b>x</b>{BOM}") == "x"
        assert strip_html(f"{NEL}x") == f"{NEL}x"

    def test_jobs_clean_is_js(self):
        from webpeel_spark.pure.jobs import clean

        assert clean(f"a{BOM}b") == "a b"
        assert clean(f"a{NEL}b") == f"a{NEL}b"
