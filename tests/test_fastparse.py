"""Fast tokenizer ≡ stdlib HTMLParser tokenization: byte-identical
serialized trees over the full synthetic corpus + adversarial HTML."""

import pytest

from webpeel_spark.dom.core import parse_html, parse_html_stdlib
from webpeel_spark.sources.corpus import generate_rows


def _ser(root):
    return root.children[0].html() if root.children else ""


def test_equivalence_over_corpus():
    rows = generate_rows(600, seed=42, listing_fraction=0.02)
    checked = 0
    for r in rows:
        if r["url"].endswith((".pdf", ".docx")):
            continue
        html = r["html"].decode("utf-8", errors="replace")
        assert _ser(parse_html(html)) == _ser(parse_html_stdlib(html)), r["url"]
        checked += 1
    assert checked > 500


ADVERSARIAL = [
    "a < b and c > d",                                    # literal < in text
    "<p>5 &lt; 6 &amp;&amp; 7 &gt; 2</p>",                # charrefs in text
    '<a href="/x?a=1&amp;b=2" title=\'it&apos;s\'>t</a>', # charrefs in attrs
    "<img src=x.png alt=bare>",                           # unquoted attrs
    "<br/><hr />",                                        # self-closing
    "<script>if (a<b && c>d) { x('</div>'); }</script>ok",  # raw text w/ <>
    "<style>a>b{color:red}</style><p>after</p>",
    "<SCRIPT>var x=1;</SCRIPT><P>UPPER</P>",              # case folding
    "<!-- comment with <div> inside --><p>k</p>",
    "<!DOCTYPE html><html><body><p>d</p></body></html>",
    "<?xml version='1.0'?><p>pi</p>",
    "<p>unclosed <b>bold",                                # unterminated
    '<div data-x="a>b">gt in quoted attr</div>',
    "<p>text &notanentity; more</p>",
    "<td>orphan cell</td>",
    "<p></p><p> </p>",
    "text &amp",                                          # trailing bare entity
    # unquoted attribute values ending in '/': the slash is part of the
    # VALUE (open tag), not a self-close marker
    '<a href=https://example.com/>text</a>',
    '<a href=https://example.com/path/>text</a>',
    '<img src=x.png/ alt=y>',
    '<a href=>empty</a>',
    '<a href=/>slash-value</a>',
    '<input disabled/>',                                  # bare attr + selfclose
    '<a href="https://q.example/">quoted stays selfclose</a>',
    # raw-text mode: a '</script ...>' that is not a well-formed end tag
    # is DATA; parsing continues to the real end tag
    "<script>var s = '</script foo>';</script><p>after</p>",
    "<script>a</scriptx>b</script><p>c</p>",
    "<style>a{}</style junk></style><p>s</p>",
]


@pytest.mark.parametrize("html", ADVERSARIAL)
def test_equivalence_adversarial(html):
    doc = f"<html><body>{html}</body></html>"
    assert _ser(parse_html(doc)) == _ser(parse_html_stdlib(doc))


def test_cdata_section_skipped():
    doc = "<html><body><p>a</p><![CDATA[ x > y ]]><p>b</p></body></html>"
    root = parse_html(doc)
    text = root.text()
    assert "a" in text and "b" in text
    assert "]]" not in text


def test_equivalence_random_soup():
    """Seeded random tag/attr/entity soup — hardens the tokenizer's
    branch dispatch (numeric groups, r7) against inputs no template
    generates.  Deterministic: fixed seed, fixed alphabet."""
    import random

    rng = random.Random(31337)
    frag = [
        "<div>", "</div>", "<p class='a b'>", "</p>", "<br>", "<br/>",
        "< not-a-tag", "text ", "&amp; ", "&bogus; ", "<a href=/x>",
        "<a href='q&quot;z'>", "</a>", "<!-- c -->", "<!doctype junk>",
        "<img src=x.png/ alt=y>", "<span DATA-Y=\"a>b\">", "</span>",
        "<script>var a='</di'+'v>';</script>", "<style>a{}</style>",
        "<input disabled>", "<td>", "&#65;", "&#x41;", "é ", "<>",
        "<?pi data?>", "<B>", "</B>", "<UL><LI>item", "</UL>",
    ]
    for _ in range(200):
        html = "".join(rng.choice(frag) for _ in range(rng.randrange(1, 30)))
        assert _ser(parse_html(html)) == _ser(parse_html_stdlib(html)), html
