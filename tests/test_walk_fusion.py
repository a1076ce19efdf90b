"""The fused anchor/ld+json collection walk in _html_branch must stay
predicate-identical to the selector calls it replaced
(`a[href]` and `script[type="application/ld+json"]`).

The golden fixtures pin end-to-end bytes on representative pages; this
suite pins the predicate equivalence itself on adversarial DOMs —
entity-encoded attribute values, uppercase tags, href-less anchors,
nested/duplicated scripts — so a future edit to either side cannot
drift silently.
"""

from __future__ import annotations

import random

from webpeel_spark.dom import parse_html
from webpeel_spark.dom.selector import select
from webpeel_spark.pure.jsonld import collect_anchors_and_ld as _fused


CASES = [
    "<a href='/x'>one</a><a>no href</a><A HREF='/y'>caps</A>",
    "<a href=''>empty value still present</a>",
    # entity-encoded type attr decodes to the exact ld+json value
    '<script type="application/ld&plus;json">{"@type":"Thing"}</script>',
    '<script type="application/ld+json">{}</script>'
    '<script type="text/javascript">var x;</script>',
    '<script TYPE="APPLICATION/LD+JSON">{}</script>',  # wrong case: no match
    "<div><p><a name='anchor-without-href'>t</a></p>"
    "<span><a href='#f'>frag</a></span></div>",
    "<table><tr><td><a href='a'>1</a><td><a href='b'>2</td></tr></table>",
    "<script>document.write('<a href=fake>')</script><a href='real'>r</a>",
    "",
    "<a href='1'><a href='2'><a href='3'>nested-ish</a>",
]


def test_fused_walk_matches_selectors_on_cases():
    for html in CASES:
        root = parse_html(html)
        anchors, lds = _fused(root)
        assert anchors == select(root, "a[href]"), html
        assert lds == select(root, 'script[type="application/ld+json"]'), html


def test_fused_walk_matches_selectors_on_random_soup():
    rng = random.Random(99)
    tags = ["a", "div", "script", "p", "span"]
    for _ in range(150):
        parts = []
        for _ in range(rng.randrange(1, 25)):
            t = rng.choice(tags)
            attr = rng.choice([
                "", " href='/x'", " href=\"\"", " type='application/ld+json'",
                " type='text/javascript'", " href='/y' type='application/ld+json'",
                " class='c'",
            ])
            if rng.random() < 0.5:
                parts.append(f"<{t}{attr}>{rng.randrange(10)}</{t}>")
            else:
                parts.append(f"<{t}{attr}>text")
        root = parse_html("".join(parts))
        anchors, lds = _fused(root)
        assert anchors == select(root, "a[href]")
        assert lds == select(root, 'script[type="application/ld+json"]')


def test_stripped_len_equals_join_strip():
    """_stripped_len must equal len("".join(parts).strip()) for any
    part decomposition, including all-whitespace and empty cases."""
    from webpeel_spark.pure.markdown import _stripped_len
    rng = random.Random(5)
    pieces = ["", " ", "\t\n", "a", " b ", "xy z", " ", "end.", "  \r"]
    for _ in range(400):
        parts = [rng.choice(pieces) for _ in range(rng.randrange(0, 8))]
        assert _stripped_len(parts) == len("".join(parts).strip()), parts
