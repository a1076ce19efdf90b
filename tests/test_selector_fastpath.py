"""Permanent equivalence pins for the round-7 perf rewrites.

1. The one-step fast path in select/select_first must return exactly
   what the generic chain loop returns, for every selector shape —
   eligible (single Simple) or not (combinators, lists).
2. The combined CTA alternation and trail-cut pre-gate must be
   boolean-identical to iterating their per-pattern tables.

The code-review pass verified these with one-off fuzz runs; these
tests keep the guarantee alive against future edits.
"""

from __future__ import annotations

import random

from webpeel_spark.dom import parse_html
from webpeel_spark.dom.selector import (
    _chain_matches, compile_selector, select, select_first,
)

_SELECTORS = [
    "div", "a", "*", "p", "span.c1", ".c1", ".c1.c2", "#i3", "div#i1",
    "a[href]", "script[type=\"application/ld+json\"]", "[data-x]",
    "[data-x='1']", "div.c1[data-x]", "p:first-child", "li:last-child",
    "div > p", "div p", "div > p > a", "ul li", "p + p", "p ~ span",
    "div, span", "a[href], .c1", ":not(div)", "p:not(.c1)",
    "li:nth-child(2)", "td:empty",
]


def _generic_select(root, selector):
    try:
        chains = compile_selector(selector)
    except ValueError:
        return []
    out = []
    for node in root.iter_elements():
        for chain in chains:
            if _chain_matches(chain, node):
                out.append(node)
                break
    return out


def _random_doc(rng: random.Random) -> str:
    tags = ["div", "p", "span", "a", "ul", "li", "td", "script"]
    parts = []
    depth = 0
    for _ in range(rng.randrange(5, 40)):
        t = rng.choice(tags)
        attrs = rng.choice([
            "", " class='c1'", " class='c1 c2'", " id='i%d'" % rng.randrange(5),
            " href='/x'", " data-x='1'", " type='application/ld+json'",
        ])
        if depth > 0 and rng.random() < 0.35:
            parts.append("</div>")
            depth -= 1
        if rng.random() < 0.4:
            parts.append(f"<div{attrs}>")
            depth += 1
        elif rng.random() < 0.5:
            parts.append(f"<{t}{attrs}>{rng.randrange(100)}</{t}>")
        else:
            parts.append(f"<{t}{attrs}>")
    parts.extend("</div>" * depth)
    return "".join(parts)


def test_select_fast_path_equals_generic_loop():
    rng = random.Random(2024)
    for _ in range(60):
        root = parse_html(_random_doc(rng))
        for sel in _SELECTORS:
            fast = select(root, sel)
            slow = _generic_select(root, sel)
            assert fast == slow, (sel,)
            first = select_first(root, sel)
            assert first == (slow[0] if slow else None), (sel,)


def test_cta_combined_equals_table():
    from webpeel_spark.pure.markdown import (
        _CTA_COMBINED_RE, _CTA_LINE_REGEXES,
    )
    rng = random.Random(4)
    seeds = [
        "share", "[share]", "apply now to this", "sign up for", "## follow",
        "1234 votes", "community wiki", "random plain sentence here",
        "reset to default", "[copy link](http://x)", "date modified",
        "upload your resume to increase your chances!", "",
        "do you have a minute", "show more", "showmorechevron down",
    ]
    lines = seeds + ["".join(rng.choice(" abcdefgh[]()#") for _ in range(30))
                     for _ in range(300)]
    for line in lines:
        combined = _CTA_COMBINED_RE.search(line) is not None
        table = any(r.search(line) for r in _CTA_LINE_REGEXES)
        assert combined == table, line


def test_trail_cut_gate_is_superset():
    from webpeel_spark.pure.markdown import (
        _TRAIL_CUT_ANY_RE, _TRAIL_CUT_PATTERNS,
    )
    docs = [
        "body\n## explore other jobs\nrest", "## Similar Jobs Nearby\n",
        "plain document with nothing", "# Career guide articles",
        "### company and salary information\n tail", "",
        "#### too deep for the pattern h4", "jobs with similar titles inline",
    ]
    for doc in docs:
        any_individual = any(p.search(doc) for p in _TRAIL_CUT_PATTERNS)
        gate = _TRAIL_CUT_ANY_RE.search(doc) is not None
        assert gate == any_individual, doc
