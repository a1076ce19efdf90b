"""Garbage-tolerance invariant: extract_page must NEVER raise.

At 10^12 documents every malformed byte pattern occurs; a single
uncaught exception in the Arrow UDF fails the task (and after retries
the stage), so total-function behavior is a scale requirement, not a
nicety.  Seeded corpora keep this deterministic and fast; the wider
700-input sweep ran during development with zero failures.
"""

from __future__ import annotations

import random

from webpeel_spark.pure.pipeline import DEFAULT_OPTIONS, extract_page

_STATUSES = ("ok", "error", "empty")


def test_random_bytes_and_magic_prefixes_never_raise():
    rng = random.Random(7)
    for i in range(120):
        kind = i % 6
        if kind == 0:
            payload = bytes(rng.randrange(256)
                            for _ in range(rng.randrange(0, 400)))
        elif kind == 1:  # unterminated nesting
            payload = ("<div>" * rng.randrange(1, 200) + "x").encode()
        elif kind == 2:  # PDF magic, garbage body
            payload = b"%PDF-" + bytes(rng.randrange(256)
                                       for _ in range(200))
        elif kind == 3:  # zip magic (docx route), garbage body
            payload = b"PK\x03\x04" + bytes(rng.randrange(256)
                                            for _ in range(200))
        elif kind == 4:  # high-codepoint soup
            payload = ("<html><body>" + "".join(
                chr(rng.randrange(1, 0x300)) for _ in range(200))
            ).encode("utf-8", "ignore")
        else:  # truncated json
            payload = ('{"a": ' + "x" * rng.randrange(0, 50)).encode()
        r = extract_page(f"https://fuzz.example/{i}", payload,
                         DEFAULT_OPTIONS)
        assert r["status"] in _STATUSES


def test_tag_soup_never_raises():
    rng = random.Random(99)
    tags = ["div", "p", "table", "tr", "td", "li", "ul", "script",
            "style", "a", "img", "article", "template", "svg", "math",
            "select", "option", "textarea", "noscript", "iframe",
            "pre", "code", "h1", "form", "input", "br"]
    for i in range(150):
        parts = []
        for _ in range(rng.randrange(1, 120)):
            t = rng.choice(tags)
            c = rng.random()
            if c < 0.4:
                parts.append(
                    f"<{t} class=\""
                    + "".join(rng.choice('ab"<>&') for _ in range(5))
                    + '" style="'
                    + "".join(rng.choice("x;:()/") for _ in range(6))
                    + '">')
            elif c < 0.7:
                parts.append(f"</{t}>")
            elif c < 0.85:
                parts.append("".join(rng.choice("abc <>&;\"'=")
                                     for _ in range(12)))
            else:
                parts.append(
                    f"<{t} href='"
                    + "".join(rng.choice("ab:/#?%") for _ in range(8))
                    + "'>")
        r = extract_page(f"https://fz2.example/{i}",
                         "".join(parts).encode(), DEFAULT_OPTIONS)
        assert r["status"] in _STATUSES
