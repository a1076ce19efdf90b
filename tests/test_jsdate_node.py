"""JS Date shim parity: _parse_js_date vs recorded TZ=UTC Node output
of ``new Date(s)`` (tests/golden/jsdate_node.json — curated format
table + seeded fuzz, regenerable via tools/gen_jsdate_fixture.mjs).

Two documented margin classes are excluded BY NAME (both recorded in
the fixture so a regeneration keeps them visible):

1. Years outside Python datetime's 1-9999 — Node serializes year 0
   ('0000' → 0000-01-01) and expanded years ('275760-09-13' →
   +275760-…); the shim returns None.
2. ``:60``/``:61`` seconds in LEGACY (non-ISO) forms — V8 re-tokenizes
   the overflowing number as a year capture ('Tue Sep 02 15:02:60
   -0800 2144' → 1960-09-02!); the shim returns None.  ISO-form :60
   seconds are Invalid Date for both sides.
"""

from __future__ import annotations

import json
import os
import re

from webpeel_spark.pure.metadata import js_date_to_locale_en_us, js_to_iso

FIXTURE = os.path.join(os.path.dirname(__file__), "golden",
                       "jsdate_node.json")
with open(FIXTURE) as f:
    _FX = json.load(f)
CASES = _FX["cases"]

_LEGACY_SEC60 = re.compile(r":6[01](?!\d)")


def _excluded(s: str, iso) -> bool:
    if iso is None:
        return False
    if iso.startswith(("+", "-")) or not 1 <= int(iso[:4]) <= 9999:
        return True  # class 1: out-of-datetime-range year
    if _LEGACY_SEC60.search(s):
        return True  # class 2: legacy-form leap-second re-tokenization
    return False


def test_fixture_shape():
    assert _FX["tz"] == "UTC"
    assert len(CASES) > 500
    excluded = [s for s, iso, _loc in CASES if _excluded(s, iso)]
    # the margin stays a margin: a handful of named cases, not a class
    # the fixture quietly grew
    assert 0 < len(excluded) <= 12, excluded


def test_iso_parity():
    mismatches = []
    for s, iso, _loc in CASES:
        if _excluded(s, iso):
            continue
        got = js_to_iso(s)
        if got != iso:
            mismatches.append((s, iso, got))
    assert not mismatches, mismatches[:10]


def test_locale_parity():
    mismatches = []
    for s, iso, loc in CASES:
        if _excluded(s, iso):
            continue
        got = js_date_to_locale_en_us(s)
        if got != loc:
            mismatches.append((s, loc, got))
    assert not mismatches, mismatches[:10]


def test_excluded_cases_return_none():
    """The margins must fail CLOSED (None → callers skip the date),
    never return a wrong date silently."""
    for s, iso, _loc in CASES:
        if _excluded(s, iso):
            assert js_to_iso(s) is None, s
