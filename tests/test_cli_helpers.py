"""cli/utils.ts pure-helper ports pinned against Node's actual output
of the reference functions (tests/golden/cli_helpers_node.json):
CSV rendering (all-cells-quoted, quote doubling), extracted-object →
row normalization (ragged-array undefined cells), branding color/font
regex extraction, and Math.round-compatible relative time."""

from __future__ import annotations

import json
import os

from webpeel_spark.pure.cli_helpers import (
    extract_colors,
    extract_fonts,
    format_listings_csv,
    format_relative_time,
    normalise_extracted_to_rows,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "golden",
                       "cli_helpers_node.json")
with open(FIXTURE) as f:
    NODE = json.load(f)

LISTING_CASES = [
    [{"title": "A, plain", "price": "9.99"},
     {"title": 'B "quoted"', "url": "https://x.com"}],
    [{"a": "line1\nline2", "b": None}, {"a": "x", "b": "y,z"}],
    [],
    [{"n": 5}, {"n": 124.99}, {"n": True}],
]
# case 2's b:None maps to JS undefined (key skipped for the header,
# cell rendered "") — Python has one null, so pass b absent instead
LISTING_CASES[1][0] = {"a": "line1\nline2"}

EXTRACTED_CASES = [
    {"names": ["a", "b", "c"], "prices": [1, 2.5, None]},
    {"names": ["a", "b"], "prices": [1]},
    {"title": "One", "price": 124.99, "ok": True, "missing": None},
    {},
]
COLOR_CASES = [
    "body{color:#FFF;background:#1a2b3c} .x{fill:#1a2b3c}",
    "no colors here",
    "#AbC #112233 #445566 #778899 #99aabb #ccddee #ff0011 #223344 "
    "#556677 #8899aa #bbccdd #eeff00",
]
FONT_CASES = [
    "p{font-family: Inter, sans-serif;} h1{font-family:\"Georgia\"}",
    "div{FONT-FAMILY:   Roboto }",
    "nothing",
]


def test_csv_matches_node():
    for case, expected in zip(LISTING_CASES, NODE["listings"]):
        assert format_listings_csv(case) == expected


def test_normalise_matches_node():
    for case, expected in zip(EXTRACTED_CASES, NODE["extracted"]):
        got = normalise_extracted_to_rows(case)
        # JSON drops JS-undefined values; drop Python Nones to compare
        got = [{k: v for k, v in row.items() if v is not None}
               for row in got]
        assert got == expected, case


def test_colors_match_node():
    for case, expected in zip(COLOR_CASES, NODE["colors"]):
        assert extract_colors(case) == expected


def test_fonts_match_node():
    for case, expected in zip(FONT_CASES, NODE["fonts"]):
        assert extract_fonts(case) == expected


def test_relative_time_matches_node():
    for diff_ms, expected in NODE["rel"]:
        assert format_relative_time(0, diff_ms) == expected
    # 149999 ms pins Math.round's half-up (banker's round says '2m')
    assert format_relative_time(0, 149999) == "3m ago"
