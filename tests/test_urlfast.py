"""whatwg_urljoin must match Node's ``new URL(href, base).href``.

The oracle is tests/golden/whatwg_urljoin_node.json — 5.5k recorded
outputs of Node v20's WHATWG URL parser (curated edge table + seeded
fuzz corpus; regenerate with tools/gen_whatwg_url_fixture.mjs).  The
reference absolutizes every link/image with new URL (metadata.ts:259,
links.ts:41), so this parity IS the link-extraction byte contract.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from webpeel_spark.pure.urlfast import whatwg_urljoin

_FIXTURE = pathlib.Path(__file__).parent / "golden" / "whatwg_urljoin_node.json"


def _load_cases():
    data = json.loads(_FIXTURE.read_text())
    return data["cases"]


def test_node_fixture_parity():
    """Every recorded Node case: http(s) results byte-equal; throws
    and non-http(s) results map to None (the reference's per-element
    catch + protocol filter)."""
    cases = _load_cases()
    assert len(cases) > 5000, "fixture truncated?"
    mismatches = []
    for base, href, expected in cases:
        got = whatwg_urljoin(base, href)
        want = (expected
                if expected and expected.startswith(("http://", "https://"))
                else None)
        if got != want:
            mismatches.append((base, href, expected, got))
    assert not mismatches, mismatches[:10]


# ── the round-8/9 marker family, pinned directly (readable failure
#    output if the fixture is ever regenerated on a divergent Node) ──────

MARKER_CASES = [
    # ';' is a plain path code point — urlparse's params semantics
    # (which drop '/x;' → '/x') must not leak in
    ("https://example.com/a/b?q=1", "/;", "https://example.com/;"),
    ("http://a.com", "/x;", "http://a.com/x;"),
    ("http://a.com", "/x;y;", "http://a.com/x;y;"),
    ("http://a.com/d/e", ";", "http://a.com/d/;"),
    ("http://a.com", ";", "http://a.com/;"),
    # empty '?' / '#' markers in the href are serialized
    ("http://a.com", "/p?", "http://a.com/p?"),
    ("http://a.com", "/p#", "http://a.com/p#"),
    ("http://a.com", "/p?#f", "http://a.com/p?#f"),
    ("http://a.com", "/p?#", "http://a.com/p?#"),
    ("http://a.com", "?", "http://a.com/?"),
    ("http://a.com/d/e?q", "#", "http://a.com/d/e?q#"),
    # markers inherited from the base: non-empty query content
    # survives, empty markers and fragments do not
    ("http://a.com/d/e?q#f", "", "http://a.com/d/e?q"),
    ("http://a.com/d/e?", "", "http://a.com/d/e"),
    ("http://a.com/d/e#", "", "http://a.com/d/e"),
    ("http://a.com/x;", "#f", "http://a.com/x;#f"),
    ("http://a.com/x;?y", "#f", "http://a.com/x;?y#f"),
    # absolute hrefs keep their own markers
    ("http://a.com", "http://b.com/q;", "http://b.com/q;"),
    ("http://a.com", "http://b.com/q?", "http://b.com/q?"),
]


@pytest.mark.parametrize("base,href,expected", MARKER_CASES)
def test_marker_preservation(base, href, expected):
    assert whatwg_urljoin(base, href) == expected


STRUCTURAL_CASES = [
    # same-scheme 'http:foo' is relative; cross-scheme parses authority
    ("http://a.com/d/", "http:foo", "http://a.com/d/foo"),
    ("http://a.com/d/", "https:foo", "https://foo/"),
    # 2+ leading slashes always reach the authority state
    ("http://a.com/d/", "///x", "http://x/"),
    ("http://a.com/d/", "////x/y", "http://x/y"),
    # userinfo round-trips ('@' in it percent-encodes)
    ("http://a.com/d/", "//u:p@b.com:8080/x", "http://u:p@b.com:8080/x"),
    ("http://a.com/d/", "//b@c@d/x", "http://b%40c@d/x"),
    # hosts: percent-decode, IPv4 normalization, IPv6 brackets
    ("http://a.com/d/", "//a%41.com/x", "http://aa.com/x"),
    ("http://a.com/d/", "//0x7f.1/x", "http://127.0.0.1/x"),
    ("http://a.com/d/", "//a.com:08080/x", "http://a.com:8080/x"),
    ("http://a.com/d/", "//[::1]:80/x", "http://[::1]/x"),
    ("http://a.com/d/", "//[::ffff:1.2.3.4]/", "http://[::ffff:102:304]/"),
    # percent-encoded dot segments collapse
    ("http://a.com/d/", ".%2E/x", "http://a.com/x"),
    ("http://a.com/d/", "/a/%2e%2E/b", "http://a.com/b"),
    ("http://a.com/d/", "x//%2e%2e", "http://a.com/d/x/"),
]


@pytest.mark.parametrize("base,href,expected", STRUCTURAL_CASES)
def test_structural(base, href, expected):
    assert whatwg_urljoin(base, href) == expected


NONE_CASES = [
    # invalid base throws before the href is considered
    ("not a url", "http://b.com/x"),
    ("", "/x"),
    ("http://a.com:99999/", "/x"),
    # invalid authority in the href
    ("http://a.com/d/", "//"),
    ("http://a.com/d/", "//a b.com/x"),
    ("http://a.com/d/", "//a.com:65536/x"),
    ("http://a.com/d/", "//300.1.2.3/x"),
    ("http://a.com/d/", "//u@/x"),
    # non-http(s) targets are filtered
    ("http://a.com/d/", "mailto:a@b"),
    ("http://a.com/d/", "javascript:void(0)"),
    ("http://a.com/d/", "b.com:8080/x"),   # 'b.com' parses as a scheme
    ("ftp://a.com/d/", "/x"),              # relative → ftp result
]


@pytest.mark.parametrize("base,href", NONE_CASES)
def test_none_cases(base, href):
    assert whatwg_urljoin(base, href) is None


def test_require_http_false_fallback():
    """link-pairs path: non-special results fall back to the RFC-3986
    join (documented approximation); special-scheme results
    (http/https/ftp/ws/wss) are WHATWG-exact; an invalid base still
    drops (Node throws on the base first)."""
    assert whatwg_urljoin("ftp://a.com/d/", "x", require_http=False) == \
        "ftp://a.com/d/x"
    assert whatwg_urljoin("ftp://a.com/d/", "/x;", require_http=False) == \
        "ftp://a.com/x;"  # ftp is special: empty-marker rules apply
    assert whatwg_urljoin("http://a.com/d/", "mailto:a@b",
                          require_http=False) == "mailto:a@b"
    assert whatwg_urljoin("http://a.com/d/", "/x;", require_http=False) == \
        "http://a.com/x;"
    assert whatwg_urljoin("not a url", "x", require_http=False) is None
    # require_http drops special-but-not-http(s) results like the
    # reference's ['http:','https:'] protocol filter (metadata.ts:262)
    assert whatwg_urljoin("ftp://a.com/d/", "x") is None
    assert whatwg_urljoin("http://a.com/", "ws://b.com/s") is None


def test_node_fixture_parity_any_scheme():
    """require_http=False against every recorded case: all results
    whose BASE is a special scheme must byte-match Node (this is the
    production shape — the base is always the page URL).  The only
    permitted divergence class is a non-special base (mailto:), where
    the RFC fallback is the documented approximation."""
    special = ("http://", "https://", "ftp://", "ws://", "wss://",
               "HTTP://", "FTP://")
    checked = mismatches = 0
    for base, href, expected in _load_cases():
        if not base.lstrip().lower().startswith(
                tuple(s.lower() for s in special)):
            continue
        checked += 1
        got = whatwg_urljoin(base, href, require_http=False)
        want = expected
        if want is None:
            if got is not None:
                mismatches += 1
        elif got != want:
            mismatches += 1
    assert checked > 4000
    assert mismatches == 0
