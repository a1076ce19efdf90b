"""fast_urljoin must be byte-identical to urllib's urljoin."""

from __future__ import annotations

from urllib.parse import urljoin

from hypothesis import given, settings
from hypothesis import strategies as st

from webpeel_spark.pure.urlfast import fast_urljoin

BASES = [
    "https://example.com/a/b?q=1",
    "http://sub.example.org/",
    "https://example.com",
    "https://example.com:8080/x/",
    "ftp://example.com/a",          # non-http base → fallback
    "not a url",
    "",
]

HREFS = [
    "/plain/path", "/p?q=2#frag", "/", "//proto.example/x",
    "/a/../b", "/a/./b", "/a/..", "/.", "/..",
    "relative/path", "../up", "./here", "?query", "#frag", "",
    "https://abs.example/x", "mailto:a@b", "javascript:void(0)",
    "/with space", "/trailing/", "/%20enc", "/a//b",
    "/a\nb", "/a\tb", "/a\rb", "/\n", "\t/x",   # WHATWG-stripped
    "/p?", "/p#", "/p?#f", "/p?#", "/?", "/#",  # empty components:
    "/p??", "/p##", "/p?q=1#",                  # urljoin drops ?/# markers
]


def test_exhaustive_case_table():
    for base in BASES:
        for href in HREFS:
            assert fast_urljoin(base, href) == urljoin(base, href), \
                (base, href)


@given(st.sampled_from(BASES),
       st.text(alphabet=st.characters(min_codepoint=9,
                                      max_codepoint=126),
               max_size=40))
@settings(max_examples=300, deadline=None)
def test_property_identical(base, href):
    assert fast_urljoin(base, href) == urljoin(base, href)


@given(st.text(alphabet="abcxyz/.:?#%0123456789-_", max_size=50),
       st.text(alphabet="abcxyz/.:?#%0123456789-_", max_size=40))
@settings(max_examples=300, deadline=None)
def test_property_identical_fuzzed_bases(base, href):
    try:
        expected = urljoin(base, href)
    except ValueError:
        return  # urljoin itself rejects; fast path never triggers here
    assert fast_urljoin(base, href) == expected
