"""Metadata chain tests — ported expectations from src/tests/metadata.test.ts."""

from webpeel_spark.dom import parse_html
from webpeel_spark.pure.metadata import (
    clean_concatenated_title,
    extract_author,
    extract_canonical,
    extract_description,
    extract_image,
    extract_language,
    extract_links,
    extract_images,
    extract_metadata,
    extract_publish_date,
    extract_title,
    extract_word_count,
    js_date_to_locale_en_us,
    js_to_iso,
)


def _root(html: str):
    return parse_html(html)


class TestTitleChain:
    def test_og_title_first(self):
        root = _root('<head><meta property="og:title" content="OG Title">'
                     "<title>Tab Title</title></head><body><h1>H1</h1></body>")
        assert extract_title(root) == "OG Title"

    def test_twitter_second(self):
        root = _root('<head><meta name="twitter:title" content="TW">'
                     "<title>Tab</title></head>")
        assert extract_title(root) == "TW"

    def test_title_tag_third(self):
        root = _root("<head><title>Tab Title</title></head>")
        assert extract_title(root) == "Tab Title"

    def test_h1_fallback(self):
        root = _root("<body><h1>Heading One</h1></body>")
        assert extract_title(root) == "Heading One"

    def test_concatenated_title_fix(self):
        t = clean_concatenated_title(
            "The Performance of Open Source SoftwareHigh Performance Networking in Chrome"
        )
        assert t == "High Performance Networking in Chrome"

    def test_concat_keeps_short(self):
        assert clean_concatenated_title("CamelCase") == "CamelCase"
        assert clean_concatenated_title("") == ""


class TestOtherChains:
    def test_description(self):
        root = _root('<head><meta property="og:description" content="D1">'
                     '<meta name="description" content="D2"></head>')
        assert extract_description(root) == "D1"

    def test_author(self):
        root = _root('<head><meta name="author" content="A. Writer"></head>')
        assert extract_author(root) == "A. Writer"

    def test_language_lang_attr(self):
        root = _root('<html lang="en-US"><body></body></html>')
        assert extract_language(root) == "en-US"

    def test_language_og_locale_underscore(self):
        root = _root('<head><meta property="og:locale" content="en_US"></head>')
        assert extract_language(root) == "en-US"

    def test_canonical(self):
        root = _root('<head><link rel="canonical" href="https://x.com/c"></head>')
        assert extract_canonical(root) == "https://x.com/c"

    def test_canonical_og_url_fallback(self):
        root = _root('<head><meta property="og:url" content="https://x.com/o"></head>')
        assert extract_canonical(root) == "https://x.com/o"

    def test_image(self):
        root = _root('<head><meta property="og:image" content="https://x.com/i.png"></head>')
        assert extract_image(root) == "https://x.com/i.png"

    def test_publish_date_iso_normalized(self):
        root = _root('<head><meta property="article:published_time" '
                     'content="2024-01-15T10:00:00Z"></head>')
        assert extract_publish_date(root) == "2024-01-15T10:00:00.000Z"

    def test_publish_date_jsonld_graph(self):
        root = _root('<head><script type="application/ld+json">'
                     '{"@graph": [{"x": 1}, {"datePublished": "2023-06-02"}]}'
                     "</script></head>")
        assert extract_publish_date(root) == "2023-06-02T00:00:00.000Z"


class TestJsDates:
    def test_iso_datetime(self):
        assert js_to_iso("2024-01-15T10:00:00Z") == "2024-01-15T10:00:00.000Z"

    def test_date_only_utc(self):
        assert js_to_iso("2024-01-15") == "2024-01-15T00:00:00.000Z"

    def test_offset(self):
        assert js_to_iso("2024-01-15T10:00:00+02:00") == "2024-01-15T08:00:00.000Z"

    def test_wordy(self):
        assert js_to_iso("January 15, 2024") == "2024-01-15T00:00:00.000Z"

    def test_invalid_none(self):
        assert js_to_iso("not a date") is None

    def test_locale_format(self):
        assert js_date_to_locale_en_us("2024-01-15T10:00:00Z") == "January 15, 2024"


class TestWordCount:
    def test_counts_words(self):
        assert extract_word_count("<body><p>one two three</p></body>") == 3

    def test_strips_script_style(self):
        assert extract_word_count(
            "<body><script>var a = 1;</script><style>.x{}</style><p>one two</p></body>"
        ) == 2

    def test_entities(self):
        assert extract_word_count("<p>a &amp; b</p>") == 3

    def test_empty(self):
        assert extract_word_count("") == 0


class TestLinks:
    def test_absolutize_dedupe_sort(self):
        html = ('<body><a href="/b">B</a><a href="https://z.com/x">Z</a>'
                '<a href="/b">B again</a></body>')
        links = extract_links(html, "https://a.com/page")
        assert links == ["https://a.com/b", "https://z.com/x"]

    def test_non_http_dropped(self):
        html = '<body><a href="javascript:alert(1)">j</a><a href="mailto:x@y.z">m</a></body>'
        assert extract_links(html, "https://a.com/") == []

    def test_same_page_anchor_dropped(self):
        html = '<body><a href="#sec">s</a><a href="/other#sec">o</a></body>'
        links = extract_links(html, "https://a.com/page")
        assert links == ["https://a.com/other#sec"]


class TestImages:
    def test_img_tags(self):
        html = '<body><img src="/i.png" alt="A" width="10" height="20"></body>'
        imgs = extract_images(html, "https://a.com/")
        assert imgs[0].src == "https://a.com/i.png"
        assert imgs[0].alt == "A"
        assert imgs[0].width == 10 and imgs[0].height == 20

    def test_srcset_and_background(self):
        html = ('<body><picture><source srcset="/s1.png 1x, /s2.png 2x"><img src="/i.png" alt="x">'
                '</picture><div style="background: url(/bg.jpg)"></div></body>')
        srcs = {i.src for i in extract_images(html, "https://a.com/")}
        assert {"https://a.com/s1.png", "https://a.com/s2.png",
                "https://a.com/i.png", "https://a.com/bg.jpg"} <= srcs


class TestExtractMetadata:
    def test_head_only_fast_path(self):
        html = ('<html><head><title>T</title><meta name="description" content="D">'
                "</head><body><h1>H</h1><p>one two three</p></body></html>")
        title, meta = extract_metadata(html, "https://a.com/")
        assert title == "T"
        assert meta.description == "D"
        assert meta.word_count == 5  # H + one two three + title text
