"""Reference-suite port: src/tests/metadata.test.ts (extractImages +
extractLinks sections, case-for-case) against pure/metadata.  The
extractMetadata chain cases are already covered by
tests/test_metadata.py; this file adds the granular image/link
fixtures (srcset parsing, picture-parent alt, SSRF rejects, malformed
URLs, dedup/sort)."""

from webpeel_spark.pure.metadata import extract_images, extract_links

BASE = "https://example.com/page"


def _imgs(html):
    return extract_images(f"<html><body>{html}</body></html>", BASE)


def _links(html):
    return extract_links(f"<html><body>{html}</body></html>", BASE)


# ── extractImages ────────────────────────────────────────────────────────

def test_img_src():
    images = _imgs('<img src="https://example.com/image.jpg" />')
    assert len(images) == 1
    assert images[0].src == "https://example.com/image.jpg"


def test_img_alt():
    images = _imgs('<img src="https://example.com/image.jpg" alt="Test image" />')
    assert images[0].alt == "Test image"


def test_img_width():
    images = _imgs('<img src="https://example.com/image.jpg" width="800" />')
    assert images[0].width == 800


def test_img_height():
    images = _imgs('<img src="https://example.com/image.jpg" height="600" />')
    assert images[0].height == 600


def test_all_attributes_together():
    images = _imgs('<img src="https://example.com/photo.png" alt="Photo" '
                   'title="My Photo" width="1920" height="1080" />')
    assert len(images) == 1
    i = images[0]
    assert (i.src, i.alt, i.title, i.width, i.height) == (
        "https://example.com/photo.png", "Photo", "My Photo", 1920, 1080)


def test_missing_alt_is_empty():
    assert _imgs('<img src="https://example.com/image.jpg" />')[0].alt == ""


def test_missing_width_none():
    i = _imgs('<img src="https://example.com/image.jpg" height="100" />')[0]
    assert i.width is None and i.height == 100


def test_missing_height_none():
    i = _imgs('<img src="https://example.com/image.jpg" width="100" />')[0]
    assert i.height is None


def test_invalid_width_none():
    i = _imgs('<img src="https://example.com/image.jpg" width="invalid" />')[0]
    assert i.width is None


def test_invalid_height_none():
    i = _imgs('<img src="https://example.com/image.jpg" height="auto" />')[0]
    assert i.height is None


def test_relative_srcs_resolved():
    images = _imgs('<img src="/images/logo.png" />'
                   '<img src="assets/photo.jpg" />'
                   '<img src="../icon.svg" />')
    srcs = [i.src for i in images]
    assert len(images) == 3
    assert "https://example.com/images/logo.png" in srcs
    assert "https://example.com/assets/photo.jpg" in srcs
    assert "https://example.com/icon.svg" in srcs


def test_dedup_by_src():
    images = _imgs('<img src="https://example.com/image.jpg" alt="First" />'
                   '<img src="https://example.com/image.jpg" alt="Second" />'
                   '<img src="https://example.com/image.jpg" alt="Third" />')
    assert len(images) == 1


def test_picture_source_srcset():
    images = _imgs('<picture>'
                   '<source srcset="https://example.com/image-large.jpg" />'
                   '<img src="https://example.com/image.jpg" alt="R" />'
                   "</picture>")
    assert "https://example.com/image-large.jpg" in [i.src for i in images]


def test_srcset_multiple_images():
    images = _imgs('<picture>'
                   '<source srcset="https://example.com/small.jpg 1x, '
                   'https://example.com/large.jpg 2x" />'
                   '<img src="https://example.com/fallback.jpg" alt="M" />'
                   "</picture>")
    srcs = [i.src for i in images]
    assert "https://example.com/small.jpg" in srcs
    assert "https://example.com/large.jpg" in srcs


def test_alt_from_parent_picture():
    images = _imgs('<picture>'
                   '<source srcset="https://example.com/responsive.jpg" />'
                   '<img src="https://example.com/fallback.jpg" '
                   'alt="Picture alt text" /></picture>')
    resp = [i for i in images
            if i.src == "https://example.com/responsive.jpg"]
    assert resp and resp[0].alt == "Picture alt text"


def test_rejects_non_http_urls():
    images = _imgs('<img src="javascript:alert(\'xss\')" />'
                   '<img src="file:///etc/passwd" />'
                   '<img src="data:image/png;base64,xyz" />'
                   '<img src="ftp://example.com/image.jpg" />'
                   '<img src="https://example.com/safe.jpg" />')
    assert len(images) == 1
    assert images[0].src == "https://example.com/safe.jpg"


def test_malformed_urls_graceful():
    images = _imgs('<img src="ht!tp://invalid" />'
                   '<img src="https://example.com/valid.jpg" />'
                   '<img src="not a url at all" />')
    assert any(i.src == "https://example.com/valid.jpg" for i in images)


def test_css_background_single_quotes():
    images = _imgs('<div style="background-image: '
                   "url('https://example.com/bg.jpg')\">Content</div>")
    assert "https://example.com/bg.jpg" in [i.src for i in images]


def test_css_background_double_quotes():
    images = _imgs("<div style='background-image: "
                   'url("https://example.com/bg.jpg")\'>Content</div>')
    assert "https://example.com/bg.jpg" in [i.src for i in images]


def test_css_background_no_quotes():
    images = _imgs('<div style="background-image: '
                   'url(https://example.com/bg.jpg)">Content</div>')
    assert "https://example.com/bg.jpg" in [i.src for i in images]


def test_multiple_images_same_page():
    images = _imgs('<img src="https://example.com/1.jpg" alt="1" />'
                   '<img src="https://example.com/2.jpg" alt="2" />'
                   '<picture><source srcset="https://example.com/3.jpg" />'
                   '<img src="https://example.com/4.jpg" alt="4" /></picture>')
    assert len(images) >= 4


def test_no_images_empty():
    assert _imgs("<p>No images here</p>") == []


def test_skips_images_without_src():
    images = _imgs('<img alt="No source" />'
                   '<img src="https://example.com/valid.jpg" alt="Has source" />')
    assert len(images) == 1 and images[0].alt == "Has source"


def test_empty_srcset_graceful():
    images = _imgs('<picture><source srcset="" />'
                   '<img src="https://example.com/fallback.jpg" /></picture>')
    assert len(images) > 0


# ── extractLinks ─────────────────────────────────────────────────────────

def test_links_absolute():
    links = _links('<a href="https://example.com/link1">1</a>'
                   '<a href="https://other.com/link2">2</a>')
    assert "https://example.com/link1" in links
    assert "https://other.com/link2" in links


def test_links_relative_resolved():
    links = _links('<a href="/about">About</a><a href="contact">C</a>'
                   '<a href="../home">H</a>')
    assert "https://example.com/about" in links
    assert "https://example.com/contact" in links
    assert "https://example.com/home" in links


def test_links_dedup():
    links = _links('<a href="https://example.com/same">1</a>'
                   '<a href="https://example.com/same">2</a>'
                   '<a href="https://example.com/same">3</a>')
    assert links.count("https://example.com/same") == 1


def test_links_skip_anchor_only():
    links = _links('<a href="#section1">1</a><a href="#section2">2</a>'
                   '<a href="https://example.com/real-link">R</a>')
    assert "#section1" not in links and "#section2" not in links
    assert "https://example.com/real-link" in links


def test_links_reject_non_http():
    links = _links('<a href="javascript:alert(\'xss\')">X</a>'
                   '<a href="file:///etc/passwd">F</a>'
                   '<a href="ftp://example.com/file">FTP</a>'
                   '<a href="https://example.com/safe">S</a>'
                   '<a href="http://example.com/also-safe">AS</a>')
    assert "https://example.com/safe" in links
    assert "http://example.com/also-safe" in links
    assert not any(l.startswith(("javascript:", "file:", "ftp:"))
                   for l in links)


def test_links_malformed_graceful():
    links = _links('<a href="ht!tp://invalid">I</a>'
                   '<a href="https://example.com/valid">V</a>')
    assert "https://example.com/valid" in links


def test_links_sorted():
    links = _links('<a href="https://z.com">Z</a><a href="https://a.com">A</a>'
                   '<a href="https://m.com">M</a>')
    assert links == sorted(links)


def test_links_empty():
    assert _links("<p>No links here</p>") == []
