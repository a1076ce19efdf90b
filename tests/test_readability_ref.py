"""Reference-suite port: src/tests/readability.test.ts (35 cases)
against pure/readability.extract_readable_content — core extraction,
metadata, reading time, excerpt, fallbacks, link-density filtering,
nested noise, include-images/code/links/tables options, maxLength."""

import re

from webpeel_spark.pure.readability import extract_readable_content

ARTICLE_HTML = """
<html lang="en">
<head>
  <title>Test Article Title — Example Site</title>
  <meta name="author" content="John Smith">
  <meta property="og:title" content="Test Article Title">
  <meta property="og:site_name" content="Example Site">
  <meta property="article:published_time" content="2024-01-15T10:00:00Z">
</head>
<body>
  <nav>Home | About | Contact</nav>
  <div class="cookie-banner">We use cookies to improve your experience.</div>
  <main>
    <article>
      <h1>Test Article Title</h1>
      <div class="byline">By John Smith · January 15, 2024</div>
      <p>First paragraph of the actual article content with real information about the topic at hand.</p>
      <p>Second paragraph continues the article with more details and facts that are relevant.</p>
      <div class="share-buttons">Share on Twitter | Facebook | LinkedIn</div>
      <p>Third paragraph wraps up the main points and provides a conclusion for the reader.</p>
    </article>
  </main>
  <aside class="sidebar">
    <h3>Related Articles</h3>
    <ul><li>Article 1</li><li>Article 2</li></ul>
  </aside>
  <div class="newsletter">Subscribe to our newsletter! Get the latest updates.</div>
  <footer>Copyright 2024 Example Site. All rights reserved.</footer>
</body>
</html>
"""

NO_ARTICLE_HTML = """
<html lang="en">
<head>
  <title>No Article Tag</title>
  <meta name="author" content="Jane Doe">
</head>
<body>
  <nav><a href="/">Home</a><a href="/about">About</a><a href="/blog">Blog</a><a href="/contact">Contact</a></nav>
  <div class="main-content">
    <h1>An Article Without Article Tag</h1>
    <p>This content is inside a div with class main-content, not an article tag.</p>
    <p>There is a second paragraph here with more substantive content to read.</p>
    <p>And a third paragraph that provides additional depth and context to the story.</p>
  </div>
  <div class="sidebar">
    <ul>
      <li><a href="/1">Link 1</a></li>
      <li><a href="/2">Link 2</a></li>
      <li><a href="/3">Link 3</a></li>
    </ul>
  </div>
  <footer>Footer content copyright 2024.</footer>
</body>
</html>
"""

HIGH_LINK_DENSITY_HTML = """
<html>
<head><title>Link Density Test</title></head>
<body>
  <nav>
    <a href="/a">Alpha</a>
    <a href="/b">Beta</a>
    <a href="/c">Gamma</a>
    <a href="/d">Delta</a>
    <a href="/e">Epsilon</a>
    <a href="/f">Zeta</a>
    <a href="/g">Eta</a>
    <a href="/h">Theta</a>
  </nav>
  <article>
    <h1>Real Content Here</h1>
    <p>This is the real article text with meaningful content for the reader to consume.</p>
    <p>Another real paragraph with more words and actual information about the topic.</p>
    <p>The final paragraph concludes the article with solid information and insight.</p>
  </article>
</body>
</html>
"""

NESTED_NOISE_HTML = """
<html>
<head><title>Nested Noise</title></head>
<body>
  <main>
    <article>
      <h1>Article With Nested Noise</h1>
      <p>This is the first paragraph with real article content for the reader.</p>
      <div class="social-share">
        <a href="#">Share on Twitter</a>
        <a href="#">Share on Facebook</a>
        <a href="#">Share on LinkedIn</a>
      </div>
      <p>This is the second paragraph continuing the article after the share buttons.</p>
      <div class="newsletter">Sign up for our newsletter to get more content!</div>
      <p>This is the third and final paragraph of the article that wraps things up.</p>
    </article>
    <aside class="related">
      <h3>You might also like</h3>
      <ul>
        <li><a href="/art1">Related Article 1</a></li>
        <li><a href="/art2">Related Article 2</a></li>
      </ul>
    </aside>
  </main>
</body>
</html>
"""

EMPTY_HTML = "<html><head><title>Empty</title></head><body></body></html>"

IMAGES_AND_CODE_HTML = """
<html>
<head><title>Images and Code</title></head>
<body>
  <main>
    <article>
      <h1>Article With Media</h1>
      <p>Introduction to the article with real content for the reader to enjoy.</p>
      <img src="https://example.com/photo.jpg" alt="A descriptive photo">
      <p>A paragraph explaining the image above in detail for context and clarity.</p>
      <pre><code class="language-python">def hello():
    print("Hello, World!")</code></pre>
      <p>A final paragraph after the code block explaining what the code does here.</p>
    </article>
  </main>
</body>
</html>
"""


def _r(html=ARTICLE_HTML, url="https://example.com/article", **kw):
    return extract_readable_content(html, url, **kw)


# ── core extraction ──────────────────────────────────────────────────────

def test_extracts_article_strips_noise():
    r = _r()
    assert "First paragraph of the actual article content" in r.content
    assert "Second paragraph continues the article" in r.content
    assert "Third paragraph wraps up the main points" in r.content
    for noise in ("Home | About | Contact", "We use cookies",
                  "Subscribe to our newsletter",
                  "Copyright 2024 Example Site", "Related Articles"):
        assert noise not in r.content


def test_strips_share_buttons():
    assert "Share on Twitter | Facebook | LinkedIn" not in _r().content


# ── metadata ─────────────────────────────────────────────────────────────

def test_title_from_og_title():
    assert _r().title == "Test Article Title"


def test_author_from_meta():
    assert _r().author == "John Smith"


def test_date_from_published_time():
    r = _r()
    assert r.date and "2024" in r.date


def test_site_name_from_og():
    assert _r().site_name == "Example Site"


def test_language_from_lang_attr():
    assert _r().language == "en"


def test_missing_metadata_is_none():
    r = _r("<html><body><article><h1>Title</h1><p>Content goes here for "
           "testing purposes today.</p></article></body></html>",
           "https://example.com")
    assert r.site_name is None
    assert r.language is None


# ── reading time ─────────────────────────────────────────────────────────

def test_reading_time_format():
    assert re.search(r"\d+ min read", _r().reading_time)


def test_reading_time_minimum():
    r = _r("<html><body><article><p>Very short content.</p></article>"
           "</body></html>", "https://example.com")
    assert r.reading_time == "1 min read"


def test_word_count_positive():
    assert _r().word_count > 0


# ── excerpt ──────────────────────────────────────────────────────────────

def test_excerpt_nonempty_and_shorter():
    r = _r()
    assert r.excerpt
    assert len(r.excerpt) < len(r.content)


def test_excerpt_from_article_text():
    r = _r()
    assert ("First paragraph" in r.excerpt or "article content" in r.excerpt
            or "Test Article" in r.excerpt or len(r.excerpt) > 0)


# ── fallback behavior ────────────────────────────────────────────────────

def test_no_article_tag_fallback():
    r = _r(NO_ARTICLE_HTML, "https://example.com/no-article")
    assert "An Article Without Article Tag" in r.content
    assert "inside a div with class main-content" in r.content


def test_empty_page_no_throw():
    r = _r(EMPTY_HTML, "https://example.com/empty")
    assert r is not None
    assert r.reading_time == "1 min read"


def test_empty_html_string():
    r = _r("", "https://example.com")
    assert r.content == "" and r.word_count == 0


def test_no_clear_main_returns_best_guess():
    html = ("<html><body><div><p>Some content that is available on this "
            "page for reading.</p><p>More content here with additional "
            "words and paragraphs to extract.</p></div></body></html>")
    r = _r(html, "https://example.com")
    assert r is not None and len(r.content) >= 0


# ── link density ─────────────────────────────────────────────────────────

def test_high_link_density_nav_stripped():
    r = _r(HIGH_LINK_DENSITY_HTML)
    assert "Real Content Here" in r.content
    assert "real article text with meaningful content" in r.content
    assert "Alpha" not in r.content and "Beta" not in r.content


# ── nested noise ─────────────────────────────────────────────────────────

def test_nested_noise_removed():
    r = _r(NESTED_NOISE_HTML)
    assert "first paragraph with real article content" in r.content
    assert "second paragraph continuing the article" in r.content
    assert "third and final paragraph" in r.content
    assert "Sign up for our newsletter" not in r.content
    assert "You might also like" not in r.content


# ── includeImages / includeCode / includeLinks / maxLength ───────────────

def test_images_kept_by_default():
    r = _r(IMAGES_AND_CODE_HTML, "https://example.com", include_images=True)
    assert "photo.jpg" in r.content or "A descriptive photo" in r.content


def test_images_stripped():
    r = _r(IMAGES_AND_CODE_HTML, "https://example.com", include_images=False)
    assert "photo.jpg" not in r.content
    assert "Introduction to the article" in r.content


def test_code_kept_by_default():
    r = _r(IMAGES_AND_CODE_HTML, "https://example.com", include_code=True)
    assert "hello" in r.content
    assert "Introduction to the article" in r.content


def test_code_stripped():
    r = _r(IMAGES_AND_CODE_HTML, "https://example.com", include_code=False)
    assert "def hello" not in r.content
    assert "Introduction to the article" in r.content


def test_max_length_truncates():
    r = _r(max_length=100)
    assert len(r.content) <= 150  # small buffer for truncation notice


def test_max_length_no_truncate_when_under():
    r = _r(max_length=100000)
    assert "First paragraph of the actual article content" in r.content


# ── content quality / structure ──────────────────────────────────────────

def test_metadata_header_in_content():
    r = _r()
    assert "Test Article Title" in r.content
    assert "min read" in r.content


def test_structured_result_fields():
    r = _r()
    assert isinstance(r.title, str)
    assert r.author is None or isinstance(r.author, str)
    assert r.date is None or isinstance(r.date, str)
    assert r.site_name is None or isinstance(r.site_name, str)
    assert isinstance(r.content, str)
    assert isinstance(r.excerpt, str)
    assert isinstance(r.word_count, int)
    assert isinstance(r.reading_time, str)
    assert r.language is None or isinstance(r.language, str)


# ── byline author extraction ─────────────────────────────────────────────

def test_author_from_byline_when_meta_missing():
    html = """
      <html>
      <head><title>Byline Test</title></head>
      <body>
        <article>
          <h1>Test Article</h1>
          <div class="byline">By Jane Doe</div>
          <p>Article content with enough words and substance for proper extraction here.</p>
          <p>More content in the second paragraph of this article for testing purposes.</p>
        </article>
      </body>
      </html>
    """
    r = _r(html)
    if r.author:
        assert "Jane Doe" in r.author


# ── includeLinks ─────────────────────────────────────────────────────────

LINKS_HTML = """
<html><body>
  <article>
    <h1>Links Test</h1>
    <p>Visit <a href="https://example.com">this great resource</a> for more info.</p>
    <p>Additional content paragraph with more words for the reader to read here.</p>
  </article>
</body></html>
"""


def test_links_kept_by_default():
    r = _r(LINKS_HTML, "https://test.com", include_links=True)
    assert "this great resource" in r.content


def test_links_stripped():
    r = _r(LINKS_HTML, "https://test.com", include_links=False)
    assert "https://example.com" not in r.content
    assert "this great resource" in r.content


# ── includeTables ────────────────────────────────────────────────────────

TABLES_HTML = """
<html><body>
  <article>
    <h1>Tables Test</h1>
    <p>Introduction paragraph with meaningful content for article extraction.</p>
    <table>
      <thead><tr><th>Column A</th><th>Column B</th></tr></thead>
      <tbody><tr><td>Value 1</td><td>Value 2</td></tr></tbody>
    </table>
    <p>Closing paragraph after the table with more content for the reader.</p>
  </article>
</body></html>
"""


def test_tables_kept_by_default():
    r = _r(TABLES_HTML, "https://test.com", include_tables=True)
    assert "Column A" in r.content or "Value 1" in r.content


def test_tables_stripped():
    r = _r(TABLES_HTML, "https://test.com", include_tables=False)
    assert "Value 1" not in r.content
    assert "Introduction paragraph" in r.content
