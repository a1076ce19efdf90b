"""Readability engine tests — ported from the reference's
src/tests/readability.test.ts (fixtures at :16-160, assertions at
:165-420).  Same fixtures, same behavioural expectations."""

import pytest

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


class TestCoreExtraction:
    def test_extracts_article_and_strips_noise(self):
        r = extract_readable_content(ARTICLE_HTML, "https://example.com/article")
        assert "First paragraph of the actual article content" in r.content
        assert "Second paragraph continues the article" in r.content
        assert "Third paragraph wraps up the main points" in r.content
        assert "Home | About | Contact" not in r.content
        assert "We use cookies" not in r.content
        assert "Subscribe to our newsletter" not in r.content
        assert "Copyright 2024 Example Site" not in r.content
        assert "Related Articles" not in r.content

    def test_strips_share_buttons(self):
        r = extract_readable_content(ARTICLE_HTML, "https://example.com/article")
        assert "Share on Twitter | Facebook | LinkedIn" not in r.content


class TestMetadata:
    def test_title(self):
        r = extract_readable_content(ARTICLE_HTML, "https://example.com/article")
        assert r.title == "Test Article Title"

    def test_author(self):
        r = extract_readable_content(ARTICLE_HTML, "https://example.com/article")
        assert r.author == "John Smith"

    def test_date(self):
        r = extract_readable_content(ARTICLE_HTML, "https://example.com/article")
        assert r.date and "2024" in r.date

    def test_site_name(self):
        r = extract_readable_content(ARTICLE_HTML, "https://example.com/article")
        assert r.site_name == "Example Site"

    def test_language(self):
        r = extract_readable_content(ARTICLE_HTML, "https://example.com/article")
        assert r.language == "en"

    def test_missing_metadata_is_none(self):
        r = extract_readable_content(
            "<html><body><article><h1>Title</h1><p>Content goes here for testing purposes today.</p></article></body></html>",
            "https://example.com",
        )
        assert r.site_name is None
        assert r.language is None


class TestReadingTime:
    def test_reasonable(self):
        import re
        r = extract_readable_content(ARTICLE_HTML, "https://example.com/article")
        assert re.match(r"\d+ min read", r.reading_time)

    def test_minimum_one_minute(self):
        r = extract_readable_content(
            "<html><body><article><p>Very short content.</p></article></body></html>",
            "https://example.com",
        )
        assert r.reading_time == "1 min read"

    def test_word_count(self):
        r = extract_readable_content(ARTICLE_HTML, "https://example.com/article")
        assert r.word_count > 0


class TestExcerpt:
    def test_excerpt_nonempty_and_shorter(self):
        r = extract_readable_content(ARTICLE_HTML, "https://example.com/article")
        assert r.excerpt
        assert len(r.excerpt) < len(r.content)


class TestFallbacks:
    def test_no_article_tag_falls_back_to_div(self):
        r = extract_readable_content(NO_ARTICLE_HTML, "https://example.com/no-article")
        assert "An Article Without Article Tag" in r.content
        assert "inside a div with class main-content" in r.content

    def test_empty_page(self):
        r = extract_readable_content(EMPTY_HTML, "https://example.com/empty")
        assert r.reading_time == "1 min read"

    def test_empty_string(self):
        r = extract_readable_content("", "https://example.com")
        assert r.content == ""
        assert r.word_count == 0


class TestLinkDensity:
    def test_strips_high_link_density_nav(self):
        r = extract_readable_content(HIGH_LINK_DENSITY_HTML, "https://example.com/article")
        assert "Real Content Here" in r.content
        assert "real article text with meaningful content" in r.content
        assert "Alpha" not in r.content
        assert "Beta" not in r.content


class TestNestedNoise:
    def test_removes_nested_noise(self):
        r = extract_readable_content(NESTED_NOISE_HTML, "https://example.com/article")
        assert "first paragraph with real article content" in r.content
        assert "second paragraph continuing the article" in r.content
        assert "third and final paragraph" in r.content
        assert "Sign up for our newsletter" not in r.content
        assert "You might also like" not in r.content


class TestOptions:
    def test_include_images_default(self):
        r = extract_readable_content(IMAGES_AND_CODE_HTML, "https://example.com")
        assert "photo.jpg" in r.content or "A descriptive photo" in r.content

    def test_exclude_images(self):
        r = extract_readable_content(IMAGES_AND_CODE_HTML, "https://example.com",
                                     include_images=False)
        assert "photo.jpg" not in r.content
        assert "Introduction to the article" in r.content

    def test_include_code_default(self):
        r = extract_readable_content(IMAGES_AND_CODE_HTML, "https://example.com")
        assert "hello" in r.content
        assert "Introduction to the article" in r.content

    def test_exclude_code(self):
        r = extract_readable_content(IMAGES_AND_CODE_HTML, "https://example.com",
                                     include_code=False)
        assert "def hello" not in r.content
        assert "Introduction to the article" in r.content

    def test_max_length(self):
        r = extract_readable_content(ARTICLE_HTML, "https://example.com/article",
                                     max_length=100)
        assert len(r.content) <= 150

    def test_max_length_no_trunc(self):
        r = extract_readable_content(ARTICLE_HTML, "https://example.com/article",
                                     max_length=100000)
        assert "First paragraph of the actual article content" in r.content
