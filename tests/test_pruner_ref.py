"""Reference-suite port: src/tests/content-pruner.test.ts against
pure/pruner.prune_content — tag/link-density/position scoring, dynamic
threshold, safety floor, minWords, protected elements, stats, nesting,
and the news-article simulation."""

from webpeel_spark.pure.pruner import prune_content


def wrap(inner: str) -> str:
    return f"<html><body>{inner}</body></html>"


# ── basic behavior ───────────────────────────────────────────────────────

def test_empty_string_unchanged():
    r = prune_content("")
    assert r.html == "" and r.nodes_removed == 0 and r.reduction_percent == 0


def test_removes_link_dense_nav():
    html = wrap("""
      <article>
        <p>This is a long and substantive paragraph about the main topic of the article.
        It has real content and should be kept by the pruner algorithm.</p>
        <p>Another meaningful paragraph with enough words to score well on quality metrics.</p>
      </article>
      <nav>
        <a href="/home">Home</a>
        <a href="/about">About</a>
        <a href="/contact">Contact</a>
        <a href="/products">Products</a>
        <a href="/blog">Blog</a>
      </nav>
    """)
    r = prune_content(html, dynamic=False, threshold=0.4)
    assert "<nav>" not in r.html
    assert "substantive paragraph" in r.html


def test_removes_low_density_footer():
    html = wrap("""
      <main>
        <p>This article has important and substantive content about a topic.
        It contains detailed information that is valuable to the reader.</p>
        <p>More informative text about the subject matter here for scoring.</p>
      </main>
      <footer>
        <a href="/privacy">Privacy Policy</a>
        <a href="/terms">Terms</a>
        <a href="/sitemap">Sitemap</a>
        © 2024 Company
      </footer>
    """)
    r = prune_content(html, dynamic=False, threshold=0.35)
    assert "<footer>" not in r.html
    assert "important and substantive content" in r.html


def test_removes_empty_blocks():
    html = wrap("""
      <div></div>
      <p>This paragraph has meaningful content with enough words to pass the minimum word threshold.</p>
      <div>   </div>
    """)
    r = prune_content(html, min_words=3)
    assert r.nodes_removed >= 1
    assert "meaningful content" in r.html


def test_keeps_high_density_paragraphs():
    html = wrap("""
      <p>This paragraph contains dense, high-quality text content. It is the sort of
      text that you would find in the body of an article on a news website. The algorithm
      should give this block a high text density score and keep it.</p>
      <nav><a href="/">Home</a><a href="/x">X</a><a href="/y">Y</a><a href="/z">Z</a></nav>
    """)
    r = prune_content(html, dynamic=False, threshold=0.3)
    assert "dense, high-quality text content" in r.html


# ── tag importance ───────────────────────────────────────────────────────

def test_article_over_plain_div():
    html = wrap("""
      <article>
        <p>This is the main article text with important and informative content.
        It is well written and contains substantial information for the reader.</p>
      </article>
      <div>
        <a href="/1">Link 1</a>
        <a href="/2">Link 2</a>
        <a href="/3">Link 3</a>
        <a href="/4">Link 4</a>
        <a href="/5">Link 5</a>
      </div>
    """)
    r = prune_content(html, dynamic=False, threshold=0.4)
    assert "main article text" in r.html
    assert r.nodes_removed >= 1


def test_article_over_nav():
    html = wrap("""
      <nav>
        <a href="/a">Alpha</a><a href="/b">Beta</a><a href="/c">Gamma</a>
        <a href="/d">Delta</a><a href="/e">Epsilon</a>
      </nav>
      <article>
        <h1>Important Article Heading</h1>
        <p>The article body has excellent readable content that scores well on text density
        and word count metrics and should be retained by the pruning algorithm.</p>
      </article>
    """)
    r = prune_content(html, dynamic=False, threshold=0.3)
    assert "Important Article Heading" in r.html
    assert "<nav>" not in r.html


# ── link density ─────────────────────────────────────────────────────────

def test_removes_link_heavy_blocks():
    html = wrap("""
      <div>
        <a href="/1">Related Post One</a>
        <a href="/2">Related Post Two</a>
        <a href="/3">Related Post Three</a>
        <a href="/4">Related Post Four</a>
        <a href="/5">Related Post Five</a>
        <a href="/6">Related Post Six</a>
      </div>
      <p>This paragraph has real textual content with no links and high text density.
      It should be kept while the link-heavy div above is removed.</p>
    """)
    r = prune_content(html, dynamic=False, threshold=0.4)
    assert "real textual content with no links" in r.html


def test_keeps_low_link_density_text():
    html = wrap("""
      <p>This is the body of the article. You can read more about this topic on
      <a href="/more">this page</a>. The article continues with more substantial content
      that has low link density and high information value for the reader.</p>
    """)
    r = prune_content(html, dynamic=False, threshold=0.4)
    assert "body of the article" in r.html


# ── position weighting ───────────────────────────────────────────────────

def test_middle_content_kept():
    html = wrap("""
      <div>
        <a href="/a">Top Nav A</a><a href="/b">Top Nav B</a>
        <a href="/c">Top Nav C</a><a href="/d">Top Nav D</a>
      </div>
      <section>
        <h2>Main Content Section</h2>
        <p>This section contains the primary article content. It is located in the middle
        of the document and should therefore receive a higher position weight score from
        the pruning algorithm, increasing its chances of being retained.</p>
        <p>More content that is valuable and meaningful to the reader of the article.</p>
      </section>
      <div>
        <a href="/x">Bottom Link X</a><a href="/y">Bottom Link Y</a>
        <a href="/z">Bottom Link Z</a><a href="/w">Bottom Link W</a>
      </div>
    """)
    r = prune_content(html, dynamic=False, threshold=0.35)
    assert "Main Content Section" in r.html
    assert "primary article content" in r.html


# ── dynamic threshold ────────────────────────────────────────────────────

def test_dynamic_adapts_to_distribution():
    html = wrap("""
      <p>First paragraph with a decent amount of textual content right here in this block.</p>
      <p>Second paragraph with a decent amount of textual content right here in this block.</p>
      <p>Third paragraph with a decent amount of textual content right here in this block.</p>
      <p>Fourth paragraph with a decent amount of textual content right here in this block.</p>
    """)
    dynamic = prune_content(html, dynamic=True)
    fixed = prune_content(html, dynamic=False, threshold=0.9)
    assert dynamic.nodes_removed <= fixed.nodes_removed


def test_dynamic_still_removes_garbage():
    html = wrap("""
      <p>Main content paragraph with a substantial amount of readable text that provides
      real value to the user and has high text density relative to its HTML size.</p>
      <p>Another good content paragraph with informative text and no links at all.</p>
      <p>Third content paragraph with yet more informative details about the article topic.</p>
      <nav><a href="/">H</a><a href="/a">A</a><a href="/b">B</a><a href="/c">C</a><a href="/d">D</a><a href="/e">E</a></nav>
    """)
    r = prune_content(html, dynamic=True)
    assert "<nav>" not in r.html


# ── safety floor ─────────────────────────────────────────────────────────

def test_safety_floor_retains_30_percent():
    blocks = "\n".join(
        f'<div><a href="/{i}">Link{i}A</a><a href="/{i}b">Link{i}B</a>'
        f'<a href="/{i}c">Link{i}C</a></div>' for i in range(20))
    html = wrap(blocks)
    r = prune_content(html, dynamic=False, threshold=0.9)
    assert r.reduction_percent <= 70


# ── minWords ─────────────────────────────────────────────────────────────

def test_min_words_removes_short_blocks():
    html = wrap("""
      <div>Hi</div>
      <p>This paragraph has a sufficient number of words to pass the minimum threshold.</p>
    """)
    r = prune_content(html, min_words=5)
    assert r.nodes_removed >= 1
    assert "sufficient number of words" in r.html


def test_min_words_keeps_qualifying_blocks():
    html = wrap("""
      <p>Exactly five words here now.</p>
      <p>This is a paragraph with many more words than the minimum required threshold value.</p>
    """)
    r = prune_content(html, min_words=3, dynamic=False, threshold=0.1)
    assert "Exactly five words here now" in r.html
    assert "paragraph with many more words" in r.html


# ── protected elements ───────────────────────────────────────────────────

def test_main_never_removed():
    html = "<html><body><main><p>Content inside main element.</p></main></body></html>"
    r = prune_content(html, dynamic=False, threshold=0.99)
    assert "<main>" in r.html


def test_article_never_removed():
    html = "<html><body><article><p>Content inside article element.</p></article></body></html>"
    r = prune_content(html, dynamic=False, threshold=0.99)
    assert "<article>" in r.html


# ── statistics ───────────────────────────────────────────────────────────

def test_nodes_removed_count():
    html = wrap("""
      <nav><a href="/a">A</a><a href="/b">B</a><a href="/c">C</a><a href="/d">D</a></nav>
      <footer><a href="/x">X</a><a href="/y">Y</a><a href="/z">Z</a><a href="/w">W</a></footer>
      <p>This is the real content of the page with good text density and enough words.</p>
    """)
    r = prune_content(html, dynamic=False, threshold=0.35)
    assert r.nodes_removed >= 2


def test_reduction_zero_when_nothing_removed():
    html = wrap("""
      <p>Single good paragraph with plenty of text to satisfy the pruner algorithm.</p>
    """)
    r = prune_content(html, dynamic=False, threshold=0.0)
    assert r.reduction_percent == 0 and r.nodes_removed == 0


def test_reduction_positive_when_removed():
    html = wrap("""
      <nav><a href="/1">One</a><a href="/2">Two</a><a href="/3">Three</a><a href="/4">Four</a></nav>
      <p>This paragraph has high text density and many words and represents quality content.</p>
    """)
    r = prune_content(html, dynamic=False, threshold=0.4)
    if r.nodes_removed > 0:
        assert r.reduction_percent > 0


# ── nested content ───────────────────────────────────────────────────────

def test_scores_top_level_block():
    html = wrap("""
      <div>
        <p>This paragraph is inside a div wrapper. The div is the scored unit,
        not the paragraph. The content is good quality with high text density.</p>
        <p>Another paragraph inside the same div with more useful readable content here.</p>
      </div>
    """)
    r = prune_content(html, dynamic=False, threshold=0.1)
    assert "inside a div wrapper" in r.html


def test_deeply_nested_handled():
    html = wrap("""
      <div>
        <section>
          <div>
            <p>Deeply nested content that should be handled gracefully by the pruner.</p>
          </div>
        </section>
      </div>
    """)
    r = prune_content(html)
    assert "Deeply nested content" in r.html


# ── real-world simulation ────────────────────────────────────────────────

def test_news_article_with_sidebar():
    html = wrap("""
      <header>
        <a href="/">Site Logo</a>
        <nav>
          <a href="/news">News</a>
          <a href="/sports">Sports</a>
          <a href="/tech">Tech</a>
          <a href="/politics">Politics</a>
          <a href="/entertainment">Entertainment</a>
        </nav>
      </header>
      <article>
        <h1>Breaking News: Important Event Happens Today</h1>
        <p class="byline">By Staff Reporter</p>
        <p>In a significant development today, an important event occurred that has
        major implications for many people across the country and around the world.
        Experts are weighing in on what this means for the future.</p>
        <p>According to multiple sources familiar with the matter, the event unfolded
        in the afternoon following a series of developments. Officials have confirmed
        the situation and are working to address concerns raised by stakeholders.</p>
        <p>The response from the public has been significant, with many expressing
        their views on social media and other platforms. Community leaders have called
        for calm while investigations continue into the full scope of events.</p>
        <blockquote>
          "This is a very important moment," said one official. "We are working to
          ensure the best outcome for everyone involved in this matter."
        </blockquote>
        <p>More details are expected to emerge as the situation develops. Reporters
        on the ground are gathering information and will provide updates throughout
        the day as the story continues to evolve with new facts emerging.</p>
      </article>
      <aside class="sidebar">
        <div>
          <a href="/article/1">Related: Other News Story</a>
          <a href="/article/2">Related: Another Story</a>
          <a href="/article/3">Related: Third Story</a>
          <a href="/article/4">Related: Fourth Story</a>
          <a href="/article/5">Related: Fifth Story</a>
        </div>
        <div>
          <a href="/ad1">Advertisement</a>
          <a href="/ad2">Sponsored Content</a>
          <a href="/ad3">Promoted Link</a>
        </div>
      </aside>
      <footer>
        <a href="/about">About Us</a>
        <a href="/contact">Contact</a>
        <a href="/privacy">Privacy Policy</a>
        <a href="/terms">Terms of Service</a>
        <a href="/sitemap">Sitemap</a>
        <p>© 2024 News Organization. All rights reserved.</p>
      </footer>
    """)
    r = prune_content(html, dynamic=True)
    assert "Breaking News" in r.html
    assert "significant development today" in r.html
    assert "very important moment" in r.html
    assert r.nodes_removed >= 1
    assert r.reduction_percent >= 0


# ── edge cases ───────────────────────────────────────────────────────────

def test_no_block_elements():
    html = "<html><body><span>Just inline text</span></body></html>"
    r = prune_content(html)
    assert r.nodes_removed == 0 and r.reduction_percent == 0
    assert "Just inline text" in r.html


def test_single_block():
    html = wrap("<p>A single paragraph with enough words to be meaningful here.</p>")
    r = prune_content(html, dynamic=True)
    assert "single paragraph" in r.html
    assert r.nodes_removed == 0


def test_varying_quality_removes_only_worst():
    html = wrap("""
      <p>High quality paragraph with substantive informative readable content here.</p>
      <p>Another high quality paragraph with excellent readable content for the user.</p>
      <p>Third good paragraph with more useful informational content for the reader.</p>
      <nav><a href="/a">A</a><a href="/b">B</a><a href="/c">C</a><a href="/d">D</a><a href="/e">E</a><a href="/f">F</a></nav>
    """)
    r = prune_content(html, dynamic=True)
    assert "High quality paragraph" in r.html
    assert "Another high quality paragraph" in r.html
    assert "Third good paragraph" in r.html
    assert "<nav>" not in r.html
