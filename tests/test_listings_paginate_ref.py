"""Reference-suite port: src/tests/extract-listings.test.ts —
extractListings (eBay/Amazon/HN-style fixtures) and findNextPageUrl
(paginate.ts, newly ported as pure/paginate.py).  The formatTable/CSV
console-rendering blocks are display helpers out of scope for a batch
engine and are not ported."""

from webpeel_spark.pure.listings import extract_listings
from webpeel_spark.pure.paginate import find_next_page_url

EBAY_HTML = """
<!DOCTYPE html>
<html>
<head><title>charizard card | eBay</title></head>
<body>
  <div class="srp-results">
    <ul class="srp-list">
      <li class="s-item">
        <div class="s-item__image"><img src="/img/charizard-vmax.jpg" alt="Charizard VMAX"></div>
        <h3 class="s-item__title">Charizard VMAX 020/189 Darkness Ablaze Ultra Rare</h3>
        <span class="s-item__price">$24.99</span>
        <a href="https://www.ebay.com/itm/123456">View</a>
        <span class="s-item__subtitle">Free shipping</span>
      </li>
      <li class="s-item">
        <div class="s-item__image"><img src="/img/charizard-ex.jpg" alt="Charizard EX"></div>
        <h3 class="s-item__title">Charizard EX 006/165 Scarlet Violet 151</h3>
        <span class="s-item__price">$15.00</span>
        <a href="https://www.ebay.com/itm/234567">View</a>
        <span class="s-item__subtitle">Hot item</span>
      </li>
      <li class="s-item">
        <div class="s-item__image"><img src="/img/charizard-gx.jpg" alt="Charizard GX"></div>
        <h3 class="s-item__title">Charizard GX SM211 Hidden Fates Promo</h3>
        <span class="s-item__price">$32.50</span>
        <a href="https://www.ebay.com/itm/345678">View</a>
      </li>
      <li class="s-item">
        <div class="s-item__image"><img src="/img/charizard-v.jpg" alt="Charizard V"></div>
        <h3 class="s-item__title">Charizard V 017/189 Full Art</h3>
        <span class="s-item__price">$8.99</span>
        <a href="https://www.ebay.com/itm/456789">View</a>
        <span class="s-item__rating" aria-label="4.5 out of 5 stars">4.5 stars</span>
      </li>
      <li class="s-item">
        <div class="s-item__image"><img src="/img/charizard-vstar.jpg" alt="Charizard VSTAR"></div>
        <h3 class="s-item__title">Charizard VSTAR GG70/GG70 Crown Zenith</h3>
        <span class="s-item__price">$19.75</span>
        <a href="https://www.ebay.com/itm/567890">View</a>
      </li>
    </ul>
  </div>
</body>
</html>
"""

AMAZON_HTML = """
<!DOCTYPE html>
<html>
<head><title>Results for "wireless mouse"</title></head>
<body>
  <div class="s-main-slot">
    <div class="s-result-item" data-asin="B08ABC1">
      <img src="https://m.media-amazon.com/mouse1.jpg" alt="Mouse 1">
      <h2 class="a-text-normal"><a href="/dp/B08ABC1">Logitech M720 Triathlon Mouse</a></h2>
      <span class="a-price"><span class="a-offscreen">$49.99</span></span>
      <span class="a-icon-alt">4.6 out of 5 stars</span>
      <p class="a-text-normal">Multi-device wireless mouse</p>
    </div>
    <div class="s-result-item" data-asin="B08ABC2">
      <img src="https://m.media-amazon.com/mouse2.jpg" alt="Mouse 2">
      <h2 class="a-text-normal"><a href="/dp/B08ABC2">Razer DeathAdder V3</a></h2>
      <span class="a-price"><span class="a-offscreen">$89.99</span></span>
      <span class="a-icon-alt">4.8 out of 5 stars</span>
      <p class="a-text-normal">Ergonomic gaming mouse</p>
    </div>
    <div class="s-result-item" data-asin="B08ABC3">
      <img src="https://m.media-amazon.com/mouse3.jpg" alt="Mouse 3">
      <h2 class="a-text-normal"><a href="/dp/B08ABC3">Microsoft Arc Mouse</a></h2>
      <span class="a-price"><span class="a-offscreen">$59.99</span></span>
      <span class="a-icon-alt">4.3 out of 5 stars</span>
      <p class="a-text-normal">Slim, portable design</p>
    </div>
    <div class="s-result-item" data-asin="B08ABC4">
      <img src="https://m.media-amazon.com/mouse4.jpg" alt="Mouse 4">
      <h2 class="a-text-normal"><a href="/dp/B08ABC4">Apple Magic Mouse</a></h2>
      <span class="a-price"><span class="a-offscreen">$79.00</span></span>
      <span class="a-icon-alt">4.5 out of 5 stars</span>
      <p class="a-text-normal">Multi-Touch surface</p>
    </div>
  </div>
</body>
</html>
"""

HN_HTML = """
<!DOCTYPE html>
<html>
<body>
  <table class="itemlist">
    <tr class="athing">
      <td class="title"><a href="https://example.com/post1" class="titlelink">Show HN: My new project</a></td>
    </tr>
    <tr class="athing">
      <td class="title"><a href="https://example.com/post2" class="titlelink">Ask HN: What are you working on?</a></td>
    </tr>
    <tr class="athing">
      <td class="title"><a href="https://example.com/post3" class="titlelink">A deep dive into Rust ownership</a></td>
    </tr>
  </table>
</body>
</html>
"""


# ── extractListings ──────────────────────────────────────────────────────

def test_ebay_style_listings():
    items = extract_listings(
        EBAY_HTML, "https://www.ebay.com/sch/i.html?_nkw=charizard")
    assert len(items) == 5
    assert items[0]["title"] == \
        "Charizard VMAX 020/189 Darkness Ablaze Ultra Rare"
    assert items[0]["price"] == "$24.99"
    assert items[0]["link"] == "https://www.ebay.com/itm/123456"
    assert "charizard-vmax.jpg" in items[0]["image"]
    assert items[1]["title"] == "Charizard EX 006/165 Scarlet Violet 151"
    assert items[1]["price"] == "$15.00"
    assert "Charizard VSTAR" in items[4]["title"]
    assert items[4]["price"] == "$19.75"


def test_ratings_extracted():
    items = extract_listings(EBAY_HTML)
    rated = [i for i in items if i.get("rating")]
    assert rated and "4.5" in rated[0]["rating"]


def test_amazon_style_listings():
    items = extract_listings(
        AMAZON_HTML, "https://www.amazon.com/s?k=wireless+mouse")
    assert len(items) == 4
    assert "Logitech" in items[0]["title"]
    assert items[0]["price"] == "$49.99"
    assert items[0]["image"] == "https://m.media-amazon.com/mouse1.jpg"
    assert items[0]["link"] == "https://www.amazon.com/dp/B08ABC1"
    assert "Microsoft Arc Mouse" in items[2]["title"]
    assert items[2]["price"] == "$59.99"


def test_relative_urls_resolved():
    items = extract_listings(
        EBAY_HTML, "https://www.ebay.com/sch/i.html?_nkw=charizard")
    assert items[0]["image"] == "https://www.ebay.com/img/charizard-vmax.jpg"


def test_hn_style_listings():
    items = extract_listings(HN_HTML, "https://news.ycombinator.com")
    assert len(items) == 3
    assert items[0]["title"] == "Show HN: My new project"
    assert items[0]["link"] == "https://example.com/post1"


def test_empty_html():
    assert extract_listings("") == []
    assert extract_listings("  ") == []


def test_page_without_listings():
    html = """
      <html><body>
        <h1>About Us</h1>
        <p>We are a great company.</p>
        <p>Contact us at hello@example.com.</p>
      </body></html>
    """
    assert extract_listings(html) == []


def test_short_titles_filtered():
    html = """
      <html><body>
        <ul>
          <li><h3>OK</h3><a href="/a">link</a></li>
          <li><h3>AB</h3><a href="/b">link</a></li>
          <li><h3>A valid title here</h3><a href="/c">link</a></li>
          <li><h3>Another valid title</h3><a href="/d">link</a></li>
          <li><h3>Third valid title</h3><a href="/e">link</a></li>
        </ul>
      </body></html>
    """
    for item in extract_listings(html):
        assert len(item.get("title") or "") >= 3


# ── findNextPageUrl ──────────────────────────────────────────────────────

BASE = "https://example.com/results?page=1"


def test_rel_next_anchor():
    html = ('<html><body><a rel="next" href="/results?page=2">Next</a>'
            "</body></html>")
    assert find_next_page_url(html, BASE) == \
        "https://example.com/results?page=2"


def test_link_rel_next():
    html = ('<html><head><link rel="next" href="/results?page=2"></head>'
            "<body></body></html>")
    assert find_next_page_url(html, BASE) == \
        "https://example.com/results?page=2"


def test_aria_label_next():
    html = ('<html><body><a aria-label="Go to next page" '
            'href="/results?page=2">›</a></body></html>')
    assert find_next_page_url(html, BASE) == \
        "https://example.com/results?page=2"


def test_class_next():
    html = ('<html><body><a class="pagination-next" href="/results?page=2">'
            "Next Page</a></body></html>")
    assert find_next_page_url(html, BASE) == \
        "https://example.com/results?page=2"


def test_next_text_link():
    html = '<html><body><a href="/page/2">Next</a></body></html>'
    assert find_next_page_url(html, BASE) == "https://example.com/page/2"


def test_raquo_text_link():
    html = '<html><body><a href="/results?p=2">»</a></body></html>'
    assert find_next_page_url(html, BASE) == "https://example.com/results?p=2"


def test_rsaquo_text_link():
    html = '<html><body><a href="/results?p=2">›</a></body></html>'
    assert find_next_page_url(html, BASE) == "https://example.com/results?p=2"


def test_relative_resolution():
    html = '<html><body><a rel="next" href="?page=2">Next</a></body></html>'
    assert find_next_page_url(html, BASE) == \
        "https://example.com/results?page=2"


def test_no_next_link():
    html = "<html><body><p>No pagination here</p></body></html>"
    assert find_next_page_url(html, BASE) is None


def test_empty_html_none():
    assert find_next_page_url("", BASE) is None


def test_skips_prev_with_next_class():
    html = """
      <html><body>
        <a class="next-prev-button" href="/page/0">Previous</a>
        <a class="next-page" href="/page/2">Next</a>
      </body></html>
    """
    assert find_next_page_url(html, BASE) == "https://example.com/page/2"


def test_ignores_javascript_hrefs():
    html = ('<html><body><a rel="next" href="javascript:void(0)">Next</a>'
            "</body></html>")
    assert find_next_page_url(html, BASE) is None
