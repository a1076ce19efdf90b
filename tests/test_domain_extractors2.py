"""ebay / craigslist / substack / news extractor tests — inline-HTML
fixtures with behavioral assertions (reference style:
src/tests/domain-extractors.test.ts)."""

import json

from webpeel_spark.pure.extractors import extract_domain_data, get_domain_extractor
from webpeel_spark.pure.extractors.craigslist import craigslist_extractor
from webpeel_spark.pure.extractors.ebay import ebay_extractor
from webpeel_spark.pure.extractors.news import extract_news_article
from webpeel_spark.pure.extractors.substack import substack_extractor


# ── registry dispatch ────────────────────────────────────────────────────

def test_registry_dispatch():
    assert get_domain_extractor("https://www.ebay.com/itm/123") is not None
    assert get_domain_extractor("https://sfbay.craigslist.org/abc/d/thing/1234567890.html") is not None
    assert get_domain_extractor("https://writer.substack.com/p/post") is not None
    assert get_domain_extractor("https://www.nytimes.com/2024/01/01/tech/a.html") is not None
    assert get_domain_extractor("https://www.bbc.co.uk/news/x") is not None
    assert get_domain_extractor("https://unknown-site.example") is None


# ── eBay ─────────────────────────────────────────────────────────────────

EBAY_ITEM = """<html><body>
<h1>Vintage Film Camera 35mm</h1>
<div class="x-price-primary">US $129.99</div>
<div class="x-item-condition-text">Pre-Owned</div>
<div class="shipping-price">$5.00 shipping</div>
</body></html>"""


def test_ebay_item_page():
    r = ebay_extractor(EBAY_ITEM, "https://www.ebay.com/itm/1234567890")
    assert r.type == "listing"
    assert r.structured["title"] == "Vintage Film Camera 35mm"
    assert r.structured["price"] == "US $129.99"
    assert r.structured["condition"] == "Pre-Owned"
    assert "# 🛍 Vintage Film Camera 35mm" in r.clean_content


def test_ebay_price_skips_shipping_class():
    html = """<html><body><h1>Item</h1>
    <span class="shipping-price">$9.99</span>
    <span class="display-price">$42.00</span></body></html>"""
    r = ebay_extractor(html, "https://www.ebay.com/itm/1")
    assert r.structured["price"] == "$42.00"


EBAY_SEARCH = """<html><body><ul>""" + "".join(
    f'<li data-listingid="{100 + i}">'
    f'<div class="s-card__title">New Listing Camera Lens {i}Opens in a new window or tab</div>'
    f'<span class="s-card__price">${20 + i}.00</span>'
    f'<span class="s-card__subtitle">PhotoShopBrand New</span>'
    f'<a href="https://www.ebay.com/itm/{100 + i}?hash=xyz&tracking=1">link</a></li>'
    for i in range(4)
) + """</ul></body></html>"""


def test_ebay_search_page():
    r = ebay_extractor(EBAY_SEARCH, "https://www.ebay.com/sch/i.html?_nkw=camera+lens&_udhi=50")
    assert r.type == "search"
    assert r.structured["keyword"] == "camera lens"
    assert r.structured["count"] == 4
    first = r.structured["listings"][0]
    assert first["title"] == "Camera Lens 0"           # prefixes/suffixes stripped
    assert first["condition"] == "Brand New"            # keyword from merged subtitle
    assert first["url"] == "https://www.ebay.com/itm/100"  # tracking params stripped
    assert "**Search:** camera lens" in r.clean_content


def test_ebay_search_no_listings_returns_none():
    assert ebay_extractor("<html><body><p>x</p></body></html>",
                          "https://www.ebay.com/sch/i.html?_nkw=x") is None


# ── craigslist ───────────────────────────────────────────────────────────

CL_POST = """<html><body>
<h2 class="postingtitle"><span class="postingtitletext">
<span id="titletextonly">Mountain bike - large frame</span>
<span class="price">$450</span> <small> (mission district)</small></span></h2>
<p class="postinginfo">posted: <time datetime="2024-03-01T10:00:00-0800">mar 1</time></p>
<section id="postingbody">
<div class="print-information">print</div>
QR Code Link to This Post
Great condition bike, barely used. Size L.
</section>
<div class="attrgroup"><span>condition: excellent</span><span>make / manufacturer: Trek</span></div>
<img class="slide" src="https://images.craigslist.org/a.jpg">
<img class="slide" src="https://images.craigslist.org/b.jpg">
</body></html>"""


def test_craigslist_post():
    r = craigslist_extractor(CL_POST, "https://sfbay.craigslist.org/sfc/bik/d/mountain-bike/1234567890.html")
    assert r.type == "listing"
    s = r.structured
    assert s["title"] == "Mountain bike - large frame"
    assert s["price"] == "$450"
    assert s["location"] == "mission district"
    assert s["postDate"].startswith("2024-03-01")
    assert "Great condition bike" in s["bodyText"]
    assert "QR Code Link" not in s["bodyText"]
    assert s["attributes"]["condition"] == "excellent"
    assert len(s["images"]) == 2
    assert "## Details" in r.clean_content
    assert "📷 2 images" in r.clean_content


CL_SEARCH = """<html><head><title>sf bikes - craigslist</title></head><body>
<ul>
<li class="cl-static-search-result">
 <a class="titlestring" href="https://sfbay.craigslist.org/1.html">Road bike</a>
 <span class="result-price">$300</span><span class="result-hood">(soma)</span></li>
<li class="cl-static-search-result">
 <a class="titlestring" href="https://sfbay.craigslist.org/2.html">BMX</a>
 <span class="result-price">$150</span></li>
</ul></body></html>"""


def test_craigslist_search():
    r = craigslist_extractor(CL_SEARCH, "https://sfbay.craigslist.org/search/bik")
    assert r.type == "search"
    assert len(r.structured["listings"]) == 2
    assert r.structured["listings"][0]["title"] == "Road bike"
    assert "**Road bike** — $300 (soma)" in r.clean_content


# ── substack ─────────────────────────────────────────────────────────────

def _substack_html(paywalled=False):
    jl = {"@type": "NewsArticle", "headline": "On Distributed Extraction",
          "author": {"name": "Ada Writer"}, "datePublished": "2024-05-01T09:00:00Z",
          "description": "A short preview of the post."}
    body = "" if paywalled else (
        '<div class="body markup"><h2>Part One</h2>'
        "<p>Paragraph one about pipelines and scale in production systems.</p>"
        "<pre>x = 1</pre>"
        '<div class="subscribe-widget">Subscribe!</div>'
        "<blockquote>A quote.</blockquote></div>")
    return f"""<html><head>
<script type="application/ld+json">{json.dumps(jl)}</script>
<meta property="og:site_name" content="Ada's Letters">
</head><body><article>{body}</article></body></html>"""


def test_substack_post():
    r = substack_extractor(_substack_html(), "https://ada.substack.com/p/on-distributed")
    assert r.type == "post"
    s = r.structured
    assert s["title"] == "On Distributed Extraction"
    assert s["author"] == "Ada Writer"
    assert s["publication"] == "Ada's Letters"
    assert s["paywalled"] is False
    assert "## Part One" in r.clean_content
    assert "```\nx = 1\n```" in r.clean_content
    assert "> A quote." in r.clean_content
    assert "Subscribe!" not in r.clean_content


def test_substack_paywall_detection():
    r = substack_extractor(_substack_html(paywalled=True),
                           "https://ada.substack.com/p/on-distributed")
    assert r.structured["paywalled"] is True
    assert "behind a paywall" in r.clean_content


# ── news ─────────────────────────────────────────────────────────────────

NEWS_HTML = """<html><head>
<script type="application/ld+json">{"@context":"https://schema.org","@graph":[
 {"@type":"Organization","name":"Example News"},
 {"@type":"NewsArticle","headline":"Markets Rally on Data",
  "author":[{"name":"Sam Reporter"}],"datePublished":"2024-06-02T12:00:00Z",
  "articleSection":"Business","keywords":["markets","economy"],
  "description":"Stocks rose."}]}</script>
</head><body>
<article>
<h1>Markets Rally on Data</h1>
<p>Stocks rose sharply on Tuesday as new data emerged from the markets.</p>
<h2>The Numbers</h2>
<p>The index gained four percent in heavy trading across all sectors today.</p>
<blockquote>We are optimistic, analysts said about the outlook.</blockquote>
<aside class="ad-unit">buy things</aside>
<p>Additional reporting contributed to this developing market story today.</p>
</article></body></html>"""


def test_news_article_graph_jsonld():
    r = extract_news_article(NEWS_HTML, "https://www.nytimes.com/2024/06/02/business/markets.html",
                             "nytimes.com")
    s = r.structured
    assert s["title"] == "Markets Rally on Data"
    assert s["author"] == "Sam Reporter"
    assert s["section"] == "Business"
    assert s["keywords"] == ["markets", "economy"]
    assert "**Published:** 2024-06-02" in r.clean_content
    assert "## The Numbers" in r.clean_content
    assert "> We are optimistic" in r.clean_content
    assert "buy things" not in r.clean_content


def test_news_short_result_rejected_via_dispatch():
    # <20-char cleanContent is rejected by extract_domain_data (index.ts:255)
    html = "<html><body><p>no title here</p></body></html>"
    assert extract_domain_data(html, "https://www.bbc.com/news/x") is None


# ── allrecipes / imdb ────────────────────────────────────────────────────

def test_allrecipes_graph_recipe():
    from webpeel_spark.pure.extractors.allrecipes import allrecipes_extractor

    recipe = {"@context": "https://schema.org", "@graph": [{
        "@type": "Recipe", "name": "Garlic Pasta",
        "description": "Simple weeknight pasta.",
        "recipeIngredient": ["2 cloves garlic", "200g pasta"],
        "recipeInstructions": [
            {"@type": "HowToStep", "text": "Boil pasta."},
            {"@type": "HowToSection", "itemListElement": [{"text": "Fry garlic."}]},
        ],
        "prepTime": "PT10M", "cookTime": "PT1H20M", "recipeYield": "4",
        "aggregateRating": {"ratingValue": 4.8, "reviewCount": 321}}]}
    html = (f'<html><head><script type="application/ld+json">'
            f"{json.dumps(recipe)}</script></head><body></body></html>")
    r = allrecipes_extractor(html, "https://www.allrecipes.com/recipe/1")
    assert r.type == "recipe"
    assert r.structured["prepTime"] == "10m"
    assert r.structured["cookTime"] == "1h 20m"
    assert r.structured["instructions"] == ["Boil pasta.", "Fry garlic."]
    assert "Rating: 4.8 (321 reviews)" in r.clean_content
    assert "- 2 cloves garlic" in r.clean_content
    assert "2. Fry garlic." in r.clean_content


def test_allrecipes_html_fallback():
    from webpeel_spark.pure.extractors.allrecipes import allrecipes_extractor

    html = """<html><body><h1>Fallback Soup</h1>
    <li class="ingredient-item">1 onion</li>
    <div class="instruction-list"><li>Chop onion and simmer it well.</li></div>
    </body></html>"""
    r = allrecipes_extractor(html, "https://allrecipes.com/r/2")
    assert r.structured["title"] == "Fallback Soup"
    assert "1 onion" in r.structured["ingredients"]


def test_imdb_movie_jsonld():
    from webpeel_spark.pure.extractors.imdb import imdb_extractor

    movie = {"@type": "Movie", "name": "The Shuffle",
             "description": "A data engineer's story.",
             "datePublished": "2021-06-01", "genre": ["Drama", "Tech"],
             "duration": "PT2H15M", "director": {"name": "Ana Lee"},
             "actor": [{"name": "Sam Actor"}, {"name": "Kim Star"}],
             "aggregateRating": {"ratingValue": 8.1, "ratingCount": 12345},
             "contentRating": "PG-13", "creator": [{"name": "Wri Ter"}],
             "keywords": "spark, shuffle, drama"}
    html = (f'<html><head><script type="application/ld+json">'
            f"{json.dumps(movie)}</script></head><body></body></html>")
    r = imdb_extractor(html, "https://www.imdb.com/title/tt1234567/")
    assert r.type == "movie"
    assert r.structured["runtime"] == "2h 15m"
    assert r.structured["director"] == "Ana Lee"
    assert r.structured["year"] == "2021"
    assert "⭐ 8.1/10 (12,345 votes)" in r.clean_content
    assert "**Cast:** Sam Actor, Kim Star" in r.clean_content


def test_imdb_tvseries_type():
    from webpeel_spark.pure.extractors.imdb import imdb_extractor

    show = {"@type": "TVSeries", "name": "Cluster Tales",
            "description": "x" * 30}
    html = (f'<html><head><script type="application/ld+json">'
            f"{json.dumps(show)}</script></head><body></body></html>")
    r = imdb_extractor(html, "https://www.imdb.com/title/tt999/")
    assert r.type == "tv_show"


# ── cars.com / linkedin ──────────────────────────────────────────────────

def test_carscom_search_embedded_json():
    from webpeel_spark.pure.extractors.carscom import carscom_extractor

    cards = "".join(
        '<fuse-card data-vehicle-details=\'' + json.dumps({
            "listingId": f"L{i}", "stockType": "Used", "year": 2020 + i,
            "make": "Honda", "model": "Civic", "trim": "EX",
            "price": 18500 + i * 1000, "mileage": 42000 - i * 1000,
            "bodyStyle": "Sedan", "seller": {"zip": "07657"},
        }) + '\'><card-gallery card-link="/vehicledetail/L' + str(i) + '/">'
        '</card-gallery></fuse-card>'
        for i in range(3)
    )
    html = f"<html><body>{cards}</body></html>"
    r = carscom_extractor(
        html, "https://www.cars.com/shopping/results/?keyword=civic&zip=07657&list_price_max=25000")
    assert r.type == "search"
    assert r.structured["count"] == 3
    first = r.structured["listings"][0]
    assert first["title"] == "Used 2020 Honda Civic EX"
    assert first["price"] == "$18,500"
    assert first["mileage"] == "42,000 mi"
    assert "**Search:** civic" in r.clean_content
    assert "[View listing](https://www.cars.com/vehicledetail/L0/)" in r.clean_content


def test_carscom_detail_page():
    from webpeel_spark.pure.extractors.carscom import carscom_extractor

    html = """<html><body><h1>2019 Toyota Camry SE</h1>
    <span class="primary-price">$21,998</span>
    <div class="listing-mileage">38,202 mi.</div></body></html>"""
    r = carscom_extractor(html, "https://www.cars.com/vehicledetail/abc123/")
    assert r.type == "listing"
    assert r.structured["title"] == "2019 Toyota Camry SE"
    assert r.structured["price"] == "$21,998"


def test_linkedin_profile_jsonld():
    from webpeel_spark.pure.extractors.linkedin import linkedin_extractor

    jl = {"@type": "Person", "name": "Dana Dev", "jobTitle": "Data Engineer",
          "description": "Builds pipelines.",
          "address": {"addressLocality": "Berlin"}}
    html = (f'<html><head><script type="application/ld+json">{json.dumps(jl)}'
            f"</script></head><body></body></html>")
    r = linkedin_extractor(html, "https://www.linkedin.com/in/dana-dev/")
    assert r.type == "profile"
    assert r.structured["name"] == "Dana Dev"
    assert r.structured["headline"] == "Data Engineer"
    assert "👤 Dana Dev — LinkedIn" in r.clean_content
    assert "require authentication" in r.clean_content


def test_linkedin_authwall_discards_meta():
    from webpeel_spark.pure.extractors.linkedin import linkedin_extractor

    html = """<html><head>
    <meta property="og:title" content="Sign Up | LinkedIn">
    <meta property="og:description" content="500 million+ members">
    </head><body>authwall Join LinkedIn</body></html>"""
    r = linkedin_extractor(html, "https://www.linkedin.com/in/someone/")
    # authwall page with no JSON-LD and junk og:title yields no name → None
    assert r is None or r.structured["description"] == ""


# ── twitter ──────────────────────────────────────────────────────────────

def test_twitter_next_data_tweet():
    from webpeel_spark.pure.extractors.twitter import twitter_extractor

    nd = {"props": {"pageProps": {"x": {"tweet_results": {"result": {
        "legacy": {"full_text": "Shipping the extraction engine today!",
                   "favorite_count": 42, "retweet_count": 7, "reply_count": 3,
                   "created_at": "Wed Oct 10 20:19:24 +0000 2018",
                   "entities": {"media": [
                       {"media_url_https": "https://pbs.twimg.com/a.jpg"}]}},
        "views": {"count": "900"},
        "core": {"user_results": {"result": {
            "is_blue_verified": True,
            "legacy": {"name": "Data Dev", "screen_name": "datadev"}}}}}}}}}}
    html = (f'<html><body><script id="__NEXT_DATA__" type="application/json">'
            f"{json.dumps(nd)}</script></body></html>")
    r = twitter_extractor(html, "https://twitter.com/datadev/status/123456")
    assert r.type == "tweet"
    s = r.structured
    assert s["author"] == {"name": "Data Dev", "handle": "@datadev", "verified": True}
    assert s["timestamp"] == "2018-10-10T20:19:24.000Z"
    assert s["metrics"]["views"] == 900
    assert "💬 3  🔁 7  ❤️ 42  👁 900" in r.clean_content
    assert "📷 Media: https://pbs.twimg.com/a.jpg" in r.clean_content


def test_twitter_profile_next_data():
    from webpeel_spark.pure.extractors.twitter import twitter_extractor

    nd = {"data": {"user_results": {"result": {
        "is_blue_verified": False,
        "legacy": {"name": "Data Dev", "screen_name": "datadev",
                   "description": "pipelines", "followers_count": 1234,
                   "friends_count": 56, "statuses_count": 789,
                   "location": "Berlin"}}}}}
    html = (f'<html><body><script id="__NEXT_DATA__" type="application/json">'
            f"{json.dumps(nd)}</script></body></html>")
    r = twitter_extractor(html, "https://x.com/datadev")
    assert r.type == "profile"
    assert r.structured["followers"] == 1234
    assert "👥 1,234 followers" in r.clean_content


def test_twitter_og_fallback():
    from webpeel_spark.pure.extractors.twitter import twitter_extractor

    html = ('<html><head><meta property="og:title" content="Data Dev on X">'
            '<meta property="og:description" content="A tweet&#39;s text"></head>'
            "<body></body></html>")
    r = twitter_extractor(html, "https://x.com/datadev/status/99")
    assert r.structured["author"]["name"] == "Data Dev"
    assert "A tweet's text" in r.structured["text"]


def test_twitter_no_data_returns_none():
    from webpeel_spark.pure.extractors.twitter import twitter_extractor

    assert twitter_extractor("<html><body>login wall</body></html>",
                             "https://twitter.com/someone/status/1") is None
