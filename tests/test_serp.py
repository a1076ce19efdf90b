"""Google SERP parser (google-serp-parser.ts port) — all 11 blocks
pinned on a synthetic SERP covering every selector family.  The
reference has no dedicated vitest suite (exercised via live search);
fixtures here use the same class names its selectors target.
"""

from __future__ import annotations

from webpeel_spark.pure.serp import parse_google_serp

SERP_HTML = """<html><body>
<div id="result-stats">About 1,230,000 results (0.45 seconds)</div>
<div id="search">
  <div class="g">
    <a href="https://example.com/page1"><h3>First Result</h3></a>
    <div class="VwiC3b">Snippet for the first result.</div>
    <div class="LEwnzc"><span>Jan 2, 2026</span></div>
    <div class="fl"><a href="https://example.com/sub1">Sub One</a></div>
  </div>
  <div class="g">
    <a href="https://other.org/post"><h3>Second Result</h3></a>
    <span class="aCOpRe">Second snippet text.</span>
  </div>
  <div class="g">
    <a href="https://example.com/page1"><h3>Duplicate URL skipped</h3></a>
  </div>
  <div class="g">
    <a href="https://www.google.com/search?q=x"><h3>Google internal</h3></a>
  </div>
  <div class="g" data-text-ad="1">
    <a href="https://ads.example.com/x"><h3>Ad block</h3></a>
  </div>
</div>
<div class="kp-wholepage">
  <h2>Acme Corp</h2>
  <div class="wwUB2c">Organization</div>
  <div class="kno-rdesc"><span>Makers of fine anvils.</span>
    <a href="https://en.wikipedia.org/wiki/Acme">Wikipedia</a></div>
  <div data-attrid="kc:ceo"><span class="w8qArf">CEO:</span>
    <span class="LrzXr">Wile E. Coyote</span></div>
</div>
<div class="related-question-pair">
  <div data-q="What does Acme make?">What does Acme make?</div>
  <div class="wDYxhc">Acme makes anvils and rockets.</div>
  <a href="https://acme.com/faq">acme.com</a>
</div>
<div class="xpdopen" data-hveid="1">
  <div class="hgKElc">Anvils are heavy blocks used by blacksmiths
  for shaping metal objects by hand.</div>
  <a href="https://anvilpedia.org/def"><cite>anvilpedia.org</cite></a>
</div>
<a class="k8XOCe" href="#">acme anvil weight</a>
<a class="k8XOCe" href="#">acme rocket specs</a>
<div class="sh-dgr__content">
  <div class="tAxDx">Anvil 2000</div>
  <div class="a8Pemb">$199.99</div>
  <div class="aULzUe">Acme Store</div>
  <a href="https://store.acme.com/anvil-2000"><img src="https://img.acme.com/a.jpg"></a>
  <span class="Rsc7Yb">4.8</span><span class="GpVvtc">(1,234)</span>
</div>
<div class="SoaBEf">
  <div role="heading">Acme unveils anvil</div>
  <a href="https://news.example.com/acme"><img src="https://img.news/n.jpg"></a>
  <div class="NUnG9d">Example News</div>
  <div class="OSrXXb">2 hours ago</div>
  <div class="GI74Re">The storied anvil maker...</div>
</div>
<div class="isv-r"><a href="https://pics.example.com/anvil" aria-label="Anvil photo">
  <img src="https://img.example.com/anvil.jpg" alt="An anvil"></a></div>
<div class="RzdJxc">
  <h3>Anvil drop test</h3>
  <a href="https://youtube.com/watch?v=abc"><img src="https://i.ytimg.com/t.jpg"></a>
  <span class="J1mWY">3:45</span>
</div>
<div class="VkpGBb">
  <div class="dbg0pd">Acme Outlet</div>
  <span class="MW4etd">4.2</span><span class="UY7F9">(89)</span>
  <div class="lMbq3e">1 Desert Rd</div>
  <div class="YhemCb">Hardware store</div>
</div>
</body></html>"""


class TestSerp:
    def setup_method(self):
        self.r = parse_google_serp(SERP_HTML)

    def test_organic_results(self):
        organic = self.r["organic_results"]
        assert [o["url"] for o in organic] == [
            "https://example.com/page1", "https://other.org/post"]
        assert organic[0]["position"] == 1
        assert organic[0]["title"] == "First Result"
        assert organic[0]["snippet"] == "Snippet for the first result."
        assert organic[0]["date"] == "Jan 2, 2026"
        assert organic[0]["sitelinks"] == [
            {"title": "Sub One", "url": "https://example.com/sub1"}]
        assert organic[1]["snippet"] == "Second snippet text."

    def test_ad_dup_and_internal_skipped(self):
        titles = [o["title"] for o in self.r["organic_results"]]
        assert "Ad block" not in titles
        assert "Google internal" not in titles
        assert "Duplicate URL skipped" not in titles

    def test_knowledge_panel(self):
        kp = self.r["knowledge_panel"]
        assert kp["title"] == "Acme Corp"
        assert kp["type"] == "Organization"
        assert kp["description"] == "Makers of fine anvils."
        assert kp["source"] == "Wikipedia"
        assert kp["source_url"] == "https://en.wikipedia.org/wiki/Acme"
        assert kp["attributes"] == {"CEO": "Wile E. Coyote"}

    def test_people_also_ask(self):
        paa = self.r["people_also_ask"]
        assert paa[0]["question"] == "What does Acme make?"
        assert paa[0]["snippet"] == "Acme makes anvils and rockets."
        assert paa[0]["source_url"] == "https://acme.com/faq"

    def test_featured_snippet(self):
        fs = self.r["featured_snippet"]
        assert fs["text"].startswith("Anvils are heavy blocks")
        assert fs["type"] == "paragraph"
        assert fs["source_url"] == "https://anvilpedia.org/def"
        assert fs["source"] == "anvilpedia.org"

    def test_related_searches(self):
        assert self.r["related_searches"] == [
            "acme anvil weight", "acme rocket specs"]

    def test_shopping(self):
        shop = self.r["shopping_results"][0]
        assert shop["title"] == "Anvil 2000"
        assert shop["price"] == "$199.99"
        assert shop["source"] == "Acme Store"
        assert shop["url"] == "https://store.acme.com/anvil-2000"
        assert shop["rating"] == 4.8
        assert shop["review_count"] == 1234

    def test_news(self):
        news = self.r["news_results"][0]
        assert news["title"] == "Acme unveils anvil"
        assert news["url"] == "https://news.example.com/acme"
        assert news["source"] == "Example News"
        assert news["date"] == "2 hours ago"

    def test_image_pack(self):
        img = self.r["image_pack"][0]
        assert img["url"] == "https://pics.example.com/anvil"
        assert img["image_url"] == "https://img.example.com/anvil.jpg"
        assert img["title"] == "An anvil"

    def test_videos(self):
        vid = self.r["video_results"][0]
        assert vid["title"] == "Anvil drop test"
        assert vid["platform"] == "YouTube"
        assert vid["duration"] == "3:45"

    def test_local_pack(self):
        loc = self.r["local_pack"][0]
        assert loc["name"] == "Acme Outlet"
        assert loc["rating"] == 4.2
        assert loc["review_count"] == 89
        assert loc["address"] == "1 Desert Rd"
        assert loc["type"] == "Hardware store"

    def test_stats(self):
        assert self.r["total_results"] == "1,230,000"
        assert self.r["search_time"] == "0.45"

    def test_empty_page(self):
        r = parse_google_serp("<html><body><p>no serp here</p></body></html>")
        assert r["organic_results"] == []
        assert "knowledge_panel" not in r
