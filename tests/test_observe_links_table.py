"""Ports of the reference's observe / links / table-format modules.

The reference ships no dedicated vitest suites for these three (observe
is exercised through browser integration tests, N/A here) — these pin
the ported pure logic branch-for-branch, including the docstring
example from observe.ts:340-351 and table-format.ts:73-82."""

from __future__ import annotations

from webpeel_spark.pure.links import extract_link_pairs
from webpeel_spark.pure.observe import observe_html
from webpeel_spark.pure.table_format import (
    format_listings_csv,
    format_table,
    normalise_extracted_to_rows,
    render_listings_table,
)


# ── links.ts ────────────────────────────────────────────────────────────

class TestLinkPairs:
    def test_basic_pairs(self):
        html = ('<html><body><a href="https://a.com/x">First  link</a>'
                '<a href="/rel">Relative</a></body></html>')
        links = extract_link_pairs(html, "https://base.org/dir/")
        assert links == [
            {"url": "https://a.com/x", "text": "First link"},
            {"url": "https://base.org/rel", "text": "Relative"},
        ]

    def test_skips_non_http_schemes(self):
        html = ('<a href="#frag">A</a><a href="javascript:void(0)">B</a>'
                '<a href="mailto:x@y.com">C</a><a href="tel:+1555">D</a>'
                '<a href="data:text/plain,x">E</a>'
                '<a href="https://ok.com">F</a>')
        links = extract_link_pairs(html)
        assert links == [{"url": "https://ok.com", "text": "F"}]

    def test_dedupes_by_resolved_url(self):
        html = ('<a href="https://a.com/p">One</a>'
                '<a href="https://a.com/p">Two</a>')
        links = extract_link_pairs(html)
        assert len(links) == 1
        assert links[0]["text"] == "One"  # first occurrence wins

    def test_relative_without_base_kept_raw(self):
        links = extract_link_pairs('<a href="/x">X</a>')
        assert links == [{"url": "/x", "text": "X"}]

    def test_empty_html(self):
        assert extract_link_pairs("") == []

    def test_whitespace_collapsed_text(self):
        html = '<a href="https://a.com">  multi\n  word \t text </a>'
        assert extract_link_pairs(html)[0]["text"] == "multi word text"


# ── table-format.ts ─────────────────────────────────────────────────────

class TestFormatTable:
    def test_docstring_example(self):
        table = format_table([
            {"title": "Widget A", "price": "$10"},
            {"title": "Widget B", "price": "$20"},
        ])
        assert table == (
            "┌──────────┬───────┐\n"
            "│ Title    │ Price │\n"
            "├──────────┼───────┤\n"
            "│ Widget A │ $10   │\n"
            "│ Widget B │ $20   │\n"
            "└──────────┴───────┘"
        )

    def test_empty_rows(self):
        assert format_table([]) == ""

    def test_all_empty_columns_omitted(self):
        table = format_table([{"a": "x", "b": ""}, {"a": "y", "b": None}])
        assert "B" not in table
        assert "│ A" in table.split("\n")[1]

    def test_truncation_at_40(self):
        long = "x" * 60
        table = format_table([{"col": long}])
        row = table.split("\n")[3]
        assert "x" * 39 + "…" in row
        assert "x" * 41 not in table

    def test_min_width_3(self):
        table = format_table([{"a": "b"}])
        # width = max(3, len('A')=1) = 3 → cells padded to 3 + 2 spaces
        assert table.split("\n")[0] == "┌─────┐"

    def test_explicit_columns(self):
        table = format_table([{"a": "1", "b": "2"}], columns=["b"])
        assert "A" not in table.split("\n")[1]
        assert "B" in table.split("\n")[1]

    def test_column_order_first_seen(self):
        table = format_table([{"z": "1"}, {"a": "2", "z": "3"}])
        header = table.split("\n")[1]
        assert header.index("Z") < header.index("A")


# ── cli listing rendering (fetch.ts --table/--csv, utils.ts:733-789) ────

class TestListingRendering:
    ITEMS = [
        {"title": "Widget A", "price": "$10", "rating": None},
        {"title": 'Widget "B", deluxe', "price": "$20", "rating": "4.5"},
    ]

    def test_render_listings_table_byte_exact(self):
        # None-valued keys dropped per row (fetch.ts:1182-1186), then
        # the rating column survives via row 2
        assert render_listings_table(self.ITEMS) == (
            "┌────────────────────┬───────┬────────┐\n"
            "│ Title              │ Price │ Rating │\n"
            "├────────────────────┼───────┼────────┤\n"
            "│ Widget A           │ $10   │        │\n"
            '│ Widget "B", deluxe │ $20   │ 4.5    │\n'
            "└────────────────────┴───────┴────────┘"
        )

    def test_csv_byte_exact(self):
        assert format_listings_csv(self.ITEMS) == (
            "title,price,rating\n"
            '"Widget A","$10",""\n'
            '"Widget ""B"", deluxe","$20","4.5"\n'
        )

    def test_csv_empty(self):
        assert format_listings_csv([]) == ""

    def test_normalise_zips_parallel_lists(self):
        rows = normalise_extracted_to_rows(
            {"name": ["a", "b"], "price": [1, None]})
        assert rows == [{"name": "a", "price": "1"},
                        {"name": "b", "price": None}]

    def test_normalise_single_row(self):
        rows = normalise_extracted_to_rows({"name": "x", "count": 3})
        assert rows == [{"name": "x", "count": "3"}]


# ── observe.ts ──────────────────────────────────────────────────────────

OBSERVE_HTML = """<html><head><title>Demo Shop</title></head><body>
  <a href="/products">Browse products</a>
  <a href="https://docs.example.com" target="_blank">Docs</a>
  <button id="buy-now">Buy now</button>
  <button aria-label="Close dialog">×</button>
  <form action="/search" method="get" id="searchform">
    <input type="search" name="q" placeholder="Search..." required>
    <input type="hidden" name="csrf" value="token">
    <input type="submit" value="Go">
    <select name="sort">
      <option>Relevance</option><option>Price</option>
      <option>Rating</option>
    </select>
    <textarea name="notes" placeholder="Notes"></textarea>
  </form>
  <img src="/hero.png" alt="Hero image">
  <div style="display:none"><a href="/secret">Hidden link</a></div>
  <span hidden><button>Invisible</button></span>
</body></html>"""


class TestObserve:
    def setup_method(self):
        self.result = observe_html(OBSERVE_HTML,
                                   "https://shop.example.com/")

    def test_title_and_url(self):
        assert self.result["title"] == "Demo Shop"
        assert self.result["url"] == "https://shop.example.com/"

    def test_links_with_refs(self):
        links = self.result["elements"]["links"]
        assert [l["ref"] for l in links] == ["link-0", "link-1"]
        assert links[0]["text"] == "Browse products"
        assert links[0]["selector"] == 'a[href="\\/products"]'
        assert links[0]["role"] == "link"
        assert links[1]["attributes"]["target"] == "_blank"

    def test_hidden_elements_excluded(self):
        texts = [l["text"] for l in self.result["elements"]["links"]]
        assert "Hidden link" not in texts
        btn_texts = [b["text"] for b in self.result["elements"]["buttons"]]
        assert "Invisible" not in btn_texts

    def test_buttons(self):
        buttons = self.result["elements"]["buttons"]
        # 2 <button> + input[type=submit]
        assert len(buttons) == 3
        assert buttons[0]["selector"] == "#buy-now"
        assert buttons[1]["text"] == "Close dialog"  # aria-label wins
        # CSS.escape backslash-escapes spaces too
        assert buttons[1]["selector"] == \
            'button[aria-label="Close\\ dialog"]'
        assert buttons[2]["role"] == "submit"

    def test_inputs_exclude_hidden_and_submit(self):
        inputs = self.result["elements"]["inputs"]
        assert [i["tag"] for i in inputs] == ["input", "textarea"]
        assert inputs[0]["attributes"]["type"] == "search"
        # textarea attrs carry placeholder/name only (no type key),
        # matching the reference's getAttributes
        assert "type" not in inputs[1]["attributes"]
        assert inputs[0]["role"] == "search"
        assert inputs[0]["attributes"]["required"] == "true"
        assert inputs[0]["selector"] == 'input[name="q"]'

    def test_select_options(self):
        sel = self.result["elements"]["selects"][0]
        assert sel["role"] == "listbox"
        assert sel["attributes"]["options"] == "Relevance | Price | Rating"

    def test_form_fields_count(self):
        form = self.result["elements"]["forms"][0]
        assert form["selector"] == "#searchform"
        assert form["attributes"]["action"] == "/search"
        assert form["attributes"]["method"] == "get"
        assert form["attributes"]["fields"] == "5"

    def test_media(self):
        media = self.result["elements"]["media"]
        assert media[0]["role"] == "image"
        assert media[0]["attributes"]["alt"] == "Hero image"

    def test_total_and_summary(self):
        r = self.result
        assert r["totalElements"] == sum(
            len(v) for v in r["elements"].values())
        assert r["summary"].startswith('Page: "Demo Shop" — 2 links, '
                                       '3 buttons, 2 inputs, 1 selects, '
                                       '1 forms, 1 media')
        assert '[button-0] "Buy now"' in r["summary"]
        assert "[input-0]" in r["summary"]

    def test_scoped_selector(self):
        r = observe_html(OBSERVE_HTML, selector="form")
        assert len(r["elements"]["links"]) == 0
        assert len(r["elements"]["inputs"]) == 2

    def test_max_elements_cap(self):
        html = "<body>" + "".join(
            f'<a href="/p{i}">L{i}</a>' for i in range(80)) + "</body>"
        r = observe_html(html, max_elements=50)
        assert len(r["elements"]["links"]) == 50

    def test_empty_page(self):
        r = observe_html("<html><body><p>nothing</p></body></html>")
        assert r["totalElements"] == 0


class TestEnvelopeLinkPairs:
    def test_envelope_matches_standalone_extractor(self):
        """The pipeline's link_pairs column (shared anchor walk) must
        equal the standalone links.ts port run on the same page."""
        from webpeel_spark.pure.pipeline import extract_page
        from webpeel_spark.sources.corpus import generate_rows

        checked = 0
        for row in generate_rows(40, 42):
            result = extract_page(row["url"], row["html"])
            if result["branch"] != "html":
                assert result["link_pairs"] == []
                continue
            html = row["html"].decode("utf-8", errors="replace")
            expected = extract_link_pairs(
                html[:100000] if len(html) > 100000 else html, row["url"])
            assert result["link_pairs"] == expected, row["url"]
            if expected:
                checked += 1
        assert checked >= 5  # corpus genuinely exercises the path

    def test_link_pairs_urls_subset_relationship(self):
        """Every url in link_pairs resolves from the same anchors the
        url-only list saw (pair list may keep non-http schemes the
        url-only list drops — both faithful to their references)."""
        from webpeel_spark.pure.pipeline import extract_page
        from webpeel_spark.sources.corpus import generate_rows

        for row in generate_rows(20, 42):
            r = extract_page(row["url"], row["html"])
            if r["branch"] != "html" or not r["links"]:
                continue
            pair_urls = {p["url"] for p in r["link_pairs"]}
            # http(s) links in the url-only list come from the same
            # anchor walk → each appears among the pair urls
            for u in r["links"]:
                if u.startswith(("http://", "https://")):
                    assert u in pair_urls or u.rstrip("/") in pair_urls
