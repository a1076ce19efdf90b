"""budget.ts + extract-listings.ts ports: distillation steps and
listing container detection/extraction."""

from webpeel_spark.pure.budget import (
    budget_listings, compress_tables, distill_to_budget, hard_truncate,
    remove_boilerplate_sections, remove_images, remove_weak_paragraphs,
)
from webpeel_spark.pure.listings import (
    child_signature, extract_listings, is_header_or_junk,
    signatures_are_similar, strip_title_prefixes,
)
from webpeel_spark.dom import parse_html


# ── budget ───────────────────────────────────────────────────────────────

def test_under_budget_untouched():
    assert distill_to_budget("short text", 100) == "short text"


def test_remove_images_alt_rules():
    s = "a ![Nice diagram](x.png) b ![](y.png) c ![" + "x" * 80 + "](z.png) d"
    out = remove_images(s)
    assert "[Image: Nice diagram]" in out
    assert "y.png" not in out and "z.png" not in out
    assert "[Image: ]" not in out


def test_boilerplate_section_removal_depth():
    md = ("# Real\n\nkeep\n\n## Cookie Policy\n\ndrop me\n\n### sub of cookie\n\n"
          "also dropped\n\n## Next Real\n\nkept again")
    out = remove_boilerplate_sections(md)
    assert "keep" in out and "kept again" in out
    assert "drop me" not in out and "also dropped" not in out
    assert "## Next Real" in out


def test_table_compression_three_rows_plus_note():
    rows = "\n".join(f"| r{i} | {i} |" for i in range(10))
    md = "| A | B |\n| --- | --- |\n" + rows
    out = compress_tables(md)
    assert "| r0 |" in out and "| r2 |" in out
    assert "| r3 |" not in out
    assert "additional rows omitted" in out
    assert out.count("omitted") == 1


def test_weak_paragraph_removal_keeps_headings():
    md = "# Head\n\n" + "word " * 200 + "\n\nok\n\nx y"
    out = remove_weak_paragraphs(md, 10)
    assert "# Head" in out
    assert "\n\nok" not in out  # short, weak paragraph removed


def test_hard_truncate_notice():
    content = "\n".join(f"line {i} with some words" for i in range(100))
    out = hard_truncate(content, 20)
    assert out.endswith("[Content distilled to fit budget]")
    assert len(out) < len(content)


def test_json_array_binary_search():
    import json
    content = json.dumps([{"k": i, "text": "x" * 20} for i in range(50)])
    out = distill_to_budget(content, 100, fmt="json")
    parsed = json.loads(out)
    assert isinstance(parsed, list)
    assert 0 < len(parsed) < 50


def test_budget_listings_math():
    assert budget_listings(100, 200) == {
        "max_items": 4, "truncated": True, "total_available": 100}
    assert budget_listings(3, 10000) == {
        "max_items": 3, "truncated": False, "total_available": 3}


# ── listings ─────────────────────────────────────────────────────────────

EBAY_ISH = """<html><body>
<h1>Results</h1>
<ul class="srp-results">
""" + "\n".join(
    f'<li class="s-item"><img src="/p{i}.jpg">'
    f'<div class="s-item__title"><a href="/itm/{i}">New Listing Vintage Camera Model {i}</a></div>'
    f'<span class="s-item__price">${i + 10}.99</span>'
    f'<p class="s-item__subtitle">Excellent condition unit number {i}</p></li>'
    for i in range(6)
) + """
</ul></body></html>"""

HN_ISH = """<html><body><table><tbody>
""" + "\n".join(
    f'<tr class="athing"><td class="title">{i + 1}.</td><td class="votelinks"><a href="/vote?id={i}">^</a></td>'
    f'<td class="title"><a href="https://example.com/story{i}">Interesting Story Number {i} About Things</a></td></tr>'
    f'<tr><td colspan="2"></td><td class="subtext"><a href="/user?id=u{i}">u{i}</a></td></tr>'
    for i in range(5)
) + """
</tbody></table></body></html>"""


def test_child_signature_counts():
    root = parse_html("<div><ul><li><a>x</a><a>y</a><span>z</span></li></ul></div>")
    li = [e for e in root.iter_elements() if e.tag == "li"][0]
    assert child_signature(li) == "a:2,span:1"


def test_signature_similarity():
    assert signatures_are_similar("td:3", "td:3")
    assert not signatures_are_similar("td:3", "td:2")  # HN-critical
    assert signatures_are_similar("a:1,img:1,span:2", "a:1,img:1,span:2,p:1")


def test_title_strippers():
    assert strip_title_prefixes("New Listing Vintage Camera") == "Vintage Camera"
    assert strip_title_prefixes("Cool Gadget Opens in a new window or tab") == "Cool Gadget"
    assert is_header_or_junk("Results")
    assert is_header_or_junk("10.")
    assert not is_header_or_junk("Vintage Camera Model 3")


def test_extract_listings_ebay_ish():
    items = extract_listings(EBAY_ISH, "https://www.ebay.com/sch/")
    assert len(items) == 6
    assert items[0]["title"] == "Vintage Camera Model 0"  # prefix stripped
    assert items[0]["price"] == "$10.99"
    assert items[0]["link"] == "https://www.ebay.com/itm/0"
    assert items[0]["image"] == "https://www.ebay.com/p0.jpg"
    assert "Excellent condition" in items[0]["description"]


def test_extract_listings_hn_table_rows():
    items = extract_listings(HN_ISH, "https://news.ycombinator.com/")
    # story rows (3 td) must win over subtext rows (2 td); rank "1." junk-filtered
    titles = [i["title"] for i in items]
    assert any("Interesting Story Number 0" in t for t in titles)
    assert all("u0" != t for t in titles)
    links = [i["link"] for i in items]
    assert "https://example.com/story0" in links


def test_extract_listings_no_pattern():
    assert extract_listings("<html><body><p>just text</p></body></html>") == []
    assert extract_listings("") == []
