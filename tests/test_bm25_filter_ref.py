"""Reference-suite port: src/tests/bm25-filter.test.ts (all 30 cases)
against pure/bm25_filter — block segmentation, per-block BM25,
threshold filtering, reduction stats, score comments and the
document-level sigmoid relevance."""

from webpeel_spark.pure.bm25_filter import (
    ContentBlock,
    compute_relevance_score,
    filter_by_relevance,
    score_bm25,
    split_into_blocks,
)


def _blocks(*raws):
    return [ContentBlock(raw, i) for i, raw in enumerate(raws)]


# ── splitIntoBlocks ──────────────────────────────────────────────────────

def test_splits_on_double_newline():
    blocks = split_into_blocks(
        "First paragraph.\n\nSecond paragraph.\n\nThird paragraph.")
    assert len(blocks) == 3
    assert "First" in blocks[0].raw
    assert "Second" in blocks[1].raw
    assert "Third" in blocks[2].raw


def test_merges_heading_with_following_paragraph():
    blocks = split_into_blocks(
        "## Hotel Prices\n\nRooms start at $100 per night.\n\n"
        "This is unrelated.")
    assert len(blocks) == 2
    assert "Hotel Prices" in blocks[0].raw
    assert "Rooms start" in blocks[0].raw


def test_preserves_code_blocks_as_single_unit():
    blocks = split_into_blocks(
        "Some text.\n\n```\nconst x = 1;\nconst y = 2;\n```\n\nMore text.")
    code = [b for b in blocks if "const x" in b.raw]
    assert code and "const y" in code[0].raw
    assert len([b for b in blocks if "const" in b.raw]) == 1


def test_does_not_merge_two_consecutive_headings():
    blocks = split_into_blocks("## Section A\n\n## Section B\n\nContent for B.")
    assert len(blocks) == 2
    assert blocks[0].raw == "## Section A"


# ── scoreBM25 ────────────────────────────────────────────────────────────

def test_zero_scores_for_empty_query_terms():
    assert score_bm25(_blocks("Hello world", "Foo bar"), []) == [0, 0]


def test_zero_scores_for_empty_block_list():
    assert score_bm25([], ["price"]) == []


def test_matching_term_scores_higher():
    scores = score_bm25(_blocks(
        "Hotel room price is $200 per night price price",
        "The quick brown fox jumped over the lazy dog"), ["price"])
    assert scores[0] > scores[1]


def test_idf_higher_for_rare_terms():
    blocks = _blocks("hotel breakfast included",
                     "hotel swimming pool spa",
                     "restaurant dinner wine")
    assert score_bm25(blocks, ["breakfast"])[0] > \
        score_bm25(blocks, ["hotel"])[0]


def test_tf_more_occurrences_scores_higher():
    scores = score_bm25(_blocks("price price price price hotel stays",
                                "price hotel stay"), ["price"])
    assert scores[0] > scores[1]


def test_length_normalisation():
    scores = score_bm25(_blocks(
        "price", ("price " + "filler " * 100).strip()), ["price"])
    assert scores[0] > scores[1]


# ── filterByRelevance — basic ────────────────────────────────────────────

def test_full_content_for_empty_query():
    content = "Paragraph one.\n\nParagraph two."
    r = filter_by_relevance(content, "")
    assert r.content == content
    assert r.reduction_percent == 0


def test_full_content_for_whitespace_query():
    content = "Paragraph one.\n\nParagraph two."
    assert filter_by_relevance(content, "   ").content == content


def test_price_paragraph_kept():
    content = "\n\n".join([
        "Welcome to our amazing hotel website!",
        "Rates and Prices\n\nStandard rooms start at $99 per night. "
        "Deluxe rooms are $149 per night. Suite prices reach $299.",
        "Our restaurant serves breakfast, lunch, and dinner with a wide "
        "variety of dishes.",
        "Contact us via email or phone for reservations.",
    ])
    r = filter_by_relevance(content, "price")
    assert "$99" in r.content
    assert r.kept >= 1
    assert r.total == 5


def test_multi_word_query():
    content = "\n\n".join([
        "Hotel room rates vary by season.",
        "Book now to get the best hotel deal and save money on room prices.",
        "Our spa offers relaxation treatments and massages.",
    ])
    r = filter_by_relevance(content, "hotel room price")
    assert r.kept >= 1 and "hotel" in r.content


def test_headings_kept_with_content():
    content = "\n\n".join([
        "## Pricing Information",
        "Standard: $100/night. Deluxe: $200/night.",
        "## About Us",
        "We are a family-run hotel established in 1990.",
    ])
    r = filter_by_relevance(content, "price")
    assert "Pricing Information" in r.content and "$100" in r.content


def test_code_blocks_preserved_whole():
    content = "\n\n".join([
        "Here is an example API call for pricing:",
        "```\nGET /api/prices\nAuthorization: Bearer token\n```",
        "The above code queries the pricing endpoint.",
        "This is totally unrelated content about gardening and flowers.",
    ])
    r = filter_by_relevance(content, "api prices endpoint")
    if "GET /api" in r.content:
        assert "Authorization" in r.content


def test_document_order_maintained():
    content = "\n\n".join([
        "Alpha: price tag on first item.",
        "Beta: weather is nice today.",
        "Gamma: price reduction on second item.",
        "Delta: cooking recipes for dinner.",
        "Epsilon: price comparison chart.",
    ])
    r = filter_by_relevance(content, "price")
    a, g, e = (r.content.index("Alpha"), r.content.index("Gamma"),
               r.content.index("Epsilon"))
    assert 0 <= a < g < e


def test_never_empty_falls_back_to_top3():
    content = "\n\n".join([
        "First paragraph about apples.",
        "Second paragraph about oranges.",
        "Third paragraph about bananas.",
        "Fourth paragraph about grapes.",
        "Fifth paragraph about mangoes.",
    ])
    r = filter_by_relevance(content, "zzz_xkcd_nomatch_xyz", threshold=9999)
    assert r.kept == 3 and r.content.strip()


# ── threshold ────────────────────────────────────────────────────────────

def test_auto_threshold_keeps_above_half_mean():
    content = "\n\n".join([
        "Price: $100 per room per night price price.",
        "The sky is blue and the grass is green.",
        "Weather today is sunny and warm with a light breeze.",
        "Price reduced to $80 for weekend stays price.",
    ])
    r = filter_by_relevance(content, "price")
    assert "$100" in r.content and "sky is blue" not in r.content


def test_threshold_zero_keeps_all():
    r = filter_by_relevance("First.\n\nSecond.\n\nThird.", "price",
                            threshold=0)
    assert r.kept == r.total


def test_very_high_threshold_fallback():
    content = "\n\n".join([
        "First about price.", "Second about weather.", "Third about food.",
        "Fourth about travel.", "Fifth about price again.",
    ])
    assert filter_by_relevance(content, "price", threshold=99999).kept == 3


# ── reduction percentage ─────────────────────────────────────────────────

def test_reduction_percent_accurate():
    content = "\n\n".join([
        "Price: $100 per room price price price.",
        "The sky is blue today and it is warm.",
        "Weather forecast says rain tomorrow.",
        "Temperature will drop over the weekend.",
    ])
    r = filter_by_relevance(content, "price")
    if r.kept < r.total:
        assert 0 < r.reduction_percent <= 100
        assert len(r.content) < len(content)


def test_reduction_zero_when_all_kept():
    r = filter_by_relevance("Just one paragraph.", "paragraph")
    assert r.kept == 1 and r.kept == r.total


# ── includeScores ────────────────────────────────────────────────────────

def test_include_scores_comments():
    r = filter_by_relevance("Price is $100.\n\nWeather is nice.", "price",
                            include_scores=True)
    assert "<!-- BM25:" in r.content


def test_no_score_comments_by_default():
    r = filter_by_relevance("Price is $100.\n\nWeather is nice.", "price")
    assert "<!-- BM25:" not in r.content


# ── real-world scenarios ─────────────────────────────────────────────────

def test_article_with_sidebar():
    content = "\n\n".join([
        "# Booking a Hotel Room in Paris\n\nFinding the best hotel price "
        "in Paris requires comparing multiple booking sites. Look for "
        "deals on room rates and price drops.",
        "Paris is the capital of France and a major tourist destination "
        "with world-class museums.",
        "## Related Articles\n\n- [Best Restaurants in Paris](#)\n"
        "- [Top Museums](#)\n- [Shopping Guide](#)",
        "## Navigation\n\nHome | About | Contact | Privacy Policy | "
        "Terms of Service",
        "## Room Pricing Guide\n\nBudget hotels: $50-100/night. "
        "Mid-range price: $100-200. Luxury: $200+ per night.",
    ])
    r = filter_by_relevance(content, "hotel room price")
    assert "room" in r.content and r.kept < r.total


def test_long_mixed_relevance():
    content = "\n\n".join([
        "Introduction to our travel blog.",
        "Paris hotel prices range from budget to luxury. Price per night "
        "varies widely.",
        "The Eiffel Tower was built in 1889 for the World Fair.",
        "Louvre Museum houses the Mona Lisa painting.",
        "Best times to visit: spring and autumn for mild weather.",
        "Hotel booking tips: book price in advance for lower room rates.",
        "Transportation options include metro, bus, and taxi.",
        "Local cuisine features baguettes, croissants, and wine.",
    ])
    r = filter_by_relevance(content, "hotel price room")
    assert 1 <= r.kept < r.total and "hotel" in r.content


def test_stopword_query_works():
    content = "\n\n".join([
        "The price of a standard room is $100 per night.",
        "The weather in the area is a pleasant mix of sun and clouds.",
        "A new restaurant opened near the hotel with a great menu.",
    ])
    r = filter_by_relevance(content, "the a price")
    assert r.kept >= 1 and r.content


def test_single_word_query():
    content = "\n\n".join([
        "Price: $100 per night.", "Location: Downtown Paris.",
        "Amenities: WiFi, pool, breakfast.",
    ])
    r = filter_by_relevance(content, "price")
    assert r.kept >= 1 and "$100" in r.content


def test_markdown_links_still_score():
    content = "\n\n".join([
        "[Check hotel prices here](https://example.com/prices) — great "
        "deals available.",
        "The weather today is cloudy with a chance of rain.",
        "Local events include a farmers market every Saturday morning.",
    ])
    assert filter_by_relevance(content, "hotel price").kept >= 1


# ── edge cases ───────────────────────────────────────────────────────────

def test_empty_content():
    r = filter_by_relevance("", "price")
    assert (r.kept, r.total, r.reduction_percent) == (0, 0, 0)


def test_single_block_content():
    r = filter_by_relevance("Just one paragraph with no double newlines.",
                            "paragraph")
    assert r.total == 1 and r.kept == 1


def test_kept_bounded_by_total():
    content = "\n\n".join([
        "Price information here.", "Weather is nice.",
        "Room bookings available.", "Random unrelated text.",
    ])
    r = filter_by_relevance(content, "price room")
    assert 0 < r.kept <= r.total


# ── computeRelevanceScore ────────────────────────────────────────────────

def test_relevance_zero_for_empty_content():
    assert compute_relevance_score("", "test query") == 0


def test_relevance_zero_for_empty_query():
    assert compute_relevance_score("Some content here.", "") == 0


def test_relevance_high_for_relevant():
    s = compute_relevance_score(
        "Python is the best programming language for AI and machine "
        "learning in 2025.",
        "best programming languages 2025")
    assert s > 0.5


def test_relevance_low_for_irrelevant():
    s = compute_relevance_score(
        "This is a recipe for chocolate cake. You need flour, sugar, "
        "and eggs.",
        "best programming languages 2025")
    assert s < 0.1


def test_relevance_ranks():
    rel = compute_relevance_score(
        "JavaScript and Python are top programming languages to learn in "
        "2025 for web development.",
        "best programming languages 2025")
    irrel = compute_relevance_score(
        "The weather forecast shows sunny skies with temperatures around "
        "75 degrees.",
        "best programming languages 2025")
    assert rel > irrel


def test_relevance_between_0_and_1():
    s = compute_relevance_score(
        "Cloudflare uses bot detection with machine learning models and "
        "JavaScript challenges.",
        "how does cloudflare bot detection work")
    assert 0 <= s <= 1


def test_relevance_larger_docs_not_lower():
    short = compute_relevance_score(
        "Python is a programming language.", "best programming languages")
    long = compute_relevance_score("\n\n".join([
        "Python is the best programming language for AI.",
        "JavaScript leads web programming.",
        "Rust is a fast systems programming language.",
        "Go is great for cloud programming.",
    ]), "best programming languages")
    assert long >= short
