"""Reference-suite port: src/tests/chunker.test.ts against
pure/chunker.chunk_content (section/paragraph/fixed strategies,
overlap, metadata, edge cases).  The reference wraps chunks in a
result envelope (totalChunks/options/originalLength); the port asserts
on the chunk list directly — the envelope fields are len(chunks),
call args and len(content)."""

import math
import re

from webpeel_spark.pure.chunker import (
    CHARS_PER_TOKEN, DEFAULT_MAX_TOKENS, DEFAULT_OVERLAP, chunk_content,
)


def _content_of_tokens(tokens: int, char: str = "x") -> str:
    return char * (tokens * 4)


# ── section strategy ─────────────────────────────────────────────────────

def test_section_splits_by_headings():
    content = "\n".join([
        "# Introduction", "", "This is the introduction.", "",
        "## Section One", "", "Content for section one.", "",
        "## Section Two", "", "Content for section two.",
    ])
    chunks = chunk_content(content, strategy="section", max_tokens=512)
    assert len(chunks) >= 2


def test_section_large_section_subsplit():
    paras = [f"Para {i + 1}: " + ("word " * 30).strip() for i in range(10)]
    content = "## Large Section\n\n" + "\n\n".join(paras)
    chunks = chunk_content(content, strategy="section", max_tokens=50,
                           overlap=0)
    assert len(chunks) > 1
    assert all(c.section == "Large Section" for c in chunks)


def test_section_heading_in_each_chunk():
    content = "\n".join(["## My Section", "", "Some content here."])
    chunks = chunk_content(content, strategy="section", max_tokens=512)
    assert len(chunks) >= 1
    assert chunks[0].section == "My Section"
    assert chunks[0].section_depth == 2
    assert "## My Section" in chunks[0].text


def test_section_overlap_consecutive_indices():
    paras = [f"Para {i + 1}: " + ("word " * 20).strip() for i in range(20)]
    content = "## Big Section\n\n" + "\n\n".join(paras)
    chunks = chunk_content(content, strategy="section", max_tokens=30,
                           overlap=10)
    if len(chunks) >= 2:
        assert chunks[1].index == chunks[0].index + 1
        assert chunks[1].section == chunks[0].section


# ── paragraph strategy ───────────────────────────────────────────────────

def test_paragraph_groups_paragraphs():
    paras = [f"Paragraph {i + 1} with some content here." for i in range(10)]
    chunks = chunk_content("\n\n".join(paras), strategy="paragraph",
                           max_tokens=512, overlap=0)
    assert len(chunks) == 1
    assert "Paragraph 1" in chunks[0].text
    assert "Paragraph 10" in chunks[0].text


def test_paragraph_respects_max_tokens():
    paras = [_content_of_tokens(50) for _ in range(10)]
    chunks = chunk_content("\n\n".join(paras), strategy="paragraph",
                           max_tokens=60, overlap=0)
    assert len(chunks) > 1
    assert all(c.token_count > 0 for c in chunks)


def test_paragraph_tracks_section_heading():
    content = "\n".join(["## My Topic", "", "Paragraph one here.", "",
                         "Paragraph two here."])
    chunks = chunk_content(content, strategy="paragraph", max_tokens=512)
    assert len(chunks) >= 1
    assert chunks[-1].section == "My Topic"
    assert chunks[-1].section_depth == 2


# ── fixed strategy ───────────────────────────────────────────────────────

def test_fixed_consistent_sizes():
    chunks = chunk_content(_content_of_tokens(1000), strategy="fixed",
                           max_tokens=200, overlap=0)
    assert len(chunks) > 1
    for c in chunks[:-1]:
        assert 0 < len(c.text) <= 200 * 4


def test_fixed_overlap_offsets():
    chunks = chunk_content(_content_of_tokens(2000), strategy="fixed",
                           max_tokens=200, overlap=50)
    assert len(chunks) > 1
    step = 200 * 4 - 50 * 4
    assert chunks[1].start_offset == step


def test_fixed_start_offset_matches_source():
    content = _content_of_tokens(500)
    for c in chunk_content(content, strategy="fixed", max_tokens=100,
                           overlap=0):
        assert content[c.start_offset:c.end_offset].strip() == c.text


# ── edge cases ───────────────────────────────────────────────────────────

def test_empty_content_each_strategy():
    for strategy in ("section", "paragraph", "fixed"):
        assert chunk_content("", strategy=strategy) == []


def test_single_paragraph_section():
    content = "This is a single paragraph of content."
    chunks = chunk_content(content, strategy="section", max_tokens=512)
    assert len(chunks) == 1
    assert chunks[0].text == content


def test_single_paragraph_paragraph_strategy():
    chunks = chunk_content("Just one paragraph here.", strategy="paragraph",
                           max_tokens=512)
    assert len(chunks) == 1


# ── metadata ─────────────────────────────────────────────────────────────

def test_chunk_metadata_correct():
    content = "\n".join([
        "# Title", "", "First section content with several words here.",
        "", "## Second Section", "", "Second section body text.",
    ])
    chunks = chunk_content(content, strategy="section", max_tokens=512)
    assert len(chunks) >= 1
    for i, c in enumerate(chunks):
        assert c.index == i
        assert c.word_count > 0 and c.token_count > 0
        assert c.word_count == len(
            [w for w in re.split(r"\s+", c.text) if w])
        assert c.start_offset >= 0
        assert c.end_offset > c.start_offset


def test_section_depth_h1_h2_h3():
    content = "\n".join([
        "# H1 Section", "", "Content under h1.", "",
        "## H2 Section", "", "Content under h2.", "",
        "### H3 Section", "", "Content under h3.",
    ])
    chunks = chunk_content(content, strategy="section", max_tokens=512)
    depths = {c.section_depth for c in chunks if c.section_depth is not None}
    assert {1, 2, 3} <= depths


# ── defaults ─────────────────────────────────────────────────────────────

def test_default_options_values():
    # chunker.ts defaults: 512 maxTokens, 50 overlap, section strategy
    assert DEFAULT_MAX_TOKENS == 512
    assert DEFAULT_OVERLAP == 50
    assert CHARS_PER_TOKEN == 4
    content = "## Section\n\nSome text."
    assert len(chunk_content(content)) == len(
        chunk_content(content, strategy="section", max_tokens=512,
                      overlap=50))


def test_token_count_is_ceil_len_over_4():
    content = "Hello world. This is content."
    chunks = chunk_content(content)
    assert len(chunks) == 1
    # reference: tokenCount == ceil(text.length / 4) for whole-content
    # chunks (sub-split chunks count tokens on the raw slice length)
    assert chunks[0].token_count == math.ceil(len(chunks[0].text) / 4)
