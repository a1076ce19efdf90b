"""Reference-suite port: src/tests/chunking.test.ts (27 cases) against
the new pure/chunking.py (chunking.ts port — the LLM-context chunker
with fixed/semantic/paragraph strategies)."""

import re

from webpeel_spark.pure.chunking import chunk_llm_content, estimate_tokens


def make_content(tokens, char="x"):
    return char * (tokens * 4)


def make_paragraphs(count, paragraph_tokens):
    return "\n\n".join(
        f"Paragraph {i + 1}: " + ("word " * (paragraph_tokens * 4 // 5)).strip()
        for i in range(count))


# ── estimateTokens ───────────────────────────────────────────────────────

def test_estimate_empty():
    assert estimate_tokens("") == 0


def test_estimate_ceil():
    assert estimate_tokens("abcd") == 1
    assert estimate_tokens("abcde") == 2
    assert estimate_tokens("a" * 100) == 25


# ── fixed strategy ───────────────────────────────────────────────────────

def test_fixed_single_chunk_fits():
    content = make_content(100)
    r = chunk_llm_content(content, strategy="fixed", chunk_size=200, overlap=0)
    assert len(r.chunks) == 1
    assert r.chunks[0].content == content
    assert r.chunks[0].is_last is True
    assert r.chunks[0].start_offset == 0


def test_fixed_chunk_count_exact():
    r = chunk_llm_content(make_content(2000), strategy="fixed",
                          chunk_size=500, overlap=0)
    assert r.total_chunks == 4 and len(r.chunks) == 4


def test_fixed_overlap_matches():
    r = chunk_llm_content(make_content(2000), strategy="fixed",
                          chunk_size=500, overlap=100)
    overlap_chars = 100 * 4
    for a, b in zip(r.chunks, r.chunks[1:]):
        assert a.content[-overlap_chars:] == b.content[:overlap_chars]


def test_fixed_start_offsets():
    content = make_content(1000)
    r = chunk_llm_content(content, strategy="fixed", chunk_size=250, overlap=0)
    for c in r.chunks:
        assert content[c.start_offset:c.start_offset + len(c.content)] \
            == c.content


def test_fixed_is_last():
    r = chunk_llm_content(make_content(800), strategy="fixed",
                          chunk_size=200, overlap=0)
    for i, c in enumerate(r.chunks):
        assert c.is_last is (i == len(r.chunks) - 1)


def test_fixed_token_estimates():
    r = chunk_llm_content(make_content(2000), strategy="fixed",
                          chunk_size=500, overlap=0)
    for c in r.chunks:
        assert c.tokens == estimate_tokens(c.content)


def test_fixed_custom_size_overlap():
    r = chunk_llm_content(make_content(600), strategy="fixed",
                          chunk_size=100, overlap=25)
    assert r.total_chunks > 1
    assert all(len(c.content) <= 100 * 4 for c in r.chunks)


def test_fixed_empty():
    r = chunk_llm_content("", strategy="fixed")
    assert (len(r.chunks), r.total_chunks, r.total_tokens,
            r.original_tokens) == (0, 0, 0, 0)


def test_fixed_very_short():
    r = chunk_llm_content("Hello world", strategy="fixed", chunk_size=4000)
    assert len(r.chunks) == 1 and r.chunks[0].content == "Hello world"


def test_fixed_original_tokens():
    content = "The quick brown fox jumps over the lazy dog."
    r = chunk_llm_content(content, strategy="fixed", chunk_size=4000)
    assert r.original_tokens == estimate_tokens(content)


# ── semantic strategy ────────────────────────────────────────────────────

def test_semantic_splits_at_headings():
    filler = "word " * 792
    rest = "\n## Section Two\n\nMore content. " + "extra text. " * 500
    r = chunk_llm_content(filler + rest, strategy="semantic",
                          chunk_size=1000, overlap=0)
    assert r.total_chunks >= 2
    assert re.match(r"^## Section Two", r.chunks[1].content.lstrip())


def test_semantic_splits_at_paragraphs():
    para1 = "First paragraph with some content here. " * 100
    para2 = "Second paragraph starts here. " * 50
    r = chunk_llm_content(para1 + "\n\n" + para2, strategy="semantic",
                          chunk_size=1000, overlap=0)
    assert r.total_chunks > 1
    assert (r.chunks[1].content.strip().startswith("Second paragraph")
            or any("Second paragraph starts here" in c.content
                   for c in r.chunks))


def test_semantic_no_mid_sentence_cut():
    long_sentence = ("This is a very important sentence that should not be "
                     "cut in the middle at all. ")
    filler = "Padding. " * 440
    content = filler + long_sentence + "Next sentence follows after. " * 100
    r = chunk_llm_content(content, strategy="semantic", chunk_size=1000,
                          overlap=0)
    for c in r.chunks[:-1]:
        assert re.match(r"[\s.!?\n]", c.content[-1])


def test_semantic_code_block_not_split():
    before = "Some prose before the code. " * 100
    code = "```javascript\nconst x = 1;\nconsole.log(x);\n```"
    after = "\n\nSome prose after the code block."
    r = chunk_llm_content(before + "\n\n" + code + after,
                          strategy="semantic", chunk_size=100, overlap=0)
    assert any("```javascript" in c.content and "console.log" in c.content
               for c in r.chunks)


def test_semantic_single_chunk():
    content = "Short content that fits easily."
    r = chunk_llm_content(content, strategy="semantic", chunk_size=4000)
    assert r.total_chunks == 1 and r.chunks[0].content == content


def test_semantic_is_last():
    r = chunk_llm_content("x" * 20000, strategy="semantic",
                          chunk_size=1000, overlap=100)
    for i, c in enumerate(r.chunks):
        assert c.is_last is (i == len(r.chunks) - 1)


def test_semantic_original_tokens():
    content = "Hello world. This is a test. " * 50
    r = chunk_llm_content(content, strategy="semantic", chunk_size=100)
    assert r.original_tokens == estimate_tokens(content)


# ── paragraph strategy ───────────────────────────────────────────────────

def test_paragraph_groups_to_target():
    r = chunk_llm_content(make_paragraphs(20, 50), strategy="paragraph",
                          chunk_size=200, overlap=0)
    assert 1 < r.total_chunks < 20


def test_paragraph_no_split_within():
    r = chunk_llm_content(make_paragraphs(5, 300), strategy="paragraph",
                          chunk_size=400, overlap=0)
    for c in r.chunks:
        for part in c.content.split("\n\n"):
            assert part.strip()


def test_paragraph_start_offsets():
    content = ("Para one content here.\n\nPara two content here.\n\n"
               "Para three content here.")
    r = chunk_llm_content(content, strategy="paragraph", chunk_size=4000)
    for c in r.chunks:
        assert content[c.start_offset:c.start_offset + len(c.content)] \
            == c.content


def test_paragraph_single_chunk():
    r = chunk_llm_content("Short para.\n\nAnother short para.",
                          strategy="paragraph", chunk_size=4000)
    assert r.total_chunks == 1


def test_paragraph_is_last():
    r = chunk_llm_content(make_paragraphs(10, 100), strategy="paragraph",
                          chunk_size=150, overlap=0)
    for i, c in enumerate(r.chunks):
        assert c.is_last is (i == len(r.chunks) - 1)


# ── general ──────────────────────────────────────────────────────────────

def test_default_strategy_semantic():
    content = "Hello. " * 2000
    assert chunk_llm_content(content, chunk_size=500).total_chunks == \
        chunk_llm_content(content, chunk_size=500,
                          strategy="semantic").total_chunks


def test_total_tokens_is_sum():
    r = chunk_llm_content("Some random text content here. " * 500,
                          strategy="fixed", chunk_size=200, overlap=0)
    assert r.total_tokens == sum(c.tokens for c in r.chunks)


def test_empty_all_zeros():
    r = chunk_llm_content("")
    assert (len(r.chunks), r.total_chunks, r.total_tokens,
            r.original_tokens) == (0, 0, 0, 0)
