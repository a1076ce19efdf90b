"""BM25 query-focused content filter (port of bm25-filter.ts).

Splits markdown into logical blocks (code fences, heading+paragraph,
lists, tables), scores per-block Okapi BM25 (k1=1.5, b=0.75) and keeps
blocks above a threshold (default 0.5×mean, top-3 fallback).
``compute_relevance_score`` gives the 0-1 sigmoid-normalized
document-level score used by search ranking.
"""

from __future__ import annotations

import math
import re
from typing import Dict, List, NamedTuple, Optional

K1 = 1.5
B = 0.75


class ContentBlock(NamedTuple):
    raw: str
    index: int


def tokenize(text: str) -> List[str]:
    """bm25-filter.ts:46-58 — lowercase terms, markdown + punct stripped."""
    t = text.lower()
    t = re.sub(r"!\[.*?\]\(.*?\)", " ", t)
    t = re.sub(r"\[.*?\]\(.*?\)", " ", t)
    t = re.sub(r"`{1,3}[^`]*`{1,3}", " ", t)
    t = re.sub(r"[#*_~`>|\\]", " ", t)
    t = re.sub(r"[^\w\s]", " ", t, flags=re.ASCII)  # JS \w is ASCII
    return [x for x in re.split(r"\s+", t) if x]


def strip_markdown(text: str) -> str:
    """bm25-filter.ts:64-77."""
    t = re.sub(r"```[\s\S]*?```", " ", text)
    t = re.sub(r"`[^`]+`", " ", t)
    t = re.sub(r"!\[.*?\]\(.*?\)", " ", t)
    t = re.sub(r"\[([^\]]*)\]\([^)]*\)", r"\1", t)
    t = re.sub(r"^#{1,6}\s+", "", t, flags=re.M)
    t = re.sub(r"[*_~`>|\\]", " ", t)
    t = re.sub(r"^\s*[-*+]\s+", " ", t, flags=re.M)
    t = re.sub(r"^\s*\d+\.\s+", " ", t, flags=re.M)
    t = re.sub(r"\s+", " ", t)
    return t.strip()


_LIST_LINE = re.compile(r"^\s*[-*+]\s")
_NUM_LINE = re.compile(r"^\s*\d+\.\s")
_NUM_PAREN_LINE = re.compile(r"^\s*\d+\)\s")
_ANY_LIST = re.compile(r"^\s*\d+[.)]\s")


def split_into_blocks(content: str) -> List[ContentBlock]:
    """bm25-filter.ts:99-173 — block segmentation."""
    text = content.replace("\r\n", "\n").replace("\r", "\n")

    code_blocks: List[str] = []

    def stash(m):
        code_blocks.append(m.group(0))
        return f"\x00CODE_BLOCK_{len(code_blocks) - 1}\x00"

    with_placeholders = re.sub(r"```[\s\S]*?```", stash, text)
    raw_chunks = re.split(r"\n{2,}", with_placeholders)

    merged: List[str] = []
    i = 0
    while i < len(raw_chunks):
        chunk = raw_chunks[i].strip()
        if not chunk:
            i += 1
            continue
        is_heading = re.match(r"^#{1,6}\s", chunk) is not None
        nxt = raw_chunks[i + 1].strip() if i + 1 < len(raw_chunks) else None
        if is_heading and nxt and not re.match(r"^#{1,6}\s", nxt):
            merged.append(chunk + "\n\n" + nxt)
            i += 2
        else:
            merged.append(chunk)
            i += 1

    regrouped: List[str] = []
    for chunk in merged:
        lines = chunk.split("\n")
        is_list_block = all(
            l.strip() == "" or _LIST_LINE.match(l) or _NUM_LINE.match(l)
            or _NUM_PAREN_LINE.match(l)
            for l in lines
        ) and any(_LIST_LINE.match(l) or _ANY_LIST.match(l) for l in lines)
        is_table_block = any(l.strip().startswith("|") for l in lines)
        if is_list_block or is_table_block:
            if regrouped:
                prev = regrouped[-1]
                prev_is = any(
                    _LIST_LINE.match(l) or _ANY_LIST.match(l)
                    or l.strip().startswith("|")
                    for l in prev.split("\n")
                )
                if prev_is and is_list_block == prev_is:
                    regrouped[-1] = prev + "\n" + chunk
                    continue
        regrouped.append(chunk)

    blocks: List[ContentBlock] = []
    for i, raw in enumerate(regrouped):
        raw = re.sub(r"\x00CODE_BLOCK_(\d+)\x00",
                     lambda m: code_blocks[int(m.group(1))], raw)
        if raw.strip():
            blocks.append(ContentBlock(raw.strip(), i))
    return blocks


def score_bm25(blocks: List[ContentBlock], query_terms: List[str]) -> List[float]:
    """bm25-filter.ts:186-226 — per-block Okapi BM25."""
    if not blocks or not query_terms:
        return [0.0] * len(blocks)
    n = len(blocks)
    block_tokens = [tokenize(strip_markdown(b.raw)) for b in blocks]
    block_lengths = [len(t) for t in block_tokens]
    avgdl = (sum(block_lengths) / n) or 1
    tf_maps: List[Dict[str, int]] = []
    for tokens in block_tokens:
        tf: Dict[str, int] = {}
        for t in tokens:
            tf[t] = tf.get(t, 0) + 1
        tf_maps.append(tf)

    scores = [0.0] * n
    for term in query_terms:
        nqi = sum(1 for tf in tf_maps if term in tf)
        idf = math.log((n - nqi + 0.5) / (nqi + 0.5) + 1)
        for d in range(n):
            tf = tf_maps[d].get(term, 0)
            if tf == 0:
                continue
            dl = block_lengths[d]
            scores[d] += idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * dl / avgdl))
    return scores


def compute_relevance_score(content: str, query: str) -> float:
    """bm25-filter.ts:242-273 — 0-1 sigmoid-normalized relevance."""
    if not content or not query or not query.strip():
        return 0.0
    blocks = split_into_blocks(content)
    if not blocks:
        return 0.0
    query_terms = tokenize(query)
    if not query_terms:
        return 0.0
    scores = score_bm25(blocks, query_terms)
    block_texts = [strip_markdown(b.raw) for b in blocks]
    block_lens = [len(t) for t in block_texts]
    total_len = sum(block_lens) or 1
    weighted = sum(s * (l / total_len) for s, l in zip(scores, block_lens))
    per_term = weighted / len(query_terms)
    normalized = 2 / (1 + math.exp(-per_term * 8)) - 1
    return max(0.0, min(1.0, normalized))


class BM25FilterResult(NamedTuple):
    content: str
    kept: int
    total: int
    reduction_percent: int


def filter_by_relevance(content: str, query: str,
                        threshold: Optional[float] = None,
                        include_scores: bool = False) -> BM25FilterResult:
    """bm25-filter.ts:283-368 — keep blocks ≥ threshold (top-3 fallback)."""
    if not query or not query.strip():
        return BM25FilterResult(content, 0, 0, 0)
    blocks = split_into_blocks(content)
    total = len(blocks)
    if total == 0:
        return BM25FilterResult(content, 0, 0, 0)
    query_terms = tokenize(query)
    if not query_terms:
        return BM25FilterResult(content, total, total, 0)
    scores = score_bm25(blocks, query_terms)
    if threshold is not None:
        effective = threshold
    else:
        effective = (sum(scores) / len(scores)) * 0.5
    kept_indices = [i for i, s in enumerate(scores) if s >= effective]
    if not kept_indices:
        ranked = sorted(range(len(scores)), key=lambda i: -scores[i])[:3]
        kept_indices = sorted(ranked)
    kept_indices.sort()
    kept_blocks = [blocks[i] for i in kept_indices]
    if include_scores:
        parts = [f"<!-- BM25: {scores[kept_indices[j]]:.4f} -->\n{b.raw}"
                 for j, b in enumerate(kept_blocks)]
    else:
        parts = [b.raw for b in kept_blocks]
    filtered = "\n\n".join(parts)
    from .cli_helpers import _js_round  # Math.round (bm25-filter.ts:359)
    reduction = (_js_round((len(content) - len(filtered)) / len(content) * 100)
                 if content else 0)
    return BM25FilterResult(filtered, len(kept_blocks), total, reduction)
