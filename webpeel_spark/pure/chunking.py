"""Smart content chunking for LLM processing — port of
src/core/chunking.ts (distinct from pure/chunker.py, the RAG
span-producer port of chunker.ts: this one targets LLM context
packing with a natural-break 'semantic' strategy, isLast flags and
original-token accounting).

Zero dependencies; the break-finding priority ladder (heading >
paragraph > sentence > word) and its comparison quirks are ported
literally from chunking.ts:120-180."""

from __future__ import annotations

import math
import re
from typing import List, NamedTuple, Optional, Tuple

DEFAULT_CHUNK_SIZE = 4000
DEFAULT_OVERLAP = 200


class Chunk(NamedTuple):
    index: int
    content: str
    tokens: int
    start_offset: int
    is_last: bool


class ChunkResult(NamedTuple):
    chunks: List[Chunk]
    total_chunks: int
    total_tokens: int
    original_tokens: int


def estimate_tokens(text: str) -> int:
    """chunking.ts:42 — chars/4 heuristic."""
    return math.ceil(len(text) / 4)


def chunk_llm_content(content: str, chunk_size: int = DEFAULT_CHUNK_SIZE,
                      overlap: int = DEFAULT_OVERLAP,
                      strategy: str = "semantic") -> ChunkResult:
    """chunking.ts:49-91 (chunkContent)."""
    original_tokens = estimate_tokens(content)
    if len(content) == 0:
        return ChunkResult([], 0, 0, 0)

    if strategy == "fixed":
        raw = _chunk_fixed(content, chunk_size, overlap)
    elif strategy == "paragraph":
        raw = _chunk_paragraph(content, chunk_size)
    else:
        raw = _chunk_semantic(content, chunk_size, overlap)

    chunks = [
        Chunk(i, text, estimate_tokens(text), offset, i == len(raw) - 1)
        for i, (text, offset) in enumerate(raw)
    ]
    total_tokens = sum(c.tokens for c in chunks)
    return ChunkResult(chunks, len(chunks), total_tokens, original_tokens)


def _chunk_fixed(content: str, chunk_size: int,
                 overlap: int) -> List[Tuple[str, int]]:
    """chunking.ts:97-117."""
    chunk_chars = chunk_size * 4
    overlap_chars = overlap * 4
    result: List[Tuple[str, int]] = []
    start = 0
    while start < len(content):
        end = min(start + chunk_chars, len(content))
        result.append((content[start:end], start))
        if end >= len(content):
            break
        start = end - overlap_chars
    return result


_HEADING_RE = re.compile(r"\n(?=#{1,6} )")
_PARA_RE = re.compile(r"\n\n")
_SENT_RE = re.compile(r"[.!?](?:\s+(?=[A-Z\n])|(?=\n))")
_SPACE_RE = re.compile(r" ")


def _find_natural_break(content: str, target: int, tolerance: int) -> int:
    """chunking.ts:120-180 — priority ladder, comparisons kept literal."""
    lo = target - tolerance
    hi = min(target + tolerance, len(content))
    best: Optional[Tuple[int, int]] = None  # (pos, priority)

    for m in _HEADING_RE.finditer(content, max(lo, 0)):
        if m.start() > hi:
            break
        dist = abs(m.start() - target)
        if best is None or best[1] < 4 or dist < abs(best[0] - target):
            best = (m.start(), 4)

    for m in _PARA_RE.finditer(content, max(lo, 0)):
        if m.start() > hi:
            break
        dist = abs(m.start() - target)
        if best is None or best[1] < 3 or (best[1] == 3
                                           and dist < abs(best[0] - target)):
            best = (m.start() + 2, 3)

    for m in _SENT_RE.finditer(content, max(lo, 0)):
        if m.start() > hi:
            break
        pos = m.end()
        dist = abs(pos - target)
        if best is None or best[1] < 2 or (best[1] == 2
                                           and dist < abs(best[0] - target)):
            best = (pos, 2)

    if best is None or best[1] < 1:
        for m in _SPACE_RE.finditer(content, max(lo, 0)):
            if m.start() > hi:
                break
            pos = m.start() + 1
            dist = abs(pos - target)
            if best is None or (best[1] < 2 and dist < abs(best[0] - target)):
                best = (pos, 1)

    return best[0] if best else min(target, len(content))


def _chunk_semantic(content: str, chunk_size: int,
                    overlap: int) -> List[Tuple[str, int]]:
    """chunking.ts:182-211."""
    chunk_chars = chunk_size * 4
    overlap_chars = overlap * 4
    tolerance = int(chunk_chars * 0.2)
    result: List[Tuple[str, int]] = []
    start = 0
    while start < len(content):
        remaining = len(content) - start
        if remaining <= chunk_chars + tolerance:
            result.append((content[start:], start))
            break
        break_pos = _find_natural_break(content, start + chunk_chars,
                                        tolerance)
        end = max(break_pos, start + 1)  # always advance
        result.append((content[start:end], start))
        start = max(start + 1, end - overlap_chars)
    return result


def _chunk_paragraph(content: str,
                     chunk_size: int) -> List[Tuple[str, int]]:
    """chunking.ts:217-259."""
    chunk_chars = chunk_size * 4
    paragraphs = content.split("\n\n")
    result: List[Tuple[str, int]] = []

    current_parts: List[str] = []
    current_len = 0
    current_offset = 0
    offset_tracker = 0

    for para in paragraphs:
        para_len = len(para) + (2 if current_parts else 0)
        if current_parts and current_len + para_len > chunk_chars:
            result.append(("\n\n".join(current_parts), current_offset))
            current_offset = offset_tracker
            current_parts = [para]
            current_len = len(para)
        else:
            if not current_parts:
                current_offset = offset_tracker
            current_parts.append(para)
            current_len += para_len
        offset_tracker += len(para) + 2

    if current_parts:
        result.append(("\n\n".join(current_parts), current_offset))
    return result
