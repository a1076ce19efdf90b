"""Markdown chunker for RAG pipelines — the "spans" producer.

Pure-Python reimplementation of /root/reference/src/core/chunker.ts:
section strategy (:91-172), paragraph strategy (:178-239), fixed
strategy (:245-272) and heading-based sectioning (:275-321).  Default
512 tokens/chunk, 50-token overlap, ~4 chars/token.
"""

from __future__ import annotations

import math
import re
from typing import List, NamedTuple, Optional

DEFAULT_MAX_TOKENS = 512
DEFAULT_OVERLAP = 50
CHARS_PER_TOKEN = 4

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.+)")
_HEADING_RE_M = re.compile(r"^(#{1,6})\s+(.+)", re.M)
_PARA_SPLIT = re.compile(r"\n\n+")


class ContentChunk(NamedTuple):
    index: int
    text: str
    token_count: int
    word_count: int
    section: Optional[str]
    section_depth: Optional[int]
    start_offset: int
    end_offset: int


class _Section(NamedTuple):
    heading: Optional[str]
    depth: Optional[int]
    body: str
    start_offset: int


def _wc(text: str) -> int:
    return len([w for w in re.split(r"\s+", text) if w])


def _mk_chunk(index: int, text: str, raw_len: int, section: Optional[str],
              depth: Optional[int], start: int, end: int) -> ContentChunk:
    return ContentChunk(
        index=index,
        text=text,
        token_count=math.ceil(raw_len / CHARS_PER_TOKEN),
        word_count=_wc(text),
        section=section,
        section_depth=depth,
        start_offset=start,
        end_offset=end,
    )


def split_by_headings(content: str) -> List[_Section]:
    lines = content.split("\n")
    sections: List[_Section] = []
    current_heading: Optional[str] = None
    current_depth: Optional[int] = None
    current_body: List[str] = []
    current_start = 0
    offset = 0
    for line in lines:
        m = _HEADING_RE.match(line)
        if m:
            if current_body or current_heading:
                sections.append(_Section(current_heading, current_depth,
                                         "\n".join(current_body), current_start))
            current_heading = line
            current_depth = len(m.group(1))
            current_body = []
            current_start = offset
        else:
            current_body.append(line)
        offset += len(line) + 1
    if current_body or current_heading:
        sections.append(_Section(current_heading, current_depth,
                                 "\n".join(current_body), current_start))
    return sections


_HEADING_HASH_RE = re.compile(r"^#+\s*")


def _heading_name(heading: Optional[str]) -> Optional[str]:
    if not heading:
        return None
    return _HEADING_HASH_RE.sub("", heading)


def chunk_by_section(content: str, max_tokens: int, overlap: int) -> List[ContentChunk]:
    max_chars = max_tokens * CHARS_PER_TOKEN
    overlap_chars = overlap * CHARS_PER_TOKEN
    chunks: List[ContentChunk] = []
    idx = 0
    for heading, depth, body, start_offset in split_by_headings(content):
        if not body.strip():
            continue
        if len(body) <= max_chars:
            text = f"{heading}\n\n{body.strip()}" if heading else body.strip()
            chunks.append(_mk_chunk(idx, text, len(text), _heading_name(heading),
                                    depth, start_offset, start_offset + len(body)))
            idx += 1
        else:
            paragraphs = [p for p in _PARA_SPLIT.split(body) if p.strip()]
            current = ""
            current_start = start_offset
            for para in paragraphs:
                candidate = f"{current}\n\n{para}" if current else para
                if len(candidate) > max_chars and current:
                    text = f"{heading}\n\n{current.strip()}" if heading else current.strip()
                    chunks.append(_mk_chunk(idx, text, len(text), _heading_name(heading),
                                            depth, current_start,
                                            current_start + len(current)))
                    idx += 1
                    if overlap_chars > 0 and len(current) > overlap_chars:
                        current = current[-overlap_chars:] + "\n\n" + para
                    else:
                        current = para
                    found = body.find(para)
                    current_start = start_offset + (found if found >= 0 else 0)
                else:
                    current = candidate
            if current.strip():
                text = f"{heading}\n\n{current.strip()}" if heading else current.strip()
                chunks.append(_mk_chunk(idx, text, len(text), _heading_name(heading),
                                        depth, current_start,
                                        current_start + len(current)))
                idx += 1
    return chunks


def chunk_by_paragraph(content: str, max_tokens: int, overlap: int) -> List[ContentChunk]:
    max_chars = max_tokens * CHARS_PER_TOKEN
    overlap_chars = overlap * CHARS_PER_TOKEN
    chunks: List[ContentChunk] = []
    paragraphs = [p for p in _PARA_SPLIT.split(content) if p.strip()]
    current = ""
    current_start = 0
    idx = 0
    current_heading: Optional[str] = None
    current_depth: Optional[int] = None
    for para in paragraphs:
        m = _HEADING_RE.match(para)
        if m:
            current_heading = m.group(2)
            current_depth = len(m.group(1))
        candidate = f"{current}\n\n{para}" if current else para
        if len(candidate) > max_chars and current:
            chunks.append(_mk_chunk(idx, current.strip(), len(current), current_heading,
                                    current_depth, current_start,
                                    current_start + len(current)))
            idx += 1
            if overlap_chars > 0 and len(current) > overlap_chars:
                current = current[-overlap_chars:] + "\n\n" + para
            else:
                current = para
            found = content.find(para, current_start)
            current_start = found if found >= 0 else current_start
        else:
            current = candidate
    if current.strip():
        chunks.append(_mk_chunk(idx, current.strip(), len(current), current_heading,
                                current_depth, current_start,
                                current_start + len(current)))
    return chunks


def chunk_by_fixed(content: str, max_tokens: int, overlap: int) -> List[ContentChunk]:
    max_chars = max_tokens * CHARS_PER_TOKEN
    overlap_chars = overlap * CHARS_PER_TOKEN
    step = max(max_chars - overlap_chars, 100)
    chunks: List[ContentChunk] = []
    idx = 0
    for i in range(0, len(content), step):
        text = content[i : i + max_chars].strip()
        if not text:
            continue
        m = _HEADING_RE_M.search(text)
        chunks.append(_mk_chunk(
            idx, text, len(text),
            m.group(2) if m else None,
            len(m.group(1)) if m else None,
            i, min(i + max_chars, len(content)),
        ))
        idx += 1
    return chunks


def chunk_content(content: str, max_tokens: int = DEFAULT_MAX_TOKENS,
                  overlap: int = DEFAULT_OVERLAP,
                  strategy: str = "section") -> List[ContentChunk]:
    # `options.maxTokens || DEFAULT` (chunker.ts:55-57): FALSY values
    # coerce to the defaults — overlap=0 means 50-token overlap there
    max_tokens = max_tokens or DEFAULT_MAX_TOKENS
    overlap = overlap or DEFAULT_OVERLAP
    strategy = strategy or "section"
    if strategy == "paragraph":
        return chunk_by_paragraph(content, max_tokens, overlap)
    if strategy == "fixed":
        return chunk_by_fixed(content, max_tokens, overlap)
    return chunk_by_section(content, max_tokens, overlap)
