"""Selective evidence aggregation (selective-evidence.ts:1-548).

AttnRes-inspired evidence selection: instead of concatenating every
source, score and select evidence blocks that maximise relevance
(BM25 per block), credibility (domain authority) and source diversity
for a given query — the corpus-level evidence-selection step a RAG
pipeline runs ahead of synthesis.

Pure re-expression of the reference's exports, reusing the already
ported helpers (``pure/bm25_filter.py`` for block splitting + Okapi
BM25, ``pure/source_scoring.py`` for authority / registered domain /
factual-query detection — selective-evidence.ts:22-27 imports the
same two modules).  Provenance per function in the docstrings.
"""

from __future__ import annotations

import json
import math
import re
from dataclasses import dataclass, replace
from typing import Any, Dict, List, Optional, Tuple

from .bm25_filter import score_bm25, split_into_blocks
from .source_scoring import (
    extract_registered_domain,
    is_factual_query,
    score_domain_authority,
)

# ── query-type policy (selective-evidence.ts:78-156) ────────────────────

COMPARISON_PATTERN = re.compile(
    r"\b(compare|comparison|vs\.?|versus|difference|differences|between|"
    r"pros?\s+and\s+cons?|alternatives?|better|which\s+is|review|"
    r"benchmark|ranking)\b", re.I)

EXPLORATORY_PATTERN = re.compile(
    r"\b(how\s+(?:does|do|to|can)|what\s+(?:is|are|does)|explain|"
    r"overview|introduction|guide|tutorial|learn|understand|history|"
    r"background|research|explore|survey)\b", re.I)


@dataclass(frozen=True)
class QueryPolicy:
    """selective-evidence.ts:80-95."""
    type: str  # 'factual' | 'comparison' | 'exploratory'
    max_blocks_per_domain: int
    authority_weight: float
    relevance_weight: float
    structured_weight: float
    min_domains: int


def classify_query(query: str) -> QueryPolicy:
    """selective-evidence.ts:116-156 — factual first (most specific),
    then comparison, then exploratory, else balanced default."""
    if is_factual_query(query):
        return QueryPolicy("factual", 4, 0.35, 0.40, 0.25, 2)
    if COMPARISON_PATTERN.search(query):
        return QueryPolicy("comparison", 3, 0.25, 0.45, 0.15, 3)
    if EXPLORATORY_PATTERN.search(query):
        return QueryPolicy("exploratory", 2, 0.20, 0.50, 0.10, 4)
    return QueryPolicy("exploratory", 3, 0.25, 0.45, 0.15, 3)


# ── structured-signal detection (selective-evidence.ts:158-243) ─────────

_PRICE_RE = re.compile(r"[$€£¥]\s?\d[\d,.]+")
_TABLE_ROW_RE = re.compile(r"^\s*\|.*\|")
_KV_RE = re.compile(r"^\s*[A-Z][A-Za-z\s]{1,25}:\s+\S")
_NUMERIC_RE = re.compile(
    r"\b\d{1,3}(?:[.,]\d{1,3})*\s*"
    r"(?:%|GB|MB|TB|kg|lb|mph|km|mi|ms|sec|min|hr|days?|months?|years?)\b",
    re.I)
_VERSION_RE = re.compile(r"\bv(?:ersion)?\s?\d+(?:\.\d+)+", re.I)
_JSONLD_RE = re.compile(r"@context|schema\.org|itemtype|itemprop", re.I)


def detect_structured_signal(text: str) -> float:
    """selective-evidence.ts:191-229 — content-derived structured-data
    signal strength, 0-1."""
    if not text or len(text) < 10:
        return 0.0

    signal = 0.0
    lines = text.split("\n")

    price_matches = _PRICE_RE.findall(text)
    if price_matches:
        signal += min(0.3, len(price_matches) * 0.1)

    table_rows = [l for l in lines if _TABLE_ROW_RE.match(l)]
    if len(table_rows) >= 2:
        signal += min(0.3, len(table_rows) * 0.05)

    kv_matches = [l for l in lines if _KV_RE.match(l)]
    if len(kv_matches) >= 2:
        signal += min(0.2, len(kv_matches) * 0.04)

    numeric = _NUMERIC_RE.findall(text)
    if len(numeric) >= 2:
        signal += min(0.2, len(numeric) * 0.04)

    if _VERSION_RE.search(text):
        signal += 0.1

    if _JSONLD_RE.search(text):
        signal += 0.15

    return min(1.0, signal)


def source_structured_score(source: Dict[str, Any]) -> float:
    """selective-evidence.ts:231-252 — pre-existing structured data
    (any non-trivial value) + content-derived signal, each × 0.5."""
    score = 0.0
    structured = source.get("structured")
    if structured is not None:
        s = structured if isinstance(structured, str) \
            else json.dumps(structured, separators=(",", ":"))
        if len(s) > 5:
            score += 0.5
    score += detect_structured_signal(source.get("content") or "") * 0.5
    return min(1.0, score)


# ── evidence quality / fallback (selective-evidence.ts:254-295) ─────────

UNUSABLE_EVIDENCE_PATTERNS = [
    re.compile(r"^#\s*⚠️\s+.+?\s+—\s+Access Blocked", re.I | re.M),
    re.compile(r"This site uses advanced bot protection and blocked "
               r"our request\.", re.I),
    re.compile(r"^##\s*❌\s+Reddit Post Not Found", re.I | re.M),
    re.compile(r"The post at r/.+ could not be found\.", re.I),
    re.compile(r"Server returned an error page \(522\)", re.I),
    re.compile(r"fetch_failed", re.I),
]


def is_unusable_evidence_content(text: Optional[str]) -> bool:
    """selective-evidence.ts:267-272 — placeholder / error shell, not
    usable evidence."""
    if not text:
        return True
    trimmed = text.strip()
    if not trimmed:
        return True
    return any(p.search(trimmed) for p in UNUSABLE_EVIDENCE_PATTERNS)


def get_best_evidence_text(source: Dict[str, Any]) -> Tuple[str, str]:
    """selective-evidence.ts:278-291 — (text, mode): full content when
    usable, else the search snippet (≥20 chars), else ('', 'none')."""
    content = source.get("content")
    if not is_unusable_evidence_content(content):
        return content, "content"
    snippet = (source.get("snippet") or "").strip()
    if len(snippet) >= 20:
        return snippet, "snippet"
    return "", "none"


# ── main selector (selective-evidence.ts:310-508) ───────────────────────

@dataclass
class SelectedBlock:
    text: str
    source_url: str
    source_title: str
    score: float
    has_structured_signal: bool
    content_mode: str  # 'content' | 'snippet'


@dataclass
class SelectionResult:
    blocks: List[SelectedBlock]
    total_candidates: int
    sources_used: int
    policy: QueryPolicy


@dataclass
class _Candidate:
    text: str
    source_url: str
    source_title: str
    domain: str
    bm25_score: float
    authority_score: float
    structured_score: float
    composite_score: float
    has_structured_signal: bool
    content_mode: str


_QUERY_CLEAN_RE = re.compile(r"[^\w\s]", re.ASCII)  # JS \w is ASCII


def select_evidence(query: str, sources: List[Dict[str, Any]],
                    max_blocks: int = 12, max_chars: int = 6000,
                    policy_override: Optional[Dict[str, Any]] = None,
                    ) -> SelectionResult:
    """selective-evidence.ts:322-508 — classify → score every block
    (BM25 sigmoid × relevance weight + authority × authority weight +
    structured × structured weight) → greedy top-down selection under
    per-domain caps and a char budget → min-domain-diversity swap."""
    base = classify_query(query)
    policy = replace(base, **{k: v for k, v in
                              (policy_override or {}).items()})

    if not sources:
        return SelectionResult([], 0, 0, policy)

    query_terms = [t for t in _QUERY_CLEAN_RE.sub(" ", query.lower())
                   .split() if len(t) > 1]

    candidates: List[_Candidate] = []
    for source in sources:
        text, mode = get_best_evidence_text(source)
        if not text or len(text) < 20:
            continue
        blocks = split_into_blocks(text)
        if not blocks:
            continue
        bm25_scores = (score_bm25(blocks, query_terms) if query_terms
                       else [0.1] * len(blocks))
        authority = score_domain_authority(source["url"])
        structured_src = source_structured_score(
            {**source, "content": text})
        domain = extract_registered_domain(source["url"])

        for i, block in enumerate(blocks):
            raw = block.raw
            if len(raw) < 30:  # nav fragments, single words
                continue
            raw_bm25 = bm25_scores[i]
            norm_bm25 = (2 / (1 + math.exp(-raw_bm25 * 4)) - 1
                         if raw_bm25 > 0 else 0.0)
            block_structured = detect_structured_signal(raw)
            combined = min(1.0, structured_src * 0.6
                           + block_structured * 0.4)
            composite = (norm_bm25 * policy.relevance_weight
                         + authority * policy.authority_weight
                         + combined * policy.structured_weight)
            candidates.append(_Candidate(
                text=raw, source_url=source["url"],
                source_title=source.get("title", ""),
                domain=domain, bm25_score=norm_bm25,
                authority_score=authority, structured_score=combined,
                composite_score=composite,
                has_structured_signal=combined > 0.15,
                content_mode="snippet" if mode == "snippet"
                else "content"))

    total_candidates = len(candidates)
    if not total_candidates:
        return SelectionResult([], 0, 0, policy)

    # stable score-descending sort (JS Array.sort is stable)
    candidates.sort(key=lambda c: -c.composite_score)

    domain_counts: Dict[str, int] = {}
    selected: List[_Candidate] = []
    char_budget = max_chars
    for c in candidates:
        if len(selected) >= max_blocks or char_budget <= 0:
            break
        count = domain_counts.get(c.domain, 0)
        if count >= policy.max_blocks_per_domain:
            continue
        if len(c.text) > char_budget:
            # partial take only as the very first block (ts:437-444)
            if not selected:
                selected.append(replace(c, text=c.text[:char_budget]))
                char_budget = 0
                domain_counts[c.domain] = count + 1
            continue
        selected.append(c)
        char_budget -= len(c.text)
        domain_counts[c.domain] = count + 1

    # min-domain-diversity swap (ts:452-497): promote missing domains
    # by replacing the worst block of the most-represented domain,
    # only when it has ≥2 blocks and the newcomer is ≥60% of its score
    selected_domains = {s.domain for s in selected}
    if len(selected_domains) < policy.min_domains and len(selected) > 1:
        seen: List[str] = []
        for c in candidates:
            if c.domain not in seen:
                seen.append(c.domain)
        missing = [d for d in seen if d not in selected_domains]
        for missing_domain in missing:
            if len(selected_domains) >= policy.min_domains:
                break
            in_selected = {id(s) for s in selected}
            domain_best = next(
                (c for c in candidates
                 if c.domain == missing_domain
                 and id(c) not in in_selected), None)
            if domain_best is None or domain_best.composite_score <= 0:
                continue
            counts: Dict[str, int] = {}
            for s in selected:
                counts[s.domain] = counts.get(s.domain, 0) + 1
            max_domain, max_count = "", 0
            for d, n in counts.items():
                if n > max_count:
                    max_count, max_domain = n, d
            if max_count < 2:
                continue
            worst_idx = -1
            for i, s in enumerate(selected):
                if s.domain != max_domain:
                    continue
                if worst_idx == -1 or (s.composite_score
                                       < selected[worst_idx]
                                       .composite_score):
                    worst_idx = i
            if worst_idx == -1:
                continue
            worst_score = selected[worst_idx].composite_score
            if domain_best.composite_score >= worst_score * 0.6:
                selected[worst_idx] = domain_best
                selected_domains.add(missing_domain)

    sources_used = len({s.source_url for s in selected})
    blocks_out = [SelectedBlock(
        text=c.text, source_url=c.source_url,
        source_title=c.source_title, score=c.composite_score,
        has_structured_signal=c.has_structured_signal,
        content_mode=c.content_mode) for c in selected]
    return SelectionResult(blocks_out, total_candidates, sources_used,
                           policy)


def format_evidence_for_llm(result: SelectionResult) -> str:
    """selective-evidence.ts:514-548 — numbered, source-attributed,
    grouped-by-source context string; exact facts preserved."""
    if not result.blocks:
        return ""
    groups: Dict[str, List[SelectedBlock]] = {}
    for block in result.blocks:
        groups.setdefault(block.source_url, []).append(block)
    parts = []
    for idx, (url, blocks) in enumerate(groups.items(), start=1):
        title = blocks[0].source_title
        structured_tag = (" [structured]"
                          if any(b.has_structured_signal for b in blocks)
                          else "")
        snippet_tag = (" [snippet]"
                       if all(b.content_mode == "snippet" for b in blocks)
                       else "")
        body = "\n\n".join(b.text for b in blocks)
        parts.append(f"[{idx}] {title}{structured_tag}{snippet_tag}\n"
                     f"URL: {url}\n\n{body}")
    return "\n\n---\n\n".join(parts)
