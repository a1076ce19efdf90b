"""Smart content distillation to a token budget.

Port of /root/reference/src/core/budget.ts (constants and step order
exact): progressive compression — images → boilerplate sections →
table compression → whitespace → weak paragraphs → hard truncation —
applied only while over budget; JSON arrays binary-search the max
prefix that fits.  1 token ≈ 4 chars (markdown.ts:753-755).
"""

from __future__ import annotations

import json
import math
import re
from typing import List

from .markdown import estimate_tokens

# budget.ts:23-32 — boilerplate heading patterns (section removed)
BOILERPLATE_HEADING_PATTERNS = [
    re.compile(r"^#{1,3}\s*(cookie(s| notice| policy| banner| consent)?|privacy( policy)?|terms( of (use|service))?|disclaimer|copyright)", re.I),
    re.compile(r"^#{1,3}\s*(about us|contact( us)?|subscribe|newsletter|follow us|social media)", re.I),
    re.compile(r"^#{1,3}\s*(related posts?|you may also|more from|popular posts?|trending|recent posts?)", re.I),
    re.compile(r"^#{1,3}\s*(comments?|leave a (comment|reply)|tags?|categories?|share this)", re.I),
    re.compile(r"^#{1,3}\s*(table of contents?|toc|index)", re.I),
    re.compile(r"^#{1,3}\s*(advertisement|sponsored|promoted|ad(s| section)?)", re.I),
    re.compile(r"^#{1,3}\s*(navigation|menu|sidebar|footer|header)", re.I),
    re.compile(r"^#{1,3}\s*(sign[\s-]*up|log[\s-]*in|register|create( an)? account|get started)", re.I),
]

MAX_TABLE_ROWS = 3           # budget.ts:35
TOKENS_PER_LISTING_ITEM = 50  # budget.ts:38

_IMG_RE = re.compile(r"!\[([^\]]*)\]\([^)]+\)")
_HEADING_RE = re.compile(r"^(#{1,6})\s")
_SEPARATOR_RE = re.compile(r"^\|[\s|:-]+\|$")
_MD_STRIP_RE = re.compile(r"[#*_\[\]\(\)\-`|>~]")
_BULLET_RE = re.compile(r"^[-*]\s")


def distill_to_budget(content: str, budget: int, fmt: str = "markdown") -> str:
    """budget.ts:62-76 — distillToBudget."""
    if not content or budget <= 0:
        return content
    if estimate_tokens(content) <= budget:
        return content
    if fmt == "json":
        return _distill_json(content, budget)
    return _distill_markdown(content, budget)


def budget_listings(total_items: int, budget: int) -> dict:
    """budget.ts:85-96 — how many listing items fit the budget."""
    max_items = max(1, budget // TOKENS_PER_LISTING_ITEM)
    truncated = max_items < total_items
    return {
        "max_items": max_items if truncated else total_items,
        "truncated": truncated,
        "total_available": total_items,
    }


def _distill_markdown(content: str, budget: int) -> str:
    result = content
    if estimate_tokens(result) > budget:
        result = remove_images(result)
    if estimate_tokens(result) > budget:
        result = remove_boilerplate_sections(result)
    if estimate_tokens(result) > budget:
        result = compress_tables(result)
    if estimate_tokens(result) > budget:
        result = re.sub(r"\n{3,}", "\n\n", result)  # compressWhitespace
    if estimate_tokens(result) > budget:
        result = remove_weak_paragraphs(result, budget)
    if estimate_tokens(result) > budget:
        result = hard_truncate(result, budget)
    return result.strip()


def remove_images(content: str) -> str:
    """budget.ts:139-149 — alt<60 chars → [Image: alt], else dropped."""
    def repl(m):
        a = m.group(1).strip()
        return f"[Image: {a}]" if 0 < len(a) < 60 else ""

    out = _IMG_RE.sub(repl, content)
    return re.sub(r"\[Image: \]\s*", "", out)


def remove_boilerplate_sections(content: str) -> str:
    """budget.ts:157-186 — skip from a boilerplate heading until the
    next heading of equal-or-higher level."""
    lines = content.split("\n")
    result: List[str] = []
    skipping = False
    skip_depth = 0
    for line in lines:
        m = _HEADING_RE.match(line)
        if m:
            depth = len(m.group(1))
            if skipping and depth <= skip_depth:
                skipping = False
            if not skipping and any(p.match(line) for p in BOILERPLATE_HEADING_PATTERNS):
                skipping = True
                skip_depth = depth
                continue
        if not skipping:
            result.append(line)
    return "\n".join(result)


def compress_tables(content: str) -> str:
    """budget.ts:191-239 — keep header + separator + MAX_TABLE_ROWS."""
    lines = content.split("\n")
    result: List[str] = []
    in_table = False
    header_done = False
    separator_done = False
    data_rows = 0
    truncated_note = False
    for line in lines:
        trimmed = line.strip()
        is_row = trimmed.startswith("|") and trimmed.endswith("|")
        is_sep = is_row and _SEPARATOR_RE.match(trimmed) is not None
        if is_row:
            if not in_table:
                in_table = True
                header_done = False
                separator_done = False
                data_rows = 0
                truncated_note = False
            if not header_done:
                result.append(line)
                header_done = True
            elif is_sep and not separator_done:
                result.append(line)
                separator_done = True
            elif not is_sep:
                if data_rows < MAX_TABLE_ROWS:
                    result.append(line)
                    data_rows += 1
                elif not truncated_note:
                    result.append(
                        f"| ... | *({MAX_TABLE_ROWS}+ rows — additional rows omitted)* | ... |"
                    )
                    truncated_note = True
        else:
            in_table = False
            result.append(line)
    return "\n".join(result)


def remove_weak_paragraphs(content: str, budget: int) -> str:
    """budget.ts:252-303 — drop lowest-density paragraphs (score < 8)
    until within budget; headings/code/comments never removed."""
    paragraphs = content.split("\n\n")
    scored = []
    for i, para in enumerate(paragraphs):
        trimmed = para.strip()
        if (_HEADING_RE.match(trimmed) or trimmed.startswith("```")
                or trimmed.startswith("<!--")):
            scored.append((para, float("inf"), i))
            continue
        text_only = _MD_STRIP_RE.sub("", trimmed)
        words = [w for w in re.split(r"\s+", text_only) if w]
        score = float(len(words))
        if len(text_only) < 50:
            score *= 0.15
        avg_word_len = len(text_only) / len(words) if words else 0
        if avg_word_len < 3 or avg_word_len > 15:
            score *= 0.4
        plines = trimmed.split("\n")
        bullet_lines = [l for l in plines if _BULLET_RE.match(l.strip())]
        if len(bullet_lines) > 3 and len(bullet_lines) == len(plines):
            score *= 0.7
        scored.append((para, score, i))

    by_score = sorted(scored, key=lambda t: t[1])  # stable, like JS sort
    removed: set = set()
    current = content
    for para, score, i in by_score:
        if estimate_tokens(current) <= budget:
            break
        if score >= 8:
            break
        removed.add(i)
        current = "\n\n".join(p for p, _, j in scored if j not in removed)
    return current


def hard_truncate(content: str, budget: int) -> str:
    """budget.ts:309-320 — cut at last newline, append notice."""
    max_chars = max((budget - 15) * 4, 0)
    if len(content) <= max_chars:
        return content
    cut = max_chars
    while cut > 0 and content[cut] != "\n":
        cut -= 1
    if cut == 0:
        cut = max_chars
    return content[:cut].rstrip() + "\n\n[Content distilled to fit budget]"


def _reject_constant(name: str):
    # JSON.parse rejects the NaN/Infinity literals Python accepts —
    # such content takes the reference's hardTruncate path instead
    raise ValueError(f"JSON.parse rejects {name}")


def _js_jsonify(obj):
    """JSON.stringify number formatting: whole floats print bare
    ('10', never '10.0'); non-finite numbers (JSON.parse accepts the
    1e999 overflow to Infinity) stringify as null."""
    if isinstance(obj, float):
        if math.isinf(obj) or math.isnan(obj):
            return None
        if obj.is_integer():
            return int(obj)
        return obj
    if isinstance(obj, list):
        return [_js_jsonify(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _js_jsonify(v) for k, v in obj.items()}
    return obj


def _distill_json(content: str, budget: int) -> str:
    """budget.ts:330-369 — arrays binary-search max prefix; objects
    fall back to hard truncation."""
    try:
        parsed = _js_jsonify(json.loads(content,
                                        parse_constant=_reject_constant))
    except Exception:
        return hard_truncate(content, budget)
    if isinstance(parsed, list):
        lo, hi = 0, len(parsed)
        while lo < hi:
            mid = (lo + hi + 1) // 2  # Math.ceil((lo+hi)/2)
            if estimate_tokens(json.dumps(parsed[:mid], indent=2,
                                          ensure_ascii=False)) <= budget:
                lo = mid
            else:
                hi = mid - 1
        return json.dumps(parsed[:lo], indent=2, ensure_ascii=False)
    s = json.dumps(parsed, indent=2, ensure_ascii=False)
    if estimate_tokens(s) <= budget:
        return s
    return hard_truncate(s, budget)
