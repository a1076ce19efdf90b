"""Content-density pruner — two-pass boilerplate reduction.

Pure-Python reimplementation of the reference's pruning stage
(/root/reference/src/core/content-pruner.ts:304-452; pattern lists at
:41-150, block scorer at :183-289).  All scoring constants, thresholds,
safety floors and regex lists are preserved exactly — this module is the
single most behaviour-defining stage of the pipeline.

Pass 0: regex strip of <nav>/<footer>/<aside> for documents > 20 KB.
Pass 1: semantic chrome removal by tag/class/id/role (depth ≤ 6 walk,
        protected tags main/article/body recursed into).
Pass 2: block scoring  0.35·textDensity + 0.25·(1−linkDensity)
        + 0.2·tagScore + 0.1·wordBonus + 0.1  with a dynamic threshold of
        0.5·bestScore, density-safe tags, and a 40% retention floor.
"""

from __future__ import annotations

import math
import re

from .jstext import JS_WS
from typing import List, NamedTuple, Optional

from ..dom import Node, VOID_TAGS, parse_html, document_body
from .cli_helpers import _js_round  # Math.round half-up (content-pruner.ts:444)

CHROME_TAGS = frozenset(("nav", "footer", "aside", "noscript"))

# content-pruner.ts:49-113 — ported verbatim (JS → Python re)
# re.ASCII: JS \b/\w without /u are ASCII — <div class="menü">
# MATCHES /\bmenu\b/ there (ü is a non-word char) but not under
# Python's Unicode default
CHROME_PATTERNS = [re.compile(p, re.ASCII) for p in (
    r"\bsidebar\b",
    r"\bcookie",
    r"\bbanner\b",
    r"\b(ad|ads|advert)\b",
    r"\bpopup\b",
    r"\bmodal\b",
    r"\boverlay\b",
    r"\bsocial",
    r"\bshare\b",
    r"\bbreadcrumb",
    r"\bskip-?link",
    r"\bfootnote",
    r"\brelated-?(post|article)",
    r"\bnewsletter",
    r"\bsubscri",
    r"\bcomment",
    r"\b(sign-?up|sign-?in|log-?in)\b",
    r"\btoc\b",
    r"\btable-?of-?contents\b",
    r"\bgdpr\b",
    r"\bconsent\b",
    r"\bvote\b",
    r"\bpost-?menu",
    r"\bjs-vote",
    r"\buser-?card",
    r"\buser-?info",
    r"\bpost-?tag",
    r"\bquestion-?stats",
    r"\bshare-?(button|link|panel|menu|bar)",
    r"\bfollow-?button",
    r"\breaction",
    r"\blike-?button",
    r"\bupvote",
    r"\bdownvote",
    r"\bedit-?(link|button|post)",
    r"\breport-?(link|button)",
    r"\bflag-?(link|button)",
    r"\btop-?bar",
    r"\bsite-?header",
    r"\bpage-?header",
    r"\bsticky-?header",
    r"\bnotice\b",
    r"\balert\b",
    r"\btoast\b",
    r"\bsnackbar",
    r"\bbottom-?bar",
    r"\bfloating",
    r"\bfixed-?bottom",
    r"\bback-?to-?top",
    r"\bquiz\b",
    r"\bquestionnaire\b",
    r"\btoggle(?!-content|-body|-text)\b",
    r"\bcarousel\b",
    r"\baccordion(?!-content|-body|-text)\b",
    r"\bstepper\b",
    r"\bpagination\b",
    r"\btabs-?(?:list|nav|bar)\b",
    r"\bcookie-?(?:banner|bar|notice|consent|popup)\b",
)]

PROTECTED_TAGS = frozenset(("main", "article", "body"))

DENSITY_SAFE_TAGS = frozenset((
    "h1", "h2", "h3", "h4", "h5", "h6",
    "p", "pre", "code", "blockquote", "figcaption",
    "main", "article", "body",
    "table", "thead", "tbody", "tfoot", "tr", "th", "td",
))

CONTENT_PATTERNS = [re.compile(p, re.ASCII) for p in (
    r"\barticle",
    r"\bpost-?content",
    r"\bentry-?content",
    r"\bmain-?content",
    r"\bstory",
    r"\bblog",
    r"\bpage-?content",
    r"\bcontent-?area",
    r"\bwikitable\b",
    r"\bmw-parser-output\b",
)]

TAG_IMPORTANCE = {
    "article": 3, "main": 3,
    "p": 2, "h1": 2, "h2": 2, "h3": 2, "h4": 2, "h5": 2, "h6": 2,
    "blockquote": 2, "pre": 2, "code": 2, "figure": 2, "figcaption": 2,
    "section": 1, "td": 1, "th": 1, "li": 1, "dd": 1, "dt": 1,
    "div": 0, "span": 0, "table": 0, "ul": 0, "ol": 0, "dl": 0,
    "aside": -1, "header": -1, "form": -1,
    "nav": -2, "footer": -2,
}

_CHROME_ROLES = frozenset(("navigation", "banner", "complementary", "contentinfo", "search"))

_WRAPPER_TAGS = frozenset(("div", "section", "table", "tbody", "thead", "tr",
                           "center", "details", "summary"))

_WS_SPLIT = re.compile(JS_WS + "+")

_NAV_RE = re.compile(rf"<nav({JS_WS}[^>]*)?>[\s\S]*?</nav>", re.I)
_FOOTER_RE = re.compile(rf"<footer({JS_WS}[^>]*)?>[\s\S]*?</footer>", re.I)
_ASIDE_RE = re.compile(rf"<aside({JS_WS}[^>]*)?>[\s\S]*?</aside>", re.I)


class PruneResult(NamedTuple):
    html: str
    nodes_removed: int
    reduction_percent: int


def _combined_class_id(el: Node) -> str:
    return ((el.get("class") or "").lower() + " " + (el.get("id") or "").lower())


def _is_chrome_by_semantic(el: Node) -> bool:
    if el.tag in CHROME_TAGS:
        return True
    combined = _combined_class_id(el)
    for p in CONTENT_PATTERNS:
        if p.search(combined):
            return False
    for p in CHROME_PATTERNS:
        if p.search(combined):
            return True
    if (el.get("role") or "").lower() in _CHROME_ROLES:
        return True
    return False


class _ScoredBlock(NamedTuple):
    element: Node
    tag: str
    html_length: int
    visible_text: str
    score: float


def _visible_text(el: Node) -> str:
    parts: List[str] = []
    stack = list(reversed(el.children))
    while stack:
        c = stack.pop()
        if isinstance(c, str):
            parts.append(c)
        elif c.tag not in ("script", "style", "noscript", "svg", "path"):
            stack.extend(reversed(c.children))
    return "".join(parts)


def _link_text_len(el: Node) -> int:
    total = 0
    for a in el.iter_elements():
        if a.tag == "a":
            total += len(a.text().strip())
    return total


def _collect_blocks(el: Node, blocks: List[_ScoredBlock], max_leaf: int) -> None:
    for child in el.children:
        if not isinstance(child, Node):
            continue
        tag = child.tag
        if tag in ("script", "style", "link", "meta"):
            continue
        outer = child.html()
        html_len = len(outer)
        if html_len < 10:
            continue
        is_protected = tag in PROTECTED_TAGS
        is_wrapper = tag in _WRAPPER_TAGS
        if is_protected or (is_wrapper and html_len > max_leaf):
            _collect_blocks(child, blocks, max_leaf)
        elif html_len > 0:
            visible = _visible_text(child)
            visible_len = len(visible.strip())
            text_density = min(visible_len / max(html_len, 1), 1.0)
            link_len = _link_text_len(child)
            link_density = min(link_len / visible_len, 1.0) if visible_len > 0 else 0.0
            raw_tag = TAG_IMPORTANCE.get(tag, 0)
            norm_tag = (raw_tag + 2) / 5
            words = [w for w in _WS_SPLIT.split(visible.strip()) if w]
            word_bonus = min(math.log(len(words) + 1) / math.log(1000), 1.0) if words else 0.0
            score = (
                text_density * 0.35
                + (1 - link_density) * 0.25
                + norm_tag * 0.2
                + word_bonus * 0.1
                + 0.1
            )
            blocks.append(_ScoredBlock(child, tag, html_len, visible, score))


def prune_content(html: str, threshold: float = 0.3, min_words: int = 3,
                  dynamic: bool = True) -> PruneResult:
    """Two-pass density pruning (content-pruner.ts:304-452 semantics)."""
    original_length = len(html)
    if not html.strip():
        return PruneResult(html, 0, 0)

    # Pass 0: regex pre-pass for large documents
    if len(html) > 20000:
        html = _NAV_RE.sub("", html)
        html = _FOOTER_RE.sub("", html)
        html = _ASIDE_RE.sub("", html)

    root = parse_html(html)
    body = document_body(root)
    nodes_removed = 0

    # Pass 1: semantic removal, depth ≤ 6
    to_remove: List[Node] = []

    def walk_for_chrome(parent: Node, depth: int) -> None:
        for child in list(parent.children):
            if not isinstance(child, Node):
                continue
            tag = child.tag
            if tag in ("script", "style"):
                continue
            if tag in PROTECTED_TAGS:
                walk_for_chrome(child, depth + 1)
                continue
            if _is_chrome_by_semantic(child):
                to_remove.append(child)
                continue
            if depth < 6:
                walk_for_chrome(child, depth + 1)

    if body is not None:
        walk_for_chrome(body, 0)
    for el in to_remove:
        el.remove()
        nodes_removed += 1

    # Pass 2: density scoring
    html_el = next((c for c in root.children if isinstance(c, Node)), None)
    post_pass1 = html_el.html() if html_el is not None else root.inner_html()
    post_len = len(post_pass1)

    if post_len > 100 and body is not None:
        blocks: List[_ScoredBlock] = []
        max_leaf = min(5000, math.ceil(post_len * 0.3))
        _collect_blocks(body, blocks, max_leaf)

        if len(blocks) >= 2:
            best_score = max(b.score for b in blocks)
            effective = best_score * 0.5 if dynamic else threshold
            min_retain = math.ceil(post_len * 0.4)
            removed_len = 0
            density_remove = []
            for b in sorted(blocks, key=lambda x: x.score):
                if b.tag in PROTECTED_TAGS or b.tag in DENSITY_SAFE_TAGS:
                    continue
                words = [w for w in _WS_SPLIT.split(b.visible_text.strip()) if w]
                is_tiny = len(words) < min_words
                is_low = b.score < effective
                if not is_tiny and not is_low:
                    continue
                remaining = post_len - (removed_len + b.html_length)
                if remaining < min_retain:
                    continue
                density_remove.append(b.element)
                removed_len += b.html_length
            for el in density_remove:
                el.remove()
                nodes_removed += 1

    result_html = html_el.html() if html_el is not None else root.inner_html()
    result_len = len(result_html)
    reduction = (
        max(0, _js_round(((original_length - result_len) / original_length) * 100))
        if original_length > 0 else 0
    )
    return PruneResult(result_html, nodes_removed, reduction)


# ── markdown post-processing (content-pruner.ts:459-517) ────────────────

UI_BUTTON_LABELS = re.compile(
    r"^(load more|headlines only|show more|read more|show less|collapse|expand"
    r"|view more|view less|see more|see less|more stories|more articles|sign up"
    r"|subscribe|log in|sign in|follow us|get started|click here|learn more)$",
    re.I,
)

_EMPTY_IMAGE_RE = re.compile(r"^\!\[\]\([^)]+\)$")
_EMPTY_IMAGE_LI_RE = re.compile(rf"^[-*+]{JS_WS}+\!\[\]\([^)]+\)$")
_HR_RE = re.compile(rf"^(\*{JS_WS}*\*{JS_WS}*\*|\-{JS_WS}*\-{JS_WS}*\-|_{JS_WS}*_{JS_WS}*_)$")


def prune_markdown(markdown: str) -> str:
    """Strip UI noise lines from markdown output (pruneMarkdown port)."""
    if not markdown:
        return markdown
    lines = markdown.split("\n")
    result: List[str] = []
    consecutive_hr = 0
    for line in lines:
        trimmed = line.strip()
        if UI_BUTTON_LABELS.match(trimmed):
            continue
        if _EMPTY_IMAGE_RE.match(trimmed):
            continue
        if _EMPTY_IMAGE_LI_RE.match(trimmed):
            continue
        if _HR_RE.match(trimmed):
            consecutive_hr += 1
            if consecutive_hr > 1:
                continue
        else:
            if trimmed != "":
                consecutive_hr = 0
        result.append(line)
    return "\n".join(result)
