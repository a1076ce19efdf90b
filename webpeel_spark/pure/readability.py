"""Readability engine — reader-mode article extraction.

Pure-Python reimplementation of /root/reference/src/core/readability.ts:
noise tags/classes/roles (:61-134), hidden-element removal (:167-173),
metadata chains (:185-283), top-down noise walk (:287-319), candidate
scoring ``paragraphs*3 + textLen/100 − linkDensity*100 + textDensity*20
− 30·noiseClass + 20·inside(main/article)`` (:331-376), best-candidate
selection article → main → [role=main] → scored div/section (:378-438),
inline-noise cleanup (:442-482), excerpt (:486-494), reading time
(:498-501) and residual output cleanup (:510-525).
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timezone
from typing import List, NamedTuple, Optional

from ..dom import Node, parse_html, parse_fragment, select, select_first, document_body
from .markdown import raw_html_to_markdown
from .jstext import JS_WS, collapse_ws, js_trim
from .metadata import clean_concatenated_title, js_to_iso, js_date_to_locale_en_us

NOISE_TAGS = frozenset((
    "nav", "footer", "aside", "header",
    "script", "style", "noscript", "iframe", "form",
))

# re.ASCII on all three tables: JS \b without /u is an ASCII word
# boundary, so non-ASCII class names match/unmatch differently
# under Python's Unicode default (see test_reference_edge_parity)
NOISE_CLASS_PATTERNS = [re.compile(p, re.ASCII) for p in (
    r"\bsidebar\b",
    r"\bmenu\b",
    r"\bnav(bar|igation)?\b",
    r"\bfooter\b",
    r"\bcomment",
    r"\bshare\b",
    r"\bsocial",
    r"\bwidget\b",
    r"\bad(s|vert(isement)?|-unit)?\b",
    r"\bpromo\b",
    r"\bbanner(?!-content)",
    r"\bcookie\b",
    r"\bconsent\b",
    r"\bnewsletter\b",
    r"\bsignup\b",
    r"\bsign-up\b",
    r"\bsubscri",
    r"\brelated\b",
    r"\brecommended\b",
    r"\bpopular\b",
    r"\btrending\b",
    r"\bbreadcrumb",
    r"\bpagination\b",
    r"\btoolbar\b",
    r"\bmodal\b",
    r"\bpopup\b",
    r"\boverlay\b",
    r"\btoast\b",
    r"\bnotification\b",
    r"\bskip-?link\b",
)]

NOISE_ROLES = frozenset(("navigation", "banner", "contentinfo", "complementary", "search"))

CONTENT_PATTERNS = [re.compile(p, re.ASCII) for p in (
    r"\barticle",
    r"\bpost-?content",
    r"\bentry-?content",
    r"\bmain-?content",
    r"\bstory\b",
    r"\bpage-?content",
    r"\bcontent-?area\b",
    r"\bprose\b",
    r"\bmarkdown-?body\b",
)]

INLINE_NOISE_PATTERNS = [re.compile(p, re.ASCII) for p in (
    r"\bshare\b", r"\bsocial\b", r"\bfollow\b", r"\btwitter\b", r"\bfacebook\b",
    r"\blinkedin\b", r"\binstagram\b", r"\bpinterest\b", r"\bprint\b",
    r"\bsave\b", r"\bbookmark\b",
)]


class ReadabilityResult(NamedTuple):
    title: str
    author: Optional[str]
    date: Optional[str]
    site_name: Optional[str]
    content: str
    excerpt: str
    word_count: int
    reading_time: str
    language: Optional[str]


def _combined(el: Node) -> str:
    return (el.get("class") or "").lower() + " " + (el.get("id") or "").lower()


def _is_noise(el: Node) -> bool:
    if el.tag in NOISE_TAGS:
        return True
    combined = _combined(el)
    for p in CONTENT_PATTERNS:
        if p.search(combined):
            return False
    for p in NOISE_CLASS_PATTERNS:
        if p.search(combined):
            return True
    if (el.get("role") or "").lower() in NOISE_ROLES:
        return True
    return False


def _is_hidden(el: Node) -> bool:
    style = (el.get("style") or "").lower()
    if "display:none" in style or "display: none" in style:
        return True
    if el.get("hidden") is not None:
        return True
    if el.get("aria-hidden") == "true":
        return True
    return False


# ── metadata (readability.ts:185-283) ────────────────────────────────────

class _PageMeta(NamedTuple):
    title: str
    author: Optional[str]
    date: Optional[str]
    site_name: Optional[str]
    language: Optional[str]


def _meta_content(root: Node, selector: str) -> Optional[str]:
    el = select_first(root, selector)
    return el.get("content") if el is not None else None


def _extract_meta(root: Node) -> _PageMeta:
    title = (
        _meta_content(root, 'meta[property="og:title"]')
        or _meta_content(root, 'meta[name="twitter:title"]')
        # $('title').text() concatenates EVERY title element's text —
        # including inline-SVG <title>s (readability.ts:191) — with no
        # separator; only the h1 fallback takes .first()
        or "".join(el.text() for el in select(root, "title"))
        or _first_text(root, "h1")
        or ""
    )
    title = clean_concatenated_title(collapse_ws(js_trim(title)))

    author: Optional[str] = (
        _meta_content(root, 'meta[name="author"]')
        or _meta_content(root, 'meta[property="article:author"]')
        or None
    )

    if not author:
        for sel in ('[rel="author"]', '[itemprop="author"]'):
            el = select_first(root, sel)
            if el is not None:
                text = collapse_ws(js_trim(el.text()))
                if text and 1 < len(text) < 60 and "\n" not in text:
                    author = text
                    break

    if not author:
        for sel in ('.byline', '.author:not([class*="authority"])', '.post-author',
                    '.article-author', '.entry-author', '[class*="byline"]'):
            el = select_first(root, sel)
            if el is not None:
                text = collapse_ws(js_trim(el.text()))
                if text and 1 < len(text) < 80 and "\n" not in text:
                    author = js_trim(re.sub(rf"^by{JS_WS}+", "", text, flags=re.I))
                    break

    if author and (len(author.split()) > 8 or re.search(r"database|control|footer|sidebar", author, re.I)):
        author = None
    if author:
        author = collapse_ws(js_trim(author)) or None

    date: Optional[str] = (
        _meta_content(root, 'meta[property="article:published_time"]')
        or _meta_content(root, 'meta[name="publishdate"]')
        or _meta_content(root, 'meta[name="publish_date"]')
        or _meta_content(root, 'meta[itemprop="datePublished"]')
        or None
    )
    if not date:
        time_el = select_first(root, "time[datetime]")
        if time_el is not None:
            date = time_el.get("datetime") or time_el.text().strip() or None
    if not date:
        for el in select(root, 'script[type="application/ld+json"]'):
            if date:
                break
            try:
                parsed = json.loads(el.text() or "{}")
                candidates = parsed if isinstance(parsed, list) else [parsed]
                for obj in candidates:
                    if obj is None:
                        # JS: null.datePublished THROWS — the catch
                        # (readability.ts:265) abandons THIS script's
                        # whole array, even if a later element had a
                        # date; other primitives yield undefined and
                        # are just skipped
                        raise TypeError("null element in ld+json array")
                    if isinstance(obj, dict) and obj.get("datePublished"):
                        date = str(obj["datePublished"])
                        break
            except Exception:
                continue
    if date:
        date = date.strip() or None

    site_name = _meta_content(root, 'meta[property="og:site_name"]')
    site_name = site_name.strip() if site_name else None

    language: Optional[str] = None
    html_el = select_first(root, "html")
    if html_el is not None and html_el.get("lang"):
        language = html_el.get("lang").strip().split("-")[0]
    if not language:
        cl = _meta_content(root, 'meta[http-equiv="Content-Language"]')
        language = cl.strip() if cl else None

    return _PageMeta(title, author, date, site_name, language)


def _first_text(root: Node, tag: str) -> Optional[str]:
    el = select_first(root, tag)
    return el.text() if el is not None else None


# ── noise removal (readability.ts:287-319) ───────────────────────────────

def _remove_noise(root: Node) -> None:
    for el in select(root, '[aria-hidden="true"], [hidden]'):
        el.remove()
    for el in select(root, '[style*="display:none"], [style*="display: none"]'):
        el.remove()

    to_remove: List[Node] = []

    def walk(el: Node) -> None:
        tag = el.tag
        if tag in ("script", "style", "meta", "link"):
            return
        if _is_noise(el) or _is_hidden(el):
            to_remove.append(el)
            return
        for child in el.children:
            if isinstance(child, Node):
                walk(child)

    body = document_body(root)
    if body is not None:
        # readability.ts:313-314 calls walk(body) — the body ELEMENT
        # itself is noise-tested too: <body class="modal-open"> removes
        # everything (walking only the children kept the body and
        # extracted a full article the reference would have dropped)
        walk(body)
    for el in to_remove:
        el.remove()


# ── candidate scoring (readability.ts:331-438) ───────────────────────────

def _visible_text(el: Node) -> str:
    parts: List[str] = []
    stack = list(reversed(el.children))
    while stack:
        c = stack.pop()
        if isinstance(c, str):
            parts.append(c)
        elif c.tag not in ("script", "style", "noscript"):
            stack.extend(reversed(c.children))
    return "".join(parts)


def _score_candidate(el: Node) -> float:
    html = el.html()
    html_length = len(html)
    if html_length == 0:
        return 0.0
    text_length = len(_visible_text(el).strip())
    text_density = text_length / max(html_length, 1)

    link_text_length = sum(
        len(a.text().strip()) for a in el.iter_elements() if a.tag == "a"
    )
    link_density = link_text_length / text_length if text_length > 0 else 1.0

    paragraph_count = sum(1 for e in el.iter_elements() if e.tag == "p")

    score = paragraph_count * 3 + text_length / 100 - link_density * 100
    score += text_density * 20

    combined = _combined(el)
    for p in NOISE_CLASS_PATTERNS:
        if p.search(combined):
            score -= 30
            break

    if any(a.tag in ("main", "article") for a in el.ancestors()):
        score += 20
    return score


def _find_best_candidate(root: Node) -> Optional[Node]:
    articles = [e for e in root.iter_elements() if e.tag == "article"]
    if articles:
        best = None
        best_score = float("-inf")
        for el in articles:
            s = _score_candidate(el)
            if s > best_score:
                best_score = s
                best = el
        if best is not None:
            return best

    main = select_first(root, "main")
    if main is not None:
        return main
    role_main = select_first(root, '[role="main"]')
    if role_main is not None:
        return role_main

    candidates = []
    for el in root.iter_elements():
        if el.tag not in ("div", "section"):
            continue
        html = el.html()
        if len(html) < 200:
            continue
        text_length = len(_visible_text(el).strip())
        if text_length < 100:
            continue
        paragraph_count = sum(1 for e in el.iter_elements() if e.tag == "p")
        if paragraph_count < 1:
            continue
        candidates.append((el, _score_candidate(el)))
    if not candidates:
        return None
    candidates.sort(key=lambda t: -t[1])
    return candidates[0][0]


# ── post-selection cleaning (readability.ts:442-482) ─────────────────────

def _clean_candidate(candidate: Node, include_images: bool, include_links: bool,
                     include_code: bool, include_tables: bool) -> None:
    for el in list(candidate.iter_elements()):
        if el.parent is None:
            continue
        combined = _combined(el)
        for p in INLINE_NOISE_PATTERNS:
            if p.search(combined):
                text = el.text().strip()
                if el.tag in ("div", "span", "ul", "button") and len(text) < 200:
                    el.remove()
                break

    if not include_images:
        for el in select(candidate, 'img, picture, figure, [class*="image"]'):
            el.remove()
    if not include_links:
        for el in [e for e in candidate.iter_elements() if e.tag == "a"]:
            if el.parent is not None:
                # replace_with_text (not direct children surgery): the
                # element-membership change must drop ancestor caches
                el.replace_with_text(el.text())
    if not include_code:
        for el in select(candidate, "pre, code"):
            el.remove()
    if not include_tables:
        for el in select(candidate, "table"):
            el.remove()


# ── excerpt / reading time / output cleanup ──────────────────────────────

def extract_excerpt(text: str) -> str:
    sentences = re.findall(r"[^.!?]+[.!?]+", text)
    if not sentences:
        return text[:200].strip()
    return " ".join(s for s in sentences[:2]).strip()


def calc_reading_time(word_count: int) -> str:
    # Math.round (half toward +∞): 500 words → 2.5 → '3 min read';
    # Python's banker's round would say 2
    from .cli_helpers import _js_round

    minutes = max(1, _js_round(word_count / 200))
    return f"{minutes} min read"


def clean_readability_output(content: str) -> str:
    content = re.sub(r"\[skip to (?:main )?content\]\([^)]*\)", "", content, flags=re.I)
    content = re.sub(rf"^(?:Home|Main){JS_WS}*[>›»]{JS_WS}*.*", "", content, flags=re.M)
    content = re.sub(r"(?:we use cookies|cookie (?:policy|settings|preferences)).*$",
                     "", content, flags=re.I | re.M)
    content = re.sub(rf"^\[.*?\]:{JS_WS}*#?{JS_WS}*$", "", content, flags=re.M)
    content = re.sub(rf"(?:---{JS_WS}*){{2,}}", "---\n", content)
    content = re.sub(r"\n{4,}", "\n\n\n", content)
    return content.strip()


# ── main export (readability.ts:538-674) ─────────────────────────────────

_MD_STRIP_RE = re.compile(r"[#*_`\[\]\(\)>|-]")


def extract_readable_content(
    html: str,
    url: str = "",
    include_images: bool = True,
    include_links: bool = True,
    include_code: bool = True,
    include_tables: bool = True,
    max_length: Optional[int] = None,
) -> ReadabilityResult:
    if len(html) > 10 * 1024 * 1024:
        html = html[: 10 * 1024 * 1024]

    if not html.strip():
        return ReadabilityResult("", None, None, None, "", "", 0, "1 min read", None)

    root = parse_html(html)
    meta = _extract_meta(root)
    _remove_noise(root)
    best = _find_best_candidate(root)

    if best is not None:
        candidate_html = best.html()
    else:
        body = document_body(root)
        candidate_html = body.inner_html() if body is not None else root.inner_html()

    candidate_root = parse_html(candidate_html)
    candidate_body = document_body(candidate_root) or candidate_root
    _clean_candidate(candidate_body, include_images, include_links,
                     include_code, include_tables)
    cleaned_html = candidate_body.inner_html()

    content = raw_html_to_markdown(cleaned_html)

    title = meta.title
    if not title or len(title) < 3:
        m = re.search(rf"^#{JS_WS}+(.+)$", content, flags=re.M)
        if m:
            title = m.group(1).strip()

    plain_text = js_trim(collapse_ws(_MD_STRIP_RE.sub(" ", content)))
    word_count = len([w for w in plain_text.split() if w])
    reading_time = calc_reading_time(word_count)

    meta_parts: List[str] = []
    if meta.author:
        meta_parts.append(f"By {meta.author}")
    if meta.date:
        pretty = js_date_to_locale_en_us(meta.date)
        meta_parts.append(pretty if pretty else meta.date)
    meta_parts.append(reading_time)

    meta_line = "*" + " · ".join(meta_parts) + "*\n\n" if meta_parts else ""
    title_line = f"# {title}\n{meta_line}" if title else meta_line

    starts_with_title = bool(title) and content.lstrip().startswith(f"# {title}")
    if not starts_with_title and title_line:
        content = title_line + content
    elif starts_with_title and meta_line:
        content = re.sub(rf"^(#{JS_WS}+.+\n)", lambda m: m.group(1) + meta_line, content, count=1)

    content = re.sub(r"\n{3,}", "\n\n", content).strip()
    content = clean_readability_output(content)

    if max_length and max_length > 0 and len(content) > max_length:
        content = content[:max_length].strip() + "\n\n[Content truncated]"

    excerpt = extract_excerpt(plain_text)

    return ReadabilityResult(
        title=title,
        author=meta.author,
        date=meta.date,
        site_name=meta.site_name,
        content=content,
        excerpt=excerpt,
        word_count=word_count,
        reading_time=reading_time,
        language=meta.language,
    )
