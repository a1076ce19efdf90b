"""Field-type-aware value extraction over quick-answer passages.

Port of the reference's schema post-processing layer
(``src/core/schema-postprocess.ts:1-466``): BM25 finds relevant
passages but can't extract values — this module pulls the actual value
out with per-field regex banks, plus ``smart_extract_schema_fields``,
which tries structural signals (headings, byline, metadata, URL
domain) before falling back to the quick-answer retriever.

Completes the quick-answer stack: schema_templates (what to ask) →
quick_answer (find the passage) → this module (extract the value).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional
from urllib.parse import urlsplit

_MONTHS_FULL = (r"(?:January|February|March|April|May|June|July|August"
                r"|September|October|November|December)")
_NAME = r"[A-Z][a-zA-Z]+"


def _trim_capitalized(s: str) -> str:
    """Keep the leading run of capitalized words (the i-flagged capture
    patterns over-capture lowercase tails) — schema-postprocess.ts:55-63."""
    result: List[str] = []
    for w in s.split():
        if re.match(r"[A-Z]", w):
            result.append(w)
        else:
            break
    return " ".join(result) or s


def _first_clause(p: str, limit: int) -> str:
    return re.split(r"[.\n]", p)[0].strip()[:limit]


def _author_fallback(p: str) -> str:
    m = re.search(rf"({_NAME}(?:\s+{_NAME}){{1,2}})", p)
    return m.group(1) if m else _first_clause(p, 50)


def _title_like_fallback(p: str, min_len: int, limit: int) -> str:
    for line in (l for l in p.split("\n") if l.strip()):
        clean = re.sub(r"^#+\s*", "", line).strip()
        if re.match(r"\d{4}-\d{2}-\d{2}", clean):
            continue
        if re.match(r"\d+\s*min\s*read", clean, re.IGNORECASE):
            continue
        if min_len == 10 and re.match(
                r"(by|author|posted|published|updated)", clean,
                re.IGNORECASE):
            continue
        if len(clean) > min_len:
            return clean[:limit]
    return p.split("\n")[0].strip()[:limit]


def _brand_fallback(p: str) -> str:
    m = re.search(r"([A-Z][a-zA-Z]{2,})", p)
    return m.group(1) if m else _first_clause(p, 40)


def _sentence_fallback(p: str) -> str:
    sentences = [s for s in re.split(r"(?<=[.!?])\s+", p)
                 if len(s.strip()) > 10]
    if sentences:
        return sentences[0].strip()[:150]
    return p.strip()[:150]


# (patterns, flags, trim_match?, fallback) per field —
# schema-postprocess.ts:19-183
_FIELD_EXTRACTORS: Dict[str, Dict] = {
    "price": {
        "patterns": [
            (r"\$[\d,]+(?:\.\d{2})?", 0),
            (r"USD\s*[\d,]+(?:\.\d{2})?", 0),
            (r"€[\d,]+(?:\.\d{2})?", 0),
            (r"£[\d,]+(?:\.\d{2})?", 0),
            (r"¥[\d,]+", 0),
            (r"[\d,]+(?:\.\d{2})?\s*(?:USD|EUR|GBP|JPY)", 0),
            (r"(?:price|cost|costs?)\s*(?:is|:|\s)\s*\$?[\d,]+(?:\.\d{2})?",
             re.IGNORECASE),
            (r"(?:starting\s+(?:at|from)|from)\s+\$?[\d,]+(?:\.\d{2})?",
             re.IGNORECASE),
        ],
        "fallback": lambda p: _first_clause(p, 60),
    },
    "date": {
        "patterns": [
            (r"\d{4}-\d{2}-\d{2}", 0),
            (_MONTHS_FULL + r"\s+\d{1,2},?\s+\d{4}", re.IGNORECASE),
            (r"\d{1,2}\s+" + _MONTHS_FULL + r"\s+\d{4}", re.IGNORECASE),
            (r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\.?"
             r"\s+\d{1,2},?\s+\d{4}", re.IGNORECASE),
            (r"\d{1,2}/\d{1,2}/\d{2,4}", 0),
            (r"\d{1,2}\.\d{1,2}\.\d{2,4}", 0),
        ],
        "fallback": lambda p: _first_clause(p, 40),
    },
    "author": {
        "patterns": [
            (rf"(?:by|author|written by|posted by)\s+"
             rf"({_NAME}(?:\s+{_NAME}){{0,3}})", re.IGNORECASE),
            (rf"({_NAME}(?:\s+{_NAME}){{1,3}})\s+"
             rf"(?:wrote|writes|reports|published)", re.IGNORECASE),
        ],
        "trim_match": _trim_capitalized,
        "fallback": _author_fallback,
    },
    "title": {
        "patterns": [(r"^#\s+(.+)$", re.MULTILINE),
                     (r"^##\s+(.+)$", re.MULTILINE)],
        "fallback": lambda p: _title_like_fallback(p, 10, 120),
    },
    "name": {
        "patterns": [(r"^#\s+(.+)$", re.MULTILINE),
                     (r"^##\s+(.+)$", re.MULTILINE)],
        "fallback": lambda p: _title_like_fallback(p, 5, 100),
    },
    "brand": {
        "patterns": [
            (rf"(?:brand|manufacturer|made by|by)\s*:?\s*"
             rf"({_NAME}(?:\s+{_NAME}){{0,2}})", re.IGNORECASE),
        ],
        "trim_match": _trim_capitalized,
        "fallback": _brand_fallback,
    },
    "rating": {
        "patterns": [
            (r"(\d+(?:\.\d+)?)\s*(?:/\s*\d+|out of \d+|stars?)",
             re.IGNORECASE),
            (r"(?:rating|rated|score)\s*:?\s*(\d+(?:\.\d+)?)",
             re.IGNORECASE),
            (r"(\d+(?:\.\d+)?)\s*%", 0),
        ],
        "fallback": lambda p: _first_clause(p, 50),
    },
    "email": {
        "patterns": [(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", 0)],
        "fallback": lambda p: _first_clause(p, 80),
    },
    "phone": {
        "patterns": [
            (r"(?:\+\d{1,3}[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}", 0),
            (r"(?:\+\d{1,3}[-.\s]?)?[\d\s-]{7,15}", 0),
        ],
        "fallback": lambda p: _first_clause(p, 40),
    },
    "url": {
        "patterns": [(r"https?://[^\s\"'<>]+", 0)],
        "fallback": lambda p: _first_clause(p, 120),
    },
    "image": {
        "patterns": [
            (r"https?://[^\s\"'<>]+\.(?:jpg|jpeg|png|gif|webp|svg|avif)"
             r"[^\s\"'<>]*", re.IGNORECASE),
            (r"https?://[^\s\"'<>]+", 0),
        ],
        "fallback": lambda p: _first_clause(p, 120),
    },
    "website": {
        "patterns": [(r"https?://[^\s\"'<>]+", 0)],
        "fallback": lambda p: _first_clause(p, 120),
    },
}

_DEFAULT_EXTRACTOR = {"patterns": [], "fallback": _sentence_fallback}


def extract_value_from_passage(passage: str, field_name: str) -> str:
    """Pull the typed value for ``field_name`` out of a BM25 passage
    (schema-postprocess.ts:188-211)."""
    if not passage or not passage.strip():
        return ""
    extractor = _FIELD_EXTRACTORS.get(field_name.lower().strip(),
                                      _DEFAULT_EXTRACTOR)
    for pattern, flags in extractor["patterns"]:
        m = re.search(pattern, passage, flags)
        if m:
            raw = (m.group(1) if m.groups() and m.group(1) is not None
                   else m.group(0)).strip()
            trim = extractor.get("trim_match")
            return trim(raw) if trim else raw
    fallback = extractor.get("fallback")
    if fallback:
        return fallback(passage)
    return _first_clause(passage, 100)


# ── structural-first schema extraction (schema-postprocess.ts:222-466) ──

def _source_from_url(page_url: str) -> str:
    try:
        host = (urlsplit(page_url).hostname or "")
    except ValueError:
        return ""
    host = re.sub(r"^www\.", "", host)
    if not host:
        return ""
    parts = host.split(".")
    site = parts[-2] if len(parts) >= 2 else parts[0]
    sub = parts[0]
    if (sub and sub not in ("www", "en", "m", "mobile", "api", "app")
            and sub != site):
        return f"{sub[:1].upper()}{sub[1:]} {site[:1].upper()}{site[1:]}"
    return site[:1].upper() + site[1:]


def smart_extract_schema_fields(
    content: str,
    template_fields: Dict[str, str],
    quick_answer_fn: Callable[[Dict], Dict],
    options: Optional[Dict] = None,
) -> Dict[str, str]:
    """Structural signals first (title / byline / date / regex scan /
    URL domain), BM25 quick-answer + extract_value_from_passage only
    for fields with no structural hit."""
    options = options or {}
    page_title = options.get("pageTitle")
    page_url = options.get("pageUrl")
    metadata = options.get("metadata") or {}
    extracted: Dict[str, str] = {}
    top_content = content[:1500]

    for field, question in template_fields.items():
        nf = field.lower().strip()
        value = ""

        if nf in ("title", "name"):
            if page_title and len(page_title) > 3:
                value = re.sub(r"\s*[-|–—]\s*.+$", "", page_title).strip()
            if not value:
                m = re.search(r"^#\s+(.+)$", content, re.MULTILINE)
                if m:
                    value = m.group(1).strip()
            if not value:
                m = re.search(r"^##\s+(.+)$", content, re.MULTILINE)
                if m:
                    value = m.group(1).strip()
        elif nf == "author":
            for pat in (
                rf"(?:^|\n)\s*(?:by|author|written by|posted by)[:\s]+"
                rf"({_NAME}(?:\s+{_NAME}){{0,3}})",
                rf"(?:^|\n)\s*({_NAME}(?:\s+{_NAME}){{1,2}})\s*[|·•]\s*"
                rf"(?:\d|Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)",
            ):
                m = re.search(pat, top_content,
                              re.IGNORECASE | re.MULTILINE)
                if m and m.group(1):
                    name_words = []
                    for w in m.group(1).split():
                        if re.match(r"[A-Z]", w):
                            name_words.append(w)
                        else:
                            break
                    if name_words:
                        value = " ".join(name_words)
                        break
            if not value and metadata.get("author"):
                value = str(metadata["author"])
        elif nf == "date":
            for pat, flags in (
                (r"\d{4}-\d{2}-\d{2}", 0),
                (_MONTHS_FULL + r"\s+\d{1,2},?\s+\d{4}", re.IGNORECASE),
                (r"\d{1,2}\s+" + _MONTHS_FULL + r"\s+\d{4}", re.IGNORECASE),
                (r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
                 r"[a-z]*\.?\s+\d{1,2},?\s+\d{4}", re.IGNORECASE),
            ):
                m = re.search(pat, top_content, flags)
                if m:
                    value = m.group(0).strip()
                    break
            if not value and metadata.get("date"):
                value = str(metadata["date"])
            if not value and metadata.get("publishedTime"):
                value = str(metadata["publishedTime"]).split("T")[0]
        elif nf == "price":
            for pat, flags in (
                (r"\$[\d,]+(?:\.\d{2})?", 0),
                (r"€[\d,]+(?:\.\d{2})?", 0),
                (r"£[\d,]+(?:\.\d{2})?", 0),
                (r"(?:price|cost|starting at|from)\s*:?\s*\$[\d,]+"
                 r"(?:\.\d{2})?", re.IGNORECASE),
            ):
                m = re.search(pat, content, flags)
                if m:
                    cm = re.search(r"[$€£¥][\d,]+(?:\.\d{2})?", m.group(0))
                    value = cm.group(0) if cm else m.group(0)
                    break
        elif nf == "email":
            m = re.search(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
                          content)
            if m:
                value = m.group(0)
        elif nf == "phone":
            m = re.search(r"(?:\+\d{1,3}[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}"
                          r"[-.\s]?\d{4}", content)
            if m:
                value = m.group(0)
        elif nf in ("url", "website", "image"):
            if nf == "image":
                m = re.search(r"https?://[^\s\"'<>]+\.(?:jpg|jpeg|png|gif"
                              r"|webp|svg|avif)[^\s\"'<>]*", content,
                              re.IGNORECASE)
                if m:
                    value = m.group(0)
            if not value:
                m = re.search(r"https?://[^\s\"'<>]+", content)
                if m:
                    value = m.group(0)
        elif nf == "rating":
            for pat in (r"(\d+(?:\.\d+)?)\s*(?:/\s*\d+|out of \d+|stars?)",
                        r"(?:rating|rated|score)\s*:?\s*(\d+(?:\.\d+)?)"):
                m = re.search(pat, content, re.IGNORECASE)
                if m:
                    value = m.group(1) or m.group(0)
                    break
        elif nf == "brand":
            # content "by Brand" patterns first (case-sensitive capture)
            m = re.search(r"(?:by|from|developed by|manufactured by"
                          r"|made by|produced by|created by)\s+"
                          r"([A-Z][a-zA-Z]+(?:\s+[A-Z][a-zA-Z]*)?)",
                          top_content)
            if m and m.group(1):
                brand_words = []
                for w in m.group(1).split():
                    if (re.match(r"[A-Z]", w) and not re.fullmatch(
                            r"The|This|That|And|For|With|From", w)):
                        brand_words.append(w)
                    else:
                        break
                if brand_words:
                    value = " ".join(brand_words)
            if not value and metadata.get("brand"):
                value = str(metadata["brand"])
            if not value and page_title:
                m = re.match(r"([A-Z][a-zA-Z]+)", page_title)
                if m:
                    value = m.group(1)
        elif nf == "source":
            if page_title:
                m = re.search(r"\s*[-|–—]\s*(.+)$", page_title)
                if m and m.group(1) and len(m.group(1)) < 40:
                    value = m.group(1).strip()
            if not value and page_url:
                value = _source_from_url(page_url)
        elif nf in ("summary", "description"):
            parts: List[str] = []
            char_count = 0
            for line in content.split("\n"):
                t = line.strip()
                if not t or t.startswith("#"):
                    continue
                if re.match(r"\d{4}-\d{2}-\d{2}", t):
                    continue
                if re.match(r"\d+\s*min\s*read", t, re.IGNORECASE):
                    continue
                if re.match(r"(by|author|posted|published|updated|written)",
                            t, re.IGNORECASE):
                    continue
                if re.fullmatch(r"\*[^*]+\*", t):
                    continue
                if len(t) > 30:
                    parts.append(t)
                    char_count += len(t)
                    if char_count > 300:
                        break
            if parts:
                value = " ".join(parts)[:400]
        elif nf == "body":
            value = content[:2000]
        elif nf == "tags":
            headings = re.findall(r"^#{1,3}\s+.+$", content, re.MULTILINE)
            topics = []
            for h in headings[1:6]:   # skip the title, take up to 5
                clean = re.sub(r"[*\[\](){}]", "",
                               re.sub(r"^#+\s*", "", h)).strip()
                if 3 < len(clean) < 60:
                    topics.append(clean)
            if len(topics) >= 2:
                value = ", ".join(topics)

        if not value:
            try:
                qa = quick_answer_fn({"content": content,
                                      "question": question
                                      if isinstance(question, str)
                                      else field,
                                      "url": page_url or ""})
                answer = qa.get("answer", "")
                value = (extract_value_from_passage(answer, field)
                         if answer else "")
            except Exception:
                value = ""

        extracted[field] = value

    return extracted


def default_quick_answer_fn(opts: Dict) -> Dict:
    """Adapter wiring the repo's quick-answer pipeline into
    smart_extract_schema_fields (the reference passes its quickAnswer
    the same way)."""
    from .quick_answer import quick_answer

    r = quick_answer(opts.get("question", ""), opts.get("content", ""),
                     url=opts.get("url", ""))
    return {"answer": r.get("answer", ""),
            "confidence": r.get("confidence", 0.0)}
