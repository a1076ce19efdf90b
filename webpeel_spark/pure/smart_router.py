"""Smart Router — rule-based natural-language intent parsing
(mcp/smart-router.ts:1-216), no LLM.

The reference routes plain-English task strings to its six tool
intents (read / see / find / extract / monitor / act) with keyword
priority rules, URL extraction (http/https or bare domain against a
TLD allow-list), and natural-language parameter sniffing (viewport,
full-page, json format, summary).  Pure string logic — the MCP server
shell around it is N/A, but a batch engine routes the same way over a
task/query LOG table (``operators/intent.py``): which fraction of
user tasks are extractions vs monitors, which domains get acted on.

Reference test suite (src/tests/smart-router.test.ts, 65 cases)
ported case-for-case in tests/test_smart_router.py.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

INTENTS = ("read", "see", "find", "extract", "monitor", "act")

# smart-router.ts:14-23 — multi-word patterns, checked first
_MULTI_WORD_PATTERNS = [
    ("act", re.compile(r"\bsign[\s-]up\b")),
    ("find", re.compile(r"\blook\s+up\b")),
    ("extract", re.compile(r"\bget\s+data\b")),
    ("read", re.compile(r"\bwhat\s+does\b")),
    ("find", re.compile(
        r"^\s*(?:what\s+(?:is|are|was|were|can|will|would|could|should)"
        r"|how\s+(?:much|many|do|does|did|to|can|are|is)"
        r"|who\s+(?:is|are|was)|when\s+(?:is|was|does|do)"
        r"|where\s+(?:is|can|do|are)|why\s+(?:is|does|do|can)"
        r"|which\s+(?:is|are))\b", re.I)),
]

# smart-router.ts:27-50 — substring keywords, priority order
# act > monitor > extract > see > find > read
_KEYWORD_INTENTS = [
    ("act", ["click", "fill", "submit", "navigate", "type", "login",
             "interact", "press", "select"]),
    ("monitor", ["watch", "monitor", "track", "alert", "notify",
                 "change", "diff"]),
    ("extract", ["extract", "scrape", "pull", "fields", "schema",
                 "price", "structured", "brand", "logo", "colors"]),
    ("see", ["screenshot", "see", "show", "look", "visual", "image",
             "capture", "design", "compare"]),
    ("find", ["find", "search", "google", "research", "discover",
              "map", "sitemap"]),
    ("read", ["read", "fetch", "get", "content", "text", "markdown",
              "summarize", "summary", "answer", "question"]),
]

# smart-router.ts:53-65
_KNOWN_TLDS = ("com|org|net|io|co|dev|ai|app|info|uk|de|fr|jp|cn|us|edu"
               "|gov|me|tv|cc|ly|gg|sh|tech|online|site|xyz|store|cloud"
               "|api|blog|news")
_DOMAIN_RE = re.compile(
    r"\b(?:[a-zA-Z0-9-]+\.)+(?:%s)\b(?:/[^\s\"'<>)]*)?" % _KNOWN_TLDS,
    re.I)
_HTTP_RE = re.compile(r"https?://[^\s\"'<>)]+")


def _strip_trailing(url: str) -> str:
    """smart-router.ts:68-70."""
    return re.sub(r"[.,;:!?]+$", "", url)


def extract_url(task: str) -> Optional[str]:
    """smart-router.ts:73-83 — first http(s) URL, else first
    domain-like token normalized to https, else None."""
    m = _HTTP_RE.search(task or "")
    if m:
        return _strip_trailing(m.group(0))
    m = _DOMAIN_RE.search(task or "")
    if m:
        return _strip_trailing("https://" + m.group(0))
    return None


def extract_all_urls(task: str) -> List[str]:
    """smart-router.ts:86-101 — explicit URLs win outright; bare
    domains only collected when NO http(s) URL is present."""
    http = _HTTP_RE.findall(task or "")
    if http:
        return [_strip_trailing(u) for u in http]
    return [_strip_trailing("https://" + m.group(0))
            for m in _DOMAIN_RE.finditer(task or "")]


def _extract_find_query(task: str, url: Optional[str]) -> Optional[str]:
    """smart-router.ts:104-126 — strip the URL, remaining domains,
    and intent verbs; None when nothing is left."""
    q = task
    if url:
        if url.startswith("http"):
            q = q.replace(url, "", 1)  # JS string-arg replace: first only
        else:
            raw = re.sub(r"^https?://", "", url)
            q = re.sub(re.escape(raw), "", q, flags=re.I)
    q = _DOMAIN_RE.sub("", q)
    q = re.sub(
        r"\b(find|search\s+(?:for\s+|the\s+)?|google|look\s+up|research"
        r"|discover|map|sitemap|for)\b", "", q, flags=re.I)
    q = re.sub(r"\s{2,}", " ", q).strip()
    return q or None


def _extract_params(task: str) -> Dict:
    """smart-router.ts:129-152."""
    params: Dict = {}
    lower = (task or "").lower()
    if re.search(r"\bon\s+mobile\b", lower):
        params["viewport"] = {"width": 390, "height": 844}
    elif re.search(r"\bon\s+tablet\b", lower):
        params["viewport"] = {"width": 768, "height": 1024}
    if re.search(r"\bfull[\s-]?page\b", lower):
        params["fullPage"] = True
    if re.search(r"\bas\s+json\b", lower) or re.search(r"\bstructured\b",
                                                       lower):
        params["format"] = "json"
    if re.search(r"\bsummar(?:y|ize|izing)\b", lower):
        params["summary"] = True
    return params


def _strip_urls_for_keyword_check(task: str) -> str:
    """smart-router.ts:158-164 — URL paths must not trigger keywords
    (".../watch?v=..." is not a monitor task)."""
    stripped = _HTTP_RE.sub(" ", task)
    return _DOMAIN_RE.sub(" ", stripped)


def detect_intent(task: str) -> str:
    """smart-router.ts:167-184."""
    lower = (task or "").lower()
    target = _strip_urls_for_keyword_check(lower)
    for intent, pattern in _MULTI_WORD_PATTERNS:
        if pattern.search(target):
            return intent
    for intent, keywords in _KEYWORD_INTENTS:
        if any(kw in target for kw in keywords):  # substring, like ts
            return intent
    return "read"


def parse_intent(task: str) -> Dict:
    """smart-router.ts:192-216 — {intent, url, query, params}."""
    intent = detect_intent(task)
    url = extract_url(task)
    params = _extract_params(task)
    if intent == "see":
        lower = (task or "").lower()
        if re.search(r"\bcompare\b", lower):
            params["mode"] = "compare"
            all_urls = extract_all_urls(task)
            if len(all_urls) >= 2:
                params["compare_url"] = all_urls[1]
        elif re.search(r"\bdesign\b", lower):
            params["mode"] = "design"
    query = _extract_find_query(task, url) if intent == "find" else None
    return {"intent": intent, "url": url, "query": query, "params": params}
