"""Source scoring — search-result ranking signals (source-scoring.ts:1-548).

Ranks /v1/ask-style search results with four combined signals:

1. primary-source detection (query entity in the domain, official path)
2. domain authority (tiered: known domains → subdomain patterns → TLDs)
3. freshness (publish/modified metadata, bucketed by age)
4. per-registered-domain dedup (top-N per domain)

final = bm25*0.40 + authority*0.25 + freshness*0.20 + primary*0.15
(factual/pricing queries double freshness at authority's expense:
 0.35/0.15/0.35/0.15).

All functions take an optional ``now`` so scoring is deterministic in
tests and SQL-twin-able in the Spark operator (the reference uses
wall-clock ``Date.now()``).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from typing import Any, Dict, List, Optional, Tuple

# tier table (source-scoring.ts:71-113): (kind, pattern, score) checked
# in order — specific domains, then subdomain regexes, then TLDs.
AUTHORITY_TIERS: List[Tuple[str, str, float]] = [
    ("domain", "github.com", 0.9),
    ("domain", "arxiv.org", 0.9),
    ("domain", "stackoverflow.com", 0.85),
    ("domain", "wikipedia.org", 0.85),
    ("domain", "reuters.com", 0.8),
    ("domain", "apnews.com", 0.8),
    ("domain", "bloomberg.com", 0.8),
    ("domain", "wsj.com", 0.8),
    ("domain", "ft.com", 0.8),
    ("domain", "nytimes.com", 0.8),
    ("domain", "bbc.com", 0.8),
    ("domain", "bbc.co.uk", 0.8),
    ("domain", "techcrunch.com", 0.75),
    ("domain", "arstechnica.com", 0.75),
    ("domain", "theverge.com", 0.75),
    ("domain", "wired.com", 0.75),
    ("domain", "zdnet.com", 0.7),
    ("domain", "cnn.com", 0.75),
    ("prefix", "docs.", 0.9),
    ("prefix", "developer.", 0.9),
    ("prefix", "developers.", 0.9),
    ("prefix", "api.", 0.85),
    ("prefix", "support.", 0.8),
    ("prefix", "help.", 0.8),
    ("tld", ".gov", 1.0),
    ("tld", ".edu", 0.95),
    ("tld", ".org", 0.9),
]

AUTHORITY_DEFAULT = 0.5

ENTITY_STOPWORDS = frozenset("""
what is the how do a an where when why which can does are was were be been
being have has had will would could should may might shall must did i you
he she it we they me him her us them my your his its our their this that
these those of in on at by for with about into to from up out and or but
if so as not no than then also get use list find tell show give make need
want know free best good new all any some more most vs versus compare
difference between using used many much long cost price limit rate
""".split())

FACTUAL_QUERY_RE = re.compile(
    r"\b(price|pricing|cost|costs|limit|limits|rate|rates|quota|tier|plan"
    r"|plans|fee|fees|subscription|deprecat|latest|current|version|update)\b",
    re.I)

OFFICIAL_PATH_RE = re.compile(
    r"/(docs|api|pricing|help|support|documentation|reference|guide|faq"
    r"|changelog|release|releases|download|downloads|getting-started"
    r"|quickstart)\b", re.I)

_HOST_RE = re.compile(r"^https?://([^/?#]+)", re.I)
_PATH_RE = re.compile(r"^https?://[^/?#]+(/[^?#]*)?", re.I)
_MULTI_TLD_RE = re.compile(r"\.(co|com|net|org|gov|edu)\.[a-z]{2}$", re.I)


def extract_hostname(url: str) -> str:
    """source-scoring.ts:151 — lowercase hostname, '' if not a URL."""
    m = _HOST_RE.match(url or "")
    if not m:
        return ""
    host = m.group(1).lower()
    # strip credentials / port the way URL.hostname does
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    return host.split(":", 1)[0]


def extract_registered_domain(url: str) -> str:
    """source-scoring.ts:164 — eTLD+1 with common multi-part ccTLDs."""
    hostname = extract_hostname(url)
    if not hostname:
        return ""
    parts = hostname.split(".")
    if _MULTI_TLD_RE.search(hostname):
        return ".".join(parts[-3:])
    return ".".join(parts[-2:]) if len(parts) >= 2 else hostname


def _extract_path(url: str) -> str:
    m = _PATH_RE.match(url or "")
    return (m.group(1) or "") if m else ""


def extract_entity_candidates(query: str) -> List[str]:
    """source-scoring.ts:199 — non-stopword tokens of length ≥ 3."""
    tokens = re.sub(r"[^\w\s]", " ", query.lower()).split()
    return [t for t in tokens if len(t) >= 3 and t not in ENTITY_STOPWORDS]


def score_primary_source(url: str, query: str) -> float:
    """source-scoring.ts:215 — +0.3 entity-in-domain-segment, +0.2
    official path, capped at 1.0."""
    hostname = extract_hostname(url)
    entities = extract_entity_candidates(query)
    score = 0.0
    segments = re.split(r"[.\-_]", hostname)
    if any(e in segments for e in entities):
        score += 0.3
    if OFFICIAL_PATH_RE.search(_extract_path(url)):
        score += 0.2
    return min(1.0, score)


def is_primary_source(url: str, query: str) -> bool:
    return score_primary_source(url, query) > 0


def score_domain_authority(url: str) -> float:
    """source-scoring.ts:256 — first matching tier wins."""
    hostname = extract_hostname(url)
    if not hostname:
        return AUTHORITY_DEFAULT
    for kind, pattern, score in AUTHORITY_TIERS:
        if kind == "domain":
            if hostname == pattern or hostname.endswith("." + pattern):
                return score
        elif kind == "prefix":
            if hostname.startswith(pattern):
                return score
        else:  # tld
            if hostname.endswith(pattern):
                return score
    return AUTHORITY_DEFAULT


def authority_label(score: float) -> str:
    """source-scoring.ts:283."""
    if score >= 0.9:
        return "official"
    if score >= 0.8:
        return "institutional"
    if score >= 0.7:
        return "major"
    return "general"


_ISO_DATE_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})"
    r"(?:[T ](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{1,6}))?)?"
    r"(Z|[+-]\d{2}:?\d{2})?)?$")


def _parse_date(s: str) -> Optional[datetime]:
    """JS ``new Date(string)`` subset: ISO 8601 date / datetime, with
    date-only strings read as UTC midnight (the JS behavior)."""
    m = _ISO_DATE_RE.match(s.strip())
    if not m:
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    hh = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    ss = int(m.group(6) or 0)
    us = int((m.group(7) or "0").ljust(6, "0"))
    tz = timezone.utc
    off = m.group(8)
    if off and off != "Z":
        sign = 1 if off[0] == "+" else -1
        parts = off[1:].replace(":", "")
        from datetime import timedelta
        tz = timezone(sign * timedelta(hours=int(parts[:2]),
                                       minutes=int(parts[2:] or 0)))
    try:
        return datetime(y, mo, d, hh, mi, ss, us, tzinfo=tz)
    except ValueError:
        return None


_DATE_FIELDS = ("publishDate", "published", "article:published_time",
                "og:article:published_time", "datePublished", "modified",
                "dateModified")


def extract_page_date(metadata: Optional[Dict[str, Any]] = None,
                      freshness: Optional[Dict[str, Any]] = None,
                      now: Optional[datetime] = None) -> Optional[datetime]:
    """source-scoring.ts:298 — first parseable candidate in field-
    preference order, sanity-bounded to (1990, now.year + 1]."""
    now = now or datetime.now(timezone.utc)
    candidates = [
        *((metadata or {}).get(f) for f in _DATE_FIELDS),
        (freshness or {}).get("lastModified"),
    ]
    for candidate in candidates:
        if not candidate or not isinstance(candidate, str):
            continue
        d = _parse_date(candidate)
        if d is not None and 1990 < d.year <= now.year + 1:
            return d
    return None


def score_freshness(metadata: Optional[Dict[str, Any]] = None,
                    freshness_data: Optional[Dict[str, Any]] = None,
                    now: Optional[datetime] = None) -> float:
    """source-scoring.ts:334 — age buckets; 0.5 neutral when unknown."""
    now = now or datetime.now(timezone.utc)
    page_date = extract_page_date(metadata, freshness_data, now)
    if page_date is None:
        return 0.5
    age_days = (now - page_date).total_seconds() / 86400
    if age_days <= 7:
        return 1.0
    if age_days <= 30:
        return 0.9
    if age_days <= 90:
        return 0.8
    if age_days <= 365:
        return 0.6
    return 0.4


def freshness_label(metadata: Optional[Dict[str, Any]] = None,
                    freshness_data: Optional[Dict[str, Any]] = None,
                    now: Optional[datetime] = None) -> str:
    """source-scoring.ts:353."""
    score = score_freshness(metadata, freshness_data, now)
    if score >= 0.85:
        return "recent"
    if score >= 0.75:
        return "this-month"
    if score >= 0.45:
        return "this-year"
    return "older"


def is_factual_query(query: str) -> bool:
    """source-scoring.ts:372."""
    return bool(FACTUAL_QUERY_RE.search(query))


def compute_final_score(bm25_score: float, authority_score: float,
                        freshness_score: float, primary_source_score: float,
                        factual: bool) -> float:
    """source-scoring.ts:389."""
    if factual:
        return (bm25_score * 0.35 + authority_score * 0.15
                + freshness_score * 0.35 + primary_source_score * 0.15)
    return (bm25_score * 0.40 + authority_score * 0.25
            + freshness_score * 0.20 + primary_source_score * 0.15)


def deduplicate_by_domain(sources: List[Dict[str, Any]],
                          max_per_domain: int = 2) -> List[Dict[str, Any]]:
    """source-scoring.ts:411 — stable sort by finalScore desc, keep the
    best ``max_per_domain`` per registered domain."""
    ordered = sorted(sources, key=lambda s: -s["finalScore"])
    counts: Dict[str, int] = {}
    result = []
    for source in ordered:
        domain = extract_registered_domain(source["url"])
        n = counts.get(domain, 0)
        if n < max_per_domain:
            result.append(source)
            counts[domain] = n + 1
    return result


def score_source(search_result: Dict[str, str], query: str,
                 bm25_score: float = 0.5,
                 metadata: Optional[Dict[str, Any]] = None,
                 freshness_data: Optional[Dict[str, Any]] = None,
                 factual_query: Optional[bool] = None,
                 now: Optional[datetime] = None) -> Dict[str, Any]:
    """source-scoring.ts:450 — one source, all signals combined."""
    factual = factual_query if factual_query is not None \
        else is_factual_query(query)
    authority_score = score_domain_authority(search_result["url"])
    freshness_score = score_freshness(metadata, freshness_data, now)
    primary_source_score = score_primary_source(search_result["url"], query)
    final_score = compute_final_score(
        bm25_score, authority_score, freshness_score,
        primary_source_score, factual)
    return {
        "url": search_result["url"],
        "title": search_result.get("title", ""),
        "snippet": search_result.get("snippet", ""),
        "confidence": bm25_score,
        "authority": authority_label(authority_score),
        "freshness": freshness_label(metadata, freshness_data, now),
        "isPrimarySource": primary_source_score > 0,
        "bm25Score": bm25_score,
        "authorityScore": authority_score,
        "freshnessScore": freshness_score,
        "primarySourceScore": primary_source_score,
        "finalScore": final_score,
    }


def rank_search_results(results: List[Dict[str, str]], query: str,
                        max_per_domain: int = 2) -> List[Dict[str, str]]:
    """source-scoring.ts:500 — pre-fetch ranking: BM25 and freshness
    neutral (0.5), authority + primary only; deduped, ranked."""
    factual = is_factual_query(query)
    scored = []
    for r in results:
        authority_score = score_domain_authority(r["url"])
        primary_source_score = score_primary_source(r["url"], query)
        final = compute_final_score(0.5, authority_score, 0.5,
                                    primary_source_score, factual)
        scored.append({**r, "finalScore": final})
    deduped = deduplicate_by_domain(scored, max_per_domain)
    return [{k: v for k, v in s.items() if k != "finalScore"}
            for s in deduped]


def score_fetched_sources(sources: List[Dict[str, Any]], query: str,
                          max_per_domain: int = 2,
                          now: Optional[datetime] = None
                          ) -> List[Dict[str, Any]]:
    """source-scoring.ts:524 — full post-BM25 scoring, deduped+sorted."""
    factual = is_factual_query(query)
    scored = [
        score_source(s["searchResult"], query,
                     bm25_score=s.get("bm25Score", 0.5),
                     metadata=s.get("metadata"),
                     freshness_data=s.get("freshnessData"),
                     factual_query=factual, now=now)
        for s in sources
    ]
    return deduplicate_by_domain(scored, max_per_domain)
