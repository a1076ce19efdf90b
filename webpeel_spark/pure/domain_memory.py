"""Adaptive domain learning cores (domain-memory.ts:1-229).

The reference remembers, per domain, which fetch/extraction method
worked best (rolling averages, sticky requiresJs/hasAntibot flags, a
success-count confidence ramp) in an LRU cache, with a
``domain_memory`` Postgres TABLE left as an explicit TODO
(domain-memory.ts:215-228).  The batch engine builds exactly that
table: fold an ordered per-domain result log into one profile row
(``operators/domain_memory.py``).

The fold is ORDER-DEPENDENT by reference semantics: an incoming
method becomes bestMethod only when its quality strictly exceeds the
*running* average at that moment — so the profile is a left fold over
results in time order, not an order-free aggregate.  The distributed
operator sorts each domain group by timestamp before folding to
reproduce it exactly.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, List, Optional

from .source_scoring import extract_hostname

# domain-memory.ts:63-67
JS_METHODS = frozenset(["browser", "stealth"])
ANTIBOT_METHODS = frozenset(["stealth", "cloaked"])


def normalise_domain(url: str) -> str:
    """domain-memory.ts:48-57 — lowercase hostname minus leading www;
    bare hostnames pass through."""
    host = extract_hostname(url)
    if not host:
        host = (url or "").lower()
    return re.sub(r"^www\.", "", host)


def fold_results(domain: str,
                 results: Iterable[Dict[str, Any]]) -> Optional[Dict[str, Any]]:
    """domain-memory.ts:73-134 (recordFetchResult applied in order).

    Each result: {method, response_ms, quality, was_blocked,
    had_javascript, ts}.  Returns the DomainMemoryEntry dict (or None
    for an empty log)."""
    entry: Optional[Dict[str, Any]] = None
    for r in results:
        method = r["method"]
        if entry is None:
            entry = {
                "domain": domain,
                "best_method": method,
                "avg_response_ms": float(r["response_ms"]),
                "success_count": 1,
                "last_success": r.get("ts"),
                "avg_quality": float(r["quality"]),
                "requires_js": method in JS_METHODS
                or bool(r.get("had_javascript")),
                "has_antibot": method in ANTIBOT_METHODS
                or bool(r.get("was_blocked")),
                "total_attempts": 1,
            }
            continue
        # upgrade bestMethod when the incoming quality strictly beats
        # the RUNNING average (order-dependent on purpose)
        if r["quality"] > entry["avg_quality"]:
            entry["best_method"] = method
        count = entry["success_count"]
        entry["avg_response_ms"] = (
            entry["avg_response_ms"] * count + r["response_ms"]) \
            / (count + 1)
        entry["avg_quality"] = (
            entry["avg_quality"] * count + r["quality"]) / (count + 1)
        entry["success_count"] += 1
        entry["total_attempts"] += 1
        entry["last_success"] = r.get("ts")
        if method in JS_METHODS or r.get("had_javascript"):
            entry["requires_js"] = True
        if method in ANTIBOT_METHODS or r.get("was_blocked"):
            entry["has_antibot"] = True
    return entry


def confidence(success_count: int) -> float:
    """domain-memory.ts:152-163 — 1 → 0.3, 2..4 ramp 0.425..0.675,
    5..9 ramp 0.8..0.92, 10+ → 0.95."""
    if success_count >= 10:
        return 0.95
    if success_count >= 5:
        return 0.8 + ((success_count - 5) / 5) * 0.15
    if success_count >= 2:
        return 0.3 + ((success_count - 1) / 4) * 0.5
    return 0.3


def recommended_method(entry: Optional[Dict[str, Any]]
                       ) -> Optional[Dict[str, Any]]:
    """domain-memory.ts:141-172 — {method, confidence,
    avg_response_ms, requires_js}, None without history."""
    if not entry:
        return None
    return {
        "method": entry["best_method"],
        "confidence": confidence(entry["success_count"]),
        "avg_response_ms": entry["avg_response_ms"],
        "requires_js": entry["requires_js"],
    }


def memory_stats(entries: Iterable[Dict[str, Any]],
                 top_n: int = 20) -> Dict[str, Any]:
    """domain-memory.ts:178-207 — total + top-N by success count."""
    entries = list(entries)
    ranked = sorted(entries, key=lambda e: -e["success_count"])[:top_n]
    return {
        "total_domains": len(entries),
        "top_domains": [{"domain": e["domain"],
                         "best_method": e["best_method"],
                         "success_count": e["success_count"]}
                        for e in ranked],
    }
