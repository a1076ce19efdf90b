"""Domain-intelligence fold cores (ee/domain-intel.ts:1-185).

The reference learns, per domain, whether fetches need browser or
stealth mode: sticky needsBrowser/needsStealth flags, an EMA latency
(alpha 0.3), a per-method outcome count, and a MIN_SAMPLES=3 ramp
before any recommendation — all held in an in-memory LRU map with a
1-hour TTL.  The batch engine folds a fetch-outcome log into the same
per-domain profile row (``operators/domain_intel.py``), the premium
server's warm cache rebuilt as a table.

Order matters twice, so the fold is a left fold over the domain's
records in time order, not an order-free aggregate:

* the EMA weighs later samples more (domain-intel.ts:130-134), and
* a gap larger than TTL_MS prunes the entry mid-stream
  (domain-intel.ts:55-62 ``prune`` runs on every record), restarting
  flags, EMA, counts and the sample ramp from zero.

MAX_DOMAINS LRU eviction (ts:159-164) is the in-memory shell's cap,
not fold semantics — the batch table keeps every domain, exactly like
the ported domain-memory table drops its cousin's LRU
(pure/domain_memory.py).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Iterable, Optional

from .url_validator import whatwg_hostname

# domain-intel.ts:32-35
TTL_MS = 60 * 60 * 1000
EMA_ALPHA = 0.3
MIN_SAMPLES = 3

METHODS = ("simple", "browser", "stealth")


def domain_key(url: str) -> str:
    """domain-intel.ts:47-53 — ``new URL(url).hostname.toLowerCase()``,
    '' when not a parseable absolute URL (callers skip those rows).
    Unlike domain-memory's normaliseDomain, www. is NOT stripped.

    Uses the shared WHATWG host emulation (pure/url_validator.py,
    Node-fuzz-pinned): special schemes lowercase + IDNA + IPv4-
    canonicalize (hex/octal/decimal spellings → dotted, invalid
    shapes → ''), other schemes keep an opaque percent-encoded host,
    IPv6 keeps brackets with RFC 5952 canonicalization either way."""
    _scheme, host = whatwg_hostname(url or "")
    return (host or "").lower()


def fold_intel(domain: str,
               records: Iterable[Dict[str, Any]]) -> Optional[Dict[str, Any]]:
    """recordDomainResult (domain-intel.ts:106-165) applied in time
    order for one domain.

    Each record: ``{method: simple|browser|stealth, latency_ms, ts}``
    with ``ts`` in epoch milliseconds (the reference stamps
    ``Date.now()``; the batch log carries the fetch timestamp).
    Returns the DomainIntel profile dict plus method counts, or None
    for an empty log.
    """
    entry: Optional[Dict[str, Any]] = None
    counts = {m: 0 for m in METHODS}
    for r in records:
        method = r["method"]
        ts = r["ts"]
        # prune(now) — a TTL-sized gap restarts the profile (ts:55-62,
        # 114-115); counts die with the entry
        if entry is not None and ts - entry["last_seen"] > TTL_MS:
            entry = None
            counts = {m: 0 for m in METHODS}
        latency = r.get("latency_ms")
        sanitized = (
            float(latency)
            if latency is not None and math.isfinite(latency) and latency > 0
            else (entry["avg_latency_ms"] if entry else 0.0)
        )  # ts:118-121
        if entry is not None:  # ts:123-137
            entry = {
                "domain": domain,
                "needs_browser": entry["needs_browser"]
                or method in ("browser", "stealth"),
                "needs_stealth": entry["needs_stealth"] or method == "stealth",
                "avg_latency_ms": sanitized if entry["avg_latency_ms"] == 0
                else entry["avg_latency_ms"] * (1 - EMA_ALPHA)
                + sanitized * EMA_ALPHA,
                "last_seen": ts,
                "sample_count": entry["sample_count"] + 1,
            }
        else:  # ts:138-144
            entry = {
                "domain": domain,
                "needs_browser": method in ("browser", "stealth"),
                "needs_stealth": method == "stealth",
                "avg_latency_ms": sanitized,
                "last_seen": ts,
                "sample_count": 1,
            }
        counts[method] += 1  # ts:146-151
    if entry is None:
        return None
    out = dict(entry)
    for m in METHODS:
        out[f"{m}_count"] = counts[m]
    return out


def recommend(entry: Optional[Dict[str, Any]],
              now: Optional[float] = None) -> Optional[str]:
    """getDomainRecommendation (domain-intel.ts:66-104) → 'stealth',
    'browser' or None.  ``now`` defaults to the profile's last_seen
    (recommendation as of the end of the log)."""
    if not entry:
        return None
    if now is not None and now - entry["last_seen"] > TTL_MS:
        return None  # ts:74-78
    if entry["sample_count"] < MIN_SAMPLES:
        return None  # ts:80
    # all samples needed stealth (ts:89-92)
    if entry["stealth_count"] == entry["sample_count"] \
            and entry["needs_stealth"]:
        return "stealth"
    # never succeeded with simple (ts:94-101)
    if entry["simple_count"] == 0 \
            and entry["browser_count"] + entry["stealth_count"] \
            == entry["sample_count"] \
            and entry["needs_browser"]:
        return "browser"
    return None
