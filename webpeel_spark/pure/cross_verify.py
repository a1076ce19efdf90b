"""Cross-engine search consensus (cross-verify.ts:61-121 pure core).

The reference fans a query out to several search engines and scores
each URL by how many engines agree on it; the fetch shell is N/A here.
``build_consensus`` takes the already-materialized per-engine result
lists and computes the consensus table + overall confidence exactly as
the reference does (first-seen title wins, agreement over ACTIVE
engines only, sort by agreement desc then average position asc,
confidence = mean agreement of the top 5, rounded to 2 decimals).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

_HOST_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)([^?#]*)")


def normalize_url(url: str) -> str:
    """cross-verify.ts:114 — hostname minus www + path minus trailing
    slash, query/fragment dropped; unparseable urls returned as-is."""
    m = _HOST_RE.match(url or "")
    if not m:
        return url
    host = m.group(1).lower()
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    host = host.split(":", 1)[0]
    host = re.sub(r"^www\.", "", host)
    path = m.group(2) or "/"
    return host + re.sub(r"/$", "", path)


def build_consensus(sources: List[Dict[str, Any]]) -> Dict[str, Any]:
    """``sources``: [{engine, topResults: [{url, title, ...}]}] in
    engine order.  Returns {consensus, confidence, totalSources}."""
    url_map: Dict[str, Dict[str, Any]] = {}
    for source in sources:
        for i, r in enumerate(source.get("topResults", [])):
            key = normalize_url(r["url"])
            existing = url_map.get(key)
            if existing:
                existing["engines"].append(source["engine"])
                existing["positions"].append(i + 1)
            else:
                url_map[key] = {"title": r.get("title", ""),
                                "engines": [source["engine"]],
                                "positions": [i + 1]}

    active = [s for s in sources if len(s.get("topResults", [])) > 0]
    n_active = len(active)

    consensus = [
        {
            "url": url,
            "title": data["title"],
            "appearsIn": data["engines"],
            "agreementScore": (len(data["engines"]) / n_active
                               if n_active else 0.0),
            "averagePosition": sum(data["positions"]) / len(data["positions"]),
        }
        for url, data in url_map.items()
    ]
    consensus.sort(key=lambda c: (-c["agreementScore"], c["averagePosition"]))

    top5 = consensus[:5]
    confidence = (sum(c["agreementScore"] for c in top5) / len(top5)
                  if top5 else 0.0)
    return {
        "consensus": consensus,
        "confidence": round(confidence * 100) / 100,
        "totalSources": n_active,
    }
