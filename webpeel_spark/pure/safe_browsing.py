"""URL safety cores (safe-browsing.ts + threat-feeds.ts pure logic).

The reference checks URLs against Google Safe Browsing (API key) and
community threat feeds, falling back to a LOCAL heuristic blocklist
with no network at all — data-URI / credentials-trick / punycode
homograph / suspicious-IP / brand-plus-bad-TLD phishing patterns
(safe-browsing.ts:43-145).  That local blocklist is fully pure and is
the corpus-hygiene gate a training pipeline wants: ported here
verbatim.  The feed DECISION logic (threat-feeds.ts:51-120) is ported
with the network inputs as data — at corpus scale the feeds are
TABLES (OpenPhish publishes feed.txt, URLhaus bulk dumps), joined in
``operators/safety.py``; the Google API path and the TTL caches are
N/A (API key + live lookups).

JS URL nuance reproduced: WHATWG IDNA-encodes unicode hostnames, so
the reference's ``xn--`` homograph check fires on raw unicode
lookalike domains too — the port IDNA-encodes before testing.
"""

from __future__ import annotations

import re
from typing import Any, Dict, FrozenSet, List, Optional
from urllib.parse import urlsplit

# safe-browsing.ts:21-27
KNOWN_BRANDS = [
    "amazon", "google", "facebook", "apple", "microsoft", "paypal",
    "netflix", "instagram", "twitter", "linkedin", "dropbox", "chase",
    "wellsfargo", "bankofamerica", "citibank", "hsbc", "ebay",
    "walmart", "target", "bestbuy", "fedex", "ups", "usps", "irs",
    "dmv", "gov", "yahoo", "outlook", "hotmail",
]

# safe-browsing.ts:30
SUSPICIOUS_TLDS = frozenset([
    ".tk", ".ml", ".ga", ".cf", ".gq", ".top", ".click", ".loan",
    ".win", ".xyz", ".club", ".work",
])

# safe-browsing.ts:33-41
PRIVATE_IP_RANGES = [re.compile(p) for p in (
    r"^127\.\d+\.\d+\.\d+$", r"^10\.\d+\.\d+\.\d+$",
    r"^192\.168\.\d+\.\d+$", r"^172\.(1[6-9]|2\d|3[01])\.\d+\.\d+$",
    r"^169\.254\.\d+\.\d+$", r"^::1$", r"^fc00:",
)] + [re.compile(r"^fd[0-9a-f]{2}:", re.I)]

_IPV4_RE = re.compile(r"^\d{1,3}(\.\d{1,3}){3}$")
_IPV6_RE = re.compile(r"^\[?[0-9a-fA-F:]+\]?$")
_SPECIAL_SCHEMES = frozenset(["http", "https", "ftp", "ws", "wss"])
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def is_private_ip(host: str) -> bool:
    return any(p.match(host) for p in PRIVATE_IP_RANGES)


def is_ip_address(host: str) -> bool:
    if _IPV4_RE.match(host):
        return True
    # verbatim reference regex: also matches colon-free pure-hex
    # hostnames ("deadbeef") — bug-compatible on purpose, such hosts
    # get SUSPICIOUS_IP exactly like the reference flags them
    return bool(host and _IPV6_RE.match(host))


def _js_hostname(raw_url: str) -> Optional[str]:
    """(hostname, or None when new URL() would throw) — WHATWG
    lowercases and IDNA-encodes the host."""
    try:
        parts = urlsplit(raw_url)
    except ValueError:
        return None
    if not _SCHEME_RE.match(raw_url or ""):
        return None
    host = parts.hostname or ""
    if parts.scheme in _SPECIAL_SCHEMES and not host:
        return None
    if host and not all(ord(c) < 128 for c in host):
        try:
            host = host.encode("idna").decode("ascii")
        except (UnicodeError, UnicodeDecodeError):
            pass
    return host


def check_local_blocklist(url: str) -> Dict[str, Any]:
    """safe-browsing.ts:43-145 — {safe, threats, source} with no
    network: DATA_URI, INVALID_URL, URL_CREDENTIALS_TRICK,
    PUNYCODE_HOMOGRAPH, SUSPICIOUS_IP, PHISHING (brand × bad TLD),
    EXCESSIVE_HYPHENS, EXCESSIVE_SUBDOMAINS."""
    threats: List[str] = []

    def out(safe: bool) -> Dict[str, Any]:
        return {"safe": safe, "threats": threats,
                "source": "local-blocklist"}

    if re.match(r"^data:", (url or "").strip(), re.I):
        threats.append("DATA_URI")
        return out(False)

    hostname = _js_hostname(url or "")
    if hostname is None:
        threats.append("INVALID_URL")
        return out(False)

    try:
        parts = urlsplit(url)
        username, password = parts.username, parts.password
    except ValueError:
        username = password = None
    if username or password:
        threats.append("URL_CREDENTIALS_TRICK")
        return out(False)

    if re.search(r"\bxn--", hostname, re.I):
        labels = hostname.split(".")
        if any(re.match(r"^xn--", p, re.I) for p in labels[:-1]):
            threats.append("PUNYCODE_HOMOGRAPH")

    if is_ip_address(hostname):
        bare = hostname.strip("[]")
        if not is_private_ip(bare):
            threats.append("SUSPICIOUS_IP")
        return out(not threats)

    host_no_www = re.sub(r"^www\.", "", hostname.lower())
    labels = host_no_www.split(".")
    tld = "." + labels[-1] if len(labels) >= 2 else ""
    sld = labels[-2] if len(labels) >= 2 else ""

    if tld in SUSPICIOUS_TLDS:
        if any(b in host_no_www for b in KNOWN_BRANDS):
            threats.append("PHISHING")

    if sld.count("-") >= 3:
        threats.append("EXCESSIVE_HYPHENS")

    if tld in SUSPICIOUS_TLDS:
        subdomains = ".".join(labels[:-2])
        if any(b in subdomains for b in KNOWN_BRANDS) \
                and "PHISHING" not in threats:
            threats.append("PHISHING")

    if len(labels) > 5:
        threats.append("EXCESSIVE_SUBDOMAINS")

    return out(not threats)


def evaluate_threat_feeds(url: str,
                          openphish: FrozenSet[str] = frozenset(),
                          urlhaus: Optional[Dict[str, Any]] = None,
                          phishtank: Optional[Dict[str, Any]] = None,
                          ) -> Dict[str, Any]:
    """threat-feeds.ts:51-120 decision logic with the three feeds as
    data: ``openphish`` a set of lowercased urls, ``urlhaus`` /
    ``phishtank`` the already-fetched API response dicts (or None).
    PhishTank is consulted only when nothing else flagged, and the
    details string mirrors the reference format."""
    normalized = (url or "").lower()
    threats: List[str] = []
    details: Optional[str] = None
    source = "none"

    if normalized in openphish:
        threats.append("OPENPHISH_PHISHING")
        source = "openphish"

    if urlhaus and urlhaus.get("query_status") == "listed":
        threats.append("URLHAUS_MALWARE")
        source = "urlhaus"
        tags = ", ".join(urlhaus.get("tags") or []) or "none"
        details = (f"URLhaus: {urlhaus.get('threat') or 'malware'}, "
                   f"tags: {tags}")

    if not threats and phishtank:
        results = phishtank.get("results") or {}
        if results.get("in_database") and results.get("verified") == "yes" \
                and results.get("valid") == "yes":
            threats.append("PHISHTANK_PHISHING")
            source = "phishtank"

    return {"safe": not threats, "threats": threats, "source": source,
            "details": details}
