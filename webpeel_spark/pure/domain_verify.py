"""Domain-verification scoring cores (domain-verify.ts pure logic).

The reference actively probes TLS / HTTP headers / DNS during the
fetch pipeline (3-second-timeout network collectors, N/A here) and
then SCORES the collected signals 0-100 as a bonus on top of the
static source-credibility score.  The scoring half is pure functions
over signal structs — ported verbatim: CA-issuer normalization,
Server-header CDN detection, nameserver labelling, SPF/DMARC record
classification, and ``compute_score`` with its signal/warning
messages.  The batch face is a projection over a table of
already-collected probe results (``operators/safety.py`` neighbors).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, List, Optional, Tuple

# domain-verify.ts:45-63
CA_LABELS: List[Tuple[str, str]] = [
    ("Let's Encrypt", "Let's Encrypt"),
    ("ISRG", "Let's Encrypt"),
    ("DigiCert", "DigiCert"),
    ("Comodo", "Comodo"),
    ("Sectigo", "Sectigo"),
    ("GlobalSign", "GlobalSign"),
    ("GeoTrust", "GeoTrust"),
    ("Thawte", "Thawte"),
    ("Entrust", "Entrust"),
    ("Amazon", "Amazon Trust Services"),
    ("Google Trust Services", "Google Trust Services"),
    ("Google", "Google Trust Services"),
    ("Microsoft", "Microsoft RSA TLS CA"),
    ("Cloudflare", "Cloudflare"),
    ("ZeroSSL", "ZeroSSL"),
    ("Buypass", "Buypass"),
    ("SSL.com", "SSL.com"),
]

# domain-verify.ts:66-80
CDN_LABELS: List[Tuple[re.Pattern, str]] = [
    (re.compile(p, re.I), label) for p, label in (
        (r"cloudflare", "Cloudflare"), (r"vercel", "Vercel"),
        (r"netlify", "Netlify"), (r"awselb|amazon", "AWS"),
        (r"nginx", "nginx"), (r"apache", "Apache"),
        (r"gws|google", "Google"), (r"microsoft", "Microsoft"),
        (r"fastly", "Fastly"), (r"akamai", "Akamai"),
        (r"litespeed", "LiteSpeed"), (r"openresty", "OpenResty"),
        (r"caddy", "Caddy"),
    )
]

# domain-verify.ts:262-273
_NS_LABELS: List[Tuple[Tuple[str, ...], str]] = [
    (("cloudflare",), "Cloudflare"),
    (("amazonaws", "awsdns"), "AWS"),
    (("googledomains", "google"), "Google"),
    (("azure", "microsoft"), "Azure"),
    (("namecheap",), "Namecheap"),
    (("godaddy",), "GoDaddy"),
    (("digitalocean",), "DigitalOcean"),
    (("vercel",), "Vercel"),
    (("netlify",), "Netlify"),
]

KNOWN_CAS = ["DigiCert", "Comodo", "GlobalSign", "GeoTrust", "Entrust",
             "Sectigo", "Google Trust Services", "Amazon Trust Services"]
KNOWN_CDNS = ["Cloudflare", "Vercel", "Netlify", "AWS", "Fastly",
              "Akamai"]
KNOWN_NS = ["Cloudflare", "AWS", "Google", "Azure", "Vercel", "Netlify"]


def normalise_ca_issuer(raw: str) -> str:
    """domain-verify.ts:93-98 — first matching substring label."""
    for pattern, label in CA_LABELS:
        if pattern in (raw or ""):
            return label
    return raw or "Unknown CA"


def detect_server(raw: str) -> str:
    """domain-verify.ts:100-104 — first matching CDN regex."""
    for regex, label in CDN_LABELS:
        if regex.search(raw or ""):
            return label
    return (raw or "").strip() or "unknown"


def label_nameservers(nameservers: Iterable[str]) -> List[str]:
    """domain-verify.ts:261-279 — provider labels, deduped
    first-seen."""
    out: List[str] = []
    for n in nameservers:
        lower = (n or "").lower()
        label = n
        for needles, name in _NS_LABELS:
            if any(x in lower for x in needles):
                label = name
                break
        if label not in out:
            out.append(label)
    return out


def classify_dns_txt(txt_records: Iterable[str],
                     dmarc_records: Iterable[str]) -> Tuple[bool, bool]:
    """domain-verify.ts:255-258 — (has_spf, has_dmarc)."""
    has_spf = any((s or "").lower().startswith("v=spf1")
                  for s in txt_records)
    has_dmarc = any((s or "").lower().startswith("v=dmarc1")
                    for s in dmarc_records)
    return has_spf, has_dmarc


def compute_score(tls: Optional[Dict[str, Any]],
                  headers: Dict[str, Any],
                  dns: Optional[Dict[str, Any]]) -> Dict[str, Any]:
    """domain-verify.ts:290-377 — 0-100 bonus score + signal/warning
    messages.  ``tls``: {valid, issuer, days_remaining, ev};
    ``headers``: {hsts, csp, server}; ``dns``: {has_mx, has_dmarc,
    has_spf, nameservers}.  Returns {score, signals, warnings}."""
    score = 0
    signals: List[str] = []
    warnings: List[str] = []

    if tls:
        if tls.get("valid"):
            score += 15
            signals.append(f"Valid TLS cert ({tls.get('issuer')}, "
                           f"{tls.get('days_remaining')} days remaining)")
            if tls.get("issuer") in KNOWN_CAS:
                score += 5
                signals.append(f"Trusted CA ({tls.get('issuer')})")
            if tls.get("ev"):
                score += 10
                signals.append("Extended Validation (EV) certificate")
        else:
            warnings.append("Invalid or expired TLS certificate")
        if (tls.get("days_remaining") or 0) < 14:
            warnings.append(f"TLS certificate expires soon "
                            f"({tls.get('days_remaining')} days)")
    else:
        warnings.append("TLS check unavailable or failed")

    if headers.get("hsts"):
        score += 10
        signals.append("HSTS (HTTP Strict Transport Security) enabled")
    else:
        warnings.append("No HSTS header")

    if headers.get("csp"):
        score += 5
        signals.append("Content-Security-Policy header present")

    if headers.get("server") in KNOWN_CDNS:
        score += 10
        signals.append(f"HTTPS via {headers.get('server')}")

    if dns:
        if dns.get("has_mx"):
            score += 10
            signals.append("Mail exchange (MX) records present — "
                           "real organisation")
        else:
            warnings.append("No MX records — may not be a real "
                            "organisation")
        if dns.get("has_dmarc"):
            score += 10
            signals.append("DMARC policy configured (email "
                           "authentication)")
        else:
            warnings.append("No DMARC policy")
        if dns.get("has_spf"):
            score += 5
            signals.append("SPF record present (email authentication)")
        nameservers = dns.get("nameservers") or []
        if nameservers:
            known = [ns for ns in nameservers if ns in KNOWN_NS]
            if known:
                signals.append(f"Hosted on {', '.join(known)} "
                               f"nameservers")
    else:
        warnings.append("DNS check failed")

    return {"score": max(0, min(100, score)), "signals": signals,
            "warnings": warnings}
