"""Challenge / bot-protection page detection
(challenge-detection.ts:1-561).

Pure string/regex scoring over raw HTML (+ optional HTTP status):
vendor-specific detectors (Cloudflare, PerimeterX, Akamai, DataDome,
Incapsula), a multi-signal generic-block detector, and an SPA
empty-shell detector, gated by false-positive guards (substantial
real content, normal 404 pages) and a 0.7 confidence threshold.

The reference runs this twice per fetch (fetch-level and
post-extraction, pipeline.ts:1389-1440) and escalates to a browser
challenge-solver — the solver is N/A here, but the DETECTION is a
first-class training-data filter: a Common-Crawl-style corpus is full
of 200-status challenge interstitials that look like pages, and
``operators/challenge.py`` stamps them so they never reach the
training set.

Case-sensitivity quirks reproduced deliberately (pinned by the ported
reference suites): the Cloudflare/PerimeterX/Akamai/empty-shell
detectors receive the ORIGINAL html (their `has` helper documents
itself as case-insensitive but uses plain `.includes`), while
DataDome/Incapsula/generic-block receive the lowercased copy
(detectChallenge:529-531).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

THRESHOLD = 0.7

CHALLENGE_TYPES = ("cloudflare", "captcha", "akamai", "perimeterx",
                   "datadome", "incapsula", "generic-block", "empty-shell")


def _count_matches(html: str, needles: Sequence[str]) -> int:
    """challenge-detection.ts:41-47."""
    return sum(1 for n in needles if n in html)


def _extract_title(html: str) -> str:
    """challenge-detection.ts:50-53 — <title> content, lowercased."""
    m = re.search(r"<title[^>]*>([^<]*)</title>", html, re.I)
    return m.group(1).lower().strip() if m else ""


def estimate_visible_text_length(html: str) -> int:
    """challenge-detection.ts:56-65 — visible text after stripping
    scripts/styles/tags."""
    stripped = re.sub(r"<script[\s\S]*?</script>", "", html, flags=re.I)
    stripped = re.sub(r"<style[\s\S]*?</style>", "", stripped, flags=re.I)
    stripped = re.sub(r"<noscript[\s\S]*?</noscript>", "", stripped,
                      flags=re.I)
    stripped = re.sub(r"<[^>]*>", "", stripped)
    stripped = re.sub(r"\s+", " ", stripped).strip()
    return len(stripped)


def _detect_cloudflare(html: str, status: Optional[int]) -> float:
    """challenge-detection.ts:69-116."""
    score = 0.0
    strong = [
        "cf-browser-verification", "cf-turnstile", "cf-challenge",
        "cf-chl-widget", "challenge-running", "challenge-form",
        "window._cf_chl_opt", "__cf_chl_f_tk", "cf_chl_prog",
        "cf-spinner", "cf-error-overview",
    ]
    score += min(_count_matches(html, strong) * 0.25, 0.75)
    title = _extract_title(html)
    if ("just a moment" in title or "attention required" in title
            or "checking your browser" in title
            or "one more step" in title):
        score += 0.35
    if re.search(r"ray\s+id", html, re.I) or re.search(r"ray id:", html,
                                                       re.I):
        score += 0.2
    if "cdn-cgi/" in html:
        score += 0.15
    if status in (403, 503) and score > 0:
        score += 0.2
    return min(score, 1.0)


def _detect_perimeterx(html: str, status: Optional[int]) -> float:
    """challenge-detection.ts:118-182."""
    score = 0.0
    html_lower = html.lower()
    signals = [
        "perimeterx", "_pxhd", "px-captcha", "_pxCaptcha",
        "window._pxAppId", "window._pxUuid", "pxCaptcha", "_px3",
        "_pxvid", "human.security", "px-block",
    ]
    score += min(_count_matches(html, signals) * 0.3, 0.8)
    expedia = ["human or a bot", "show us your human side", "human-side",
               "bot or not"]
    score += min(_count_matches(html_lower, expedia) * 0.25, 0.6)
    title = _extract_title(html_lower)
    if ("access denied" in title or "has been denied" in title
            or "access to this page" in title or "please verify" in title
            or "bot detection" in title
            or "pardon our interruption" in title or "bot or not" in title):
        score += 0.15
    has_press_hold = ("Press & Hold" in html or "Press &amp; Hold" in html
                      or "press and hold" in html_lower)
    has_human_check = ("confirm you are human" in html_lower
                       or "confirm you area human" in html_lower
                       or "not a bot" in html_lower
                       or "human or a bot" in html_lower
                       or "show us your human side" in html_lower
                       or "bot or not" in html_lower)
    if has_press_hold and has_human_check:
        score += 0.5
    elif has_press_hold or has_human_check:
        score += 0.2
    if re.search(r"reference\s+id[:\s]+[0-9a-f-]{20,}", html, re.I):
        score += 0.2
    if status == 403 and score > 0:
        score += 0.1
    return min(score, 1.0)


def _detect_akamai(html: str, status: Optional[int]) -> float:
    """challenge-detection.ts:184-217."""
    score = 0.0
    signals = ["ak_bmsc", "_abck", "bm_sz", "akamaized.net", "akamai",
               "bmak.", "__utmz", "akam/", "BotManagerSettings"]
    score += min(_count_matches(html, signals) * 0.2, 0.6)
    title = _extract_title(html)
    if "access denied" in title or "forbidden" in title:
        score += 0.2
    if len(html) < 2000 and score > 0:
        score += 0.15
    if status in (403, 503) and score > 0:
        score += 0.1
    return min(score, 1.0)


def _detect_datadome(html: str, _status: Optional[int]) -> float:
    """challenge-detection.ts:219-244 (receives the lowercased html)."""
    score = 0.0
    signals = ["datadome", "dd.js", "datadome.co", "window.ddjskey",
               "ddjskey", "dd_referrer", "dd_cookie_test",
               "datadome/captcha", "captcha-delivery.com",
               "geo.captcha-delivery.com"]
    score += min(_count_matches(html, signals) * 0.3, 0.9)
    if re.search(r"\bvar\s+dd\s*=\s*\{", html) and "captcha-delivery" in html:
        score += 0.4
    return min(score, 1.0)


def _detect_incapsula(html: str, _status: Optional[int]) -> float:
    """challenge-detection.ts:246-271 (receives the lowercased html)."""
    score = 0.0
    signals = ["incap_ses_", "visid_incap_", "_incap_", "imperva",
               "incapsula", "incapsula.com", "incapcookies", "reese84"]
    score += min(_count_matches(html, signals) * 0.3, 0.8)
    if ("This site requires JavaScript" in html
            or "requires javascript" in html):
        score += 0.15
    return min(score, 1.0)


_BLOCK_TITLES = [
    "access denied", "has been denied", "has been blocked",
    "access to this page", "403 forbidden", "bot detected",
    "verify you are human", "security check", "ddos protection",
    "rate limit exceeded", "too many requests", "captcha required",
    "robot check", "unusual traffic", "automated access",
    "browser check", "human verification", "blocked by",
    "pardon our interruption", "bot or not", "blocked",
    "verification required", "are you a robot",
]

_BODY_SIGNALS = [
    "automated access", "suspicious activity", "rate limit",
    "bot detected", "verify you are human", "verify that you are human",
    "confirm you are human", "confirm you area human", "are you a robot",
    "are you human", "not a bot", "and not a bot", "press & hold",
    "press and hold", "ddos protection by",
    "please complete the security check",
    "this page checks to see if it", "prove you are human",
    "security challenge", "enable javascript and cookies",
    "javascript and cookies to continue", "enable cookies",
    "reference id", "why have i been blocked",
    "your access has been blocked", "detected unusual activity",
    "human or a bot", "show us your human side", "bot or not",
    "complete a captcha", "solve this puzzle", "verify your identity",
    "unusual traffic", "too many requests", "access denied",
    "automated traffic", "we need to verify", "human verification",
    "browser verification", "checking your browser",
    "please wait while we verify", "blocked by",
]


def _detect_generic_block(html: str, status: Optional[int]) -> float:
    """challenge-detection.ts:280-416 (receives the lowercased html)."""
    score = 0.0
    title = _extract_title(html)
    for t in _BLOCK_TITLES:
        if t in title:
            score += 0.35
            break
    body_count = _count_matches(html, _BODY_SIGNALS)
    if body_count >= 2:
        score += min((body_count - 1) * 0.15, 0.4)
    elif body_count == 1 and len(title) == 0:
        score += 0.05
    if len(html) < 1000 and status in (403, 503, 429):
        score += 0.25
        if len(html) < 500:
            score += 0.15
    if re.search(r"meta[^>]*refresh", html, re.I) and \
            re.search(r"captcha|challenge", html, re.I):
        score += 0.75
    if score > 0.2:
        form_only = (len(html) < 3000
                     and len(re.findall(r"<form", html, re.I)) > 0
                     and estimate_visible_text_length(html) < 150)
        if form_only:
            score += 0.15
    if status == 429:
        score += 0.25
    if (len(html) < 2000 and re.search(r"iframe[^>]*captcha", html, re.I)
            and status in (403, 503, 429)):
        score += 0.5
    return min(score, 1.0)


def _detect_empty_shell(html: str, _status: Optional[int]) -> float:
    """challenge-detection.ts:422-458."""
    if len(html) < 2000:
        return 0.0
    if estimate_visible_text_length(html) >= 200:
        return 0.0
    score = 0.65
    shell_patterns = [
        '<div id="root"></div>', '<div id="root"> </div>',
        '<div id="app"></div>', '<div id="app"> </div>',
        '<div id="__next"></div>', '<div id="__next"> </div>',
        '<div id="gatsby-focus-wrapper"></div>', '<div id="___gatsby"></div>',
        'id="root"', 'id="__next"',
    ]
    shell_count = _count_matches(html, shell_patterns)
    if shell_count > 0:
        score += min(shell_count * 0.1, 0.2)
    if len(re.findall(r"<script", html, re.I)) >= 3:
        score += 0.1
    return min(score, 1.0)


def _looks_like_real_content(html: str) -> bool:
    """challenge-detection.ts:466-476."""
    visible = estimate_visible_text_length(html)
    if visible > 1500:
        return True
    if visible > 600 and len(html) > 5000:
        return True
    return False


def _looks_like_404(html: str, status: Optional[int]) -> bool:
    """challenge-detection.ts:482-491."""
    if status != 404:
        return False
    title = _extract_title(html)
    return ("not found" in title or "404" in title
            or "page not found" in title or "error 404" in title)


def detect_challenge(html: str,
                     status_code: Optional[int] = None) -> Dict[str, Any]:
    """challenge-detection.ts:501-561 — {is_challenge, type,
    confidence, details}."""
    if not html:
        return {"is_challenge": False, "type": None, "confidence": 0.0,
                "details": None}
    real_content = _looks_like_real_content(html)
    if _looks_like_404(html, status_code):
        return {"is_challenge": False, "type": None, "confidence": 0.0,
                "details": "404 page"}
    html_lower = html.lower()
    scores: List[Tuple[str, float]] = [
        ("cloudflare", _detect_cloudflare(html, status_code)),
        ("perimeterx", _detect_perimeterx(html, status_code)),
        ("akamai", _detect_akamai(html, status_code)),
        ("datadome", _detect_datadome(html_lower, status_code)),
        ("incapsula", _detect_incapsula(html_lower, status_code)),
        ("generic-block", _detect_generic_block(html_lower, status_code)),
        ("empty-shell", _detect_empty_shell(html, status_code)),
    ]
    best_type, best_score = scores[0]
    for t, s in scores:
        if s > best_score:
            best_type, best_score = t, s
    if real_content and best_type != "empty-shell":
        return {"is_challenge": False, "type": None,
                "confidence": best_score * 0.4,
                "details": "Suppressed: page has substantial real content"}
    if best_score < THRESHOLD:
        return {"is_challenge": False, "type": None,
                "confidence": best_score, "details": None}
    return {"is_challenge": True, "type": best_type,
            "confidence": best_score,
            "details": f"Detected as {best_type} "
                       f"(confidence {best_score:.2f})"}
