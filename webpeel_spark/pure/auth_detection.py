"""Auth-wall detection (port of auth-detection.ts).

Pure string/regex confidence scoring — flags at ≥ 0.5; login-path URLs
and content-rich pages are never flagged.  The pipeline consults it
only when extracted content is sparse (pipeline.ts:1196-1218).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional
from urllib.parse import urlsplit

THRESHOLD = 0.5

_TITLE_RE = re.compile(r"<title[^>]*>([^<]*)</title>", re.I)
_PASSWORD_RE = re.compile(r"<input[^>]*type\s*=\s*[\"']password[\"'][^>]*>", re.I)
_FORM_RE = re.compile(r"<form[^>]*>", re.I)
_SUBMIT_RE = re.compile(r"<button[^>]*>|<input[^>]*type\s*=\s*[\"']submit[\"'][^>]*>", re.I)
_URL_AUTH_RE = re.compile(
    r"/(login|log-in|signin|sign-in|auth|authenticate|signup|sign-up|register|registration)(/|$|\?|#)")

_JS_REDIRECTS = [
    re.compile(r"window\.location\s*[=.]\s*[\"'][^\"']*/(login|signin|auth|signup|register)", re.I),
    re.compile(r"location\.href\s*=\s*[\"'][^\"']*/(login|signin|auth|signup|register)", re.I),
    re.compile(r"location\.replace\s*\(\s*[\"'][^\"']*/(login|signin|auth|signup|register)", re.I),
]

_AUTH_TITLES = ["log in", "login", "sign in", "signin", "sign up", "signup",
                "register", "authenticate", "authentication",
                "create account", "create an account", "access denied",
                "unauthorized"]

_AUTH_CLASSES = ["login-wall", "auth-wall", "signin-gate", "login-gate",
                 "access-gate", "content-gate", "paywall", "sign-in-gate",
                 "registration-wall", "auth-gate", "login-modal",
                 "signin-modal", "auth-modal", "auth-overlay", "login-overlay"]

_OAUTH_SIGNALS = ["sign in with google", "login with google",
                  "continue with google", "sign in with github",
                  "login with github", "sign in with facebook",
                  "login with facebook", "sign in with apple",
                  "continue with apple", "sign in with twitter",
                  "sign in with microsoft", "/auth/google", "/auth/github",
                  "/auth/facebook", "/oauth/google", "/oauth/github"]

_AUTH_PHRASES = ["sign in to continue", "log in to continue",
                 "login to continue", "sign in to view", "log in to view",
                 "please sign in", "please log in", "please login",
                 "create an account to", "create account to",
                 "you must be logged in", "you need to log in",
                 "you need to sign in", "members only", "subscribers only",
                 "login required", "sign in required",
                 "authentication required"]

_STATUS_KEYWORDS = ["log in", "login", "sign in", "signin", "authenticate",
                    "unauthorized", "forbidden", "access denied",
                    "please log", "please sign"]


def _count(haystack: str, needles: List[str]) -> int:
    return sum(1 for n in needles if n in haystack)


def estimate_visible_text_length(html: str) -> int:
    s = re.sub(r"<script[\s\S]*?</script>", "", html, flags=re.I)
    s = re.sub(r"<style[\s\S]*?</style>", "", s, flags=re.I)
    s = re.sub(r"<noscript[\s\S]*?</noscript>", "", s, flags=re.I)
    s = re.sub(r"<[^>]*>", "", s)
    s = re.sub(r"\s+", " ", s).strip()
    return len(s)


def _url_is_auth_page(url: str) -> bool:
    try:
        p = (urlsplit(url).path or "").lower()
    except ValueError:
        return False
    return bool(_URL_AUTH_RE.search(p)) or p in (
        "/login", "/signin", "/sign-in", "/auth", "/authenticate",
        "/signup", "/sign-up", "/register", "/registration")


def detect_auth_wall(html: str, url: str,
                     status_code: Optional[int] = None) -> Dict:
    """auth-detection.ts:300-395 — multi-signal auth-wall classifier."""
    if not html:
        return {"is_auth_wall": False, "confidence": 0.0}
    if _url_is_auth_page(url):
        return {"is_auth_wall": False, "confidence": 0.0,
                "details": "URL is a login/auth page"}
    visible = estimate_visible_text_length(html)
    if visible > 2000:
        return {"is_auth_wall": False, "confidence": 0.0,
                "details": "Page has substantial real content"}

    lower = html.lower()

    # login form (HIGH)
    login_form = 0.0
    if _PASSWORD_RE.search(html) and _FORM_RE.search(html):
        login_form = 0.40 if visible < 300 else 0.25 if visible < 800 else 0.10

    # status code (HIGH)
    status = 0.0
    if status_code in (401, 403):
        matches = _count(lower, _STATUS_KEYWORDS)
        if status_code == 401:
            status = 0.45 if matches > 0 else 0.35
        else:
            status = 0.30 if matches >= 2 else 0.15 if matches == 1 else 0.0

    m = _TITLE_RE.search(html)
    title = m.group(1).lower().strip() if m else ""
    title_score = 0.20 if any(t in title for t in _AUTH_TITLES) else 0.0

    css_matches = _count(lower, _AUTH_CLASSES)
    css = 0.25 if css_matches >= 2 else 0.20 if css_matches == 1 else 0.0

    oauth_matches = _count(lower, _OAUTH_SIGNALS)
    oauth = (0.25 if oauth_matches >= 3 else 0.20 if oauth_matches >= 2
             else 0.15 if oauth_matches == 1 else 0.0)

    short_form = 0.0
    if (len(html) < 5000 and _PASSWORD_RE.search(html)
            and _FORM_RE.search(html) and _SUBMIT_RE.search(html)):
        short_form = 0.20

    js_redirect = 0.0
    if re.search(r"<script", html, re.I):
        if any(p.search(html) for p in _JS_REDIRECTS):
            js_redirect = 0.20

    meta_score = 0.0
    for mm in re.finditer(r"<meta[^>]*content\s*=\s*[\"']([^\"']*)[\"'][^>]*>", html, re.I):
        c = mm.group(1).lower()
        if any(k in c for k in ("log in", "sign in", "login", "signin", "authenticate")):
            meta_score = 0.15
            break

    phrase_matches = _count(lower, _AUTH_PHRASES)
    phrases = (0.15 if phrase_matches >= 3 else 0.12 if phrase_matches >= 2
               else 0.08 if phrase_matches == 1 else 0.0)

    noscript = 0.0
    ns = re.findall(r"<noscript[^>]*>[\s\S]*?</noscript>", html, flags=re.I)
    if ns and any(k in " ".join(ns).lower()
                  for k in ("login", "sign in", "authenticate")):
        noscript = 0.08

    social_sparse = 0.0
    if _count(lower, ["google", "github", "facebook", "apple", "microsoft",
                      "twitter"]) >= 2 and visible < 200:
        social_sparse = 0.10

    confidence = min(1.0, login_form + status + title_score + css + oauth
                     + short_form + js_redirect + meta_score + phrases
                     + noscript + social_sparse)
    if confidence < THRESHOLD:
        return {"is_auth_wall": False, "confidence": confidence}

    if status > 0.25:
        wall_type = "generic"
    elif login_form >= 0.25:
        wall_type = "login-form"
    elif oauth >= 0.20:
        wall_type = "oauth-redirect"
    elif css > 0 and (css >= 0.25 or (css >= 0.20 and phrases > 0)):
        wall_type = "generic"
    elif phrases >= 0.12:
        wall_type = "signup-required"
    else:
        wall_type = "generic"

    return {"is_auth_wall": True, "confidence": confidence,
            "type": wall_type}
