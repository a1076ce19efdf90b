"""Heuristic structured-data extraction — no LLM, no network.

Port of the reference's auto-extraction module
(``src/core/auto-extract.ts:1-749``): page-type detection
(pricing / products / contact / article / api_docs / unknown) plus a
per-type field extractor, all CSS-selector + regex heuristics over the
repo's own DOM engine.

Also ports the pure SPA-shell render-detection predicates from
``src/core/strategies.ts:162-251`` (``hasSpaIndicators`` /
``looksLikeShellPage`` / ``shouldEscalateForLowContent``) — in the
reference these gate fetch escalation; here they are page-level
signals a corpus pipeline can filter on (a shell page has no
extractable main content).

Results are plain dicts with a ``type`` discriminant, shaped exactly
like the reference's ``AutoExtractResult`` union (auto-extract.ts:86).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional
from urllib.parse import urlsplit

from ..dom import Node, parse_html, select, select_first

# ── regexes (auto-extract.ts:98-104) ────────────────────────────────────

_PRICE_INLINE = re.compile(r"(\$|€|£)\s*[0-9]+")  # JS \d = ASCII
_FREE_PLAN = re.compile(r"\bfree\b", re.IGNORECASE)
_HTTP_METHOD = re.compile(r"\b(GET|POST|PUT|PATCH|DELETE|HEAD|OPTIONS)\b")
_URL_PATH = re.compile(r"/(v[0-9]+/)?[a-z_-]+(/\{[^}]+\}|/?[a-z_-]*)*\b")
_EMAIL = re.compile(r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}")
_PHONE = re.compile(
    r"(\+?1[-.\s]?)?\(?[0-9]{3}\)?[-.\s]?[0-9]{3}[-.\s]?[0-9]{4}"
    r"|\+[0-9]{1,3}[-.\s]?[0-9]{2,4}[-.\s]?[0-9]{4,}")
_TAG = re.compile(r"<[^>]*>")  # strategies.ts:206 uses * — "<>" strips too
_ENTITY = re.compile(r"&[a-z#\d]+;", re.IGNORECASE)
_WS = re.compile(r"\s+")

_HTTP_METHODS = ("GET", "POST", "PUT", "PATCH", "DELETE", "HEAD", "OPTIONS")


def _body_text(root: Node) -> str:
    """Body text with spaces between elements (auto-extract.ts:107-110:
    tag-strip over body HTML, so adjacent tokens can't merge and
    over-match the email/phone regexes)."""
    body = select_first(root, "body")
    html = body.inner_html() if body is not None else root.html()
    return _WS.sub(" ", _ENTITY.sub(" ", _TAG.sub(" ", html))).strip()


def _url_has(url: str, *keywords: str) -> bool:
    """Keyword test on the URL path (auto-extract.ts:112-120); invalid
    URLs fall back to a substring test on the whole string."""
    try:
        path = urlsplit(url).path.lower()
        if not urlsplit(url).scheme:
            raise ValueError(url)
        return any(kw in path for kw in keywords)
    except ValueError:
        lower = url.lower()
        return any(kw in lower for kw in keywords)


def _origin(url: str) -> str:
    try:
        s = urlsplit(url)
        return f"{s.scheme}://{s.netloc}" if s.scheme and s.netloc else ""
    except ValueError:
        return ""


def _next_element(node: Node) -> Optional[Node]:
    """cheerio ``.next()`` — next ELEMENT sibling (text nodes skipped)."""
    p = node.parent
    if p is None:
        return None
    sibs = p.element_children()
    try:
        i = sibs.index(node)
    except ValueError:
        return None
    return sibs[i + 1] if i + 1 < len(sibs) else None


def _prev_element(node: Node) -> Optional[Node]:
    p = node.parent
    if p is None:
        return None
    sibs = p.element_children()
    try:
        i = sibs.index(node)
    except ValueError:
        return None
    return sibs[i - 1] if i > 0 else None


# ── page type detection (auto-extract.ts:126-207) ───────────────────────

def detect_page_type(html: str, url: str) -> str:
    """'pricing' | 'products' | 'contact' | 'article' | 'api_docs' |
    'unknown' — same signal order as the reference."""
    root = parse_html(html or "")

    # --- pricing ---
    if _url_has(url, "/pricing", "/plans", "/packages", "/tiers", "/billing"):
        return "pricing"
    body_text = _body_text(root)
    price_matches = _PRICE_INLINE.findall(body_text)
    per_period = re.findall(r"/(mo|month|year|yr|annual|week)", body_text,
                            re.IGNORECASE)
    if len(price_matches) >= 2 and len(per_period) >= 1:
        return "pricing"

    # --- contact ---
    if _url_has(url, "/contact", "/about", "/reach", "/connect", "/support"):
        if _EMAIL.search(body_text):
            return "contact"
    emails = _EMAIL.findall(body_text)
    phones = [m.group(0) for m in _PHONE.finditer(body_text)]
    social_links = len(select(
        root, 'a[href*="twitter.com"], a[href*="linkedin.com"], '
              'a[href*="github.com"]'))
    if emails and (phones or social_links):
        return "contact"

    # --- article ---
    has_article = bool(select(root, "article"))
    has_time = bool(select(root, "time[datetime], time[pubdate]"))
    has_author = bool(select(root, 'meta[name="author"]')) or bool(
        select(root, '[class*="author"], [itemprop="author"]'))
    if has_article or (has_time and has_author):
        return "article"
    if (len(select(root, "h1")) == 1 and len(select(root, "p")) >= 3
            and has_time):
        return "article"

    # --- api docs ---
    # NB: the reference uses non-global regexes here, so its
    # ``match().length`` thresholds (≥2 / ≥1) degenerate to a presence
    # test (a non-/g JS match array always has length 2 resp. 3 — the
    # capture groups); port as booleans (auto-extract.ts:169-182)
    code_text = "".join(n.text() for n in select(root, "code, pre"))
    has_method = bool(_HTTP_METHOD.search(code_text))
    has_path = bool(_URL_PATH.search(code_text))
    if has_method and has_path:
        return "api_docs"
    heading_text = "".join(n.text() for n in select(root, "h1, h2, h3"))
    if re.search(r"endpoint|api reference|rest api|http method",
                 heading_text, re.IGNORECASE) and has_method:
        return "api_docs"

    # --- products ---
    for sel in (".product", ".item", ".card", '[class*="product"]',
                '[class*="item"]', '[class*="card"]'):
        cards = select(root, sel)
        if len(cards) >= 3:
            with_price = sum(
                1 for el in cards
                if _PRICE_INLINE.search(el.text())
                or _FREE_PLAN.search(el.text()))
            if with_price >= 2:
                return "products"
    if len(select(root, "img")) >= 4 and len(price_matches) >= 3:
        return "products"

    return "unknown"


# ── pricing (auto-extract.ts:213-360) ───────────────────────────────────

_PRICE_VALUE = re.compile(r"(\$|€|£|free)\s*[0-9,]+(\.[0-9]+)?", re.IGNORECASE)
_PERIOD = re.compile(r"/(mo(nth)?|yr|year|week|day|annual)", re.IGNORECASE)
_CTA = re.compile(r"get started|sign up|buy|subscribe|choose|select|try"
                  r"|start|upgrade", re.IGNORECASE)

_PRICING_CONTAINERS = [
    '[class*="pricing-card"]', '[class*="price-card"]',
    '[class*="plan-card"]', '[class*="tier-card"]',
    '[class*="pricing__plan"]', '[class*="plan"]',
    '[class*="pricing-tier"]', '[class*="pricing-table"] td',
    '[class*="pricing-table"] th', ".card", '[class*="col-"]',
]

_PLAN_NAME_SELECTORS = [
    "[data-plan-name]", ".plan-name", '[class*="plan-name"]',
    '[class*="plan__name"]', '[class*="tier-name"]',
    '[class*="pricing-header"] h2', '[class*="pricing-header"] h3',
    '[class*="pricing__title"]', '[class*="price__title"]',
    '[class*="card__title"]', '[class*="card-title"]',
    "h2", "h3", "h4", '[class*="name"]', '[class*="title"]',
    "h1", "h5", "h6",
]


def _extract_pricing_plans(root: Node) -> List[Dict]:
    containers: Optional[List[Node]] = None
    for sel in _PRICING_CONTAINERS:
        found = [el for el in select(root, sel)
                 if _PRICE_INLINE.search(el.text())
                 or _FREE_PLAN.search(el.text())]
        if len(found) >= 2:
            containers = found
            break

    if not containers:
        return _parse_pricing_from_text(root)

    plans: List[Dict] = []
    for el in containers:
        text = el.text().strip()
        name = ""
        for sel in _PLAN_NAME_SELECTORS:
            cand = select_first(el, sel)
            cand_text = cand.text().strip() if cand is not None else ""
            if cand_text and cand_text.lower() != "plan":
                name = cand_text
                break
        if not name:
            name = "Plan"

        m = _PRICE_VALUE.search(text)
        if m is None and not _FREE_PLAN.search(text):
            continue  # skip non-price containers
        price = "Free" if (m is None and _FREE_PLAN.search(text)) \
            else (m.group(0) if m else "")

        pm = _PERIOD.search(text)
        period = pm.group(0) if pm else None

        features = [li.text().strip() for li in select(el, "li")
                    if li.text().strip() and len(li.text().strip()) < 200]

        cta = None
        for btn in select(el, "a, button"):
            if _CTA.search(btn.text()):
                cta = btn.text().strip() or None
                break

        if name or price:
            plans.append({"name": name, "price": price, "period": period,
                          "features": features, "cta": cta})

    # dedupe on name|price (auto-extract.ts:352-360)
    seen = set()
    out = []
    for p in plans:
        key = f"{p['name']}|{p['price']}"
        if key not in seen:
            seen.add(key)
            out.append(p)
    return out


def _parse_pricing_from_text(root: Node) -> List[Dict]:
    """Fallback: unique price tokens become plans, names from headings
    (auto-extract.ts:323-350)."""
    body_text = _body_text(root)
    price_re = re.compile(
        r"(\$|€|£)\s*(\d+(?:\.\d+)?)\s*(?:/(mo(?:nth)?|yr|year|week|annual))?",
        re.IGNORECASE)
    found = [m.group(0) for m in price_re.finditer(body_text)]
    headings = []
    for el in select(root, "h1, h2, h3, h4"):
        t = el.text().strip()
        if t and t.lower() != "plan" and len(t) < 60:
            headings.append(t)
    plans = []
    for i, p in enumerate(dict.fromkeys(found)):
        plans.append({"name": headings[i] if i < len(headings) else "Plan",
                      "price": p, "period": None, "features": [],
                      "cta": None})
    return plans


# ── products (auto-extract.ts:366-440) ──────────────────────────────────

_PRODUCT_PRICE = re.compile(r"(\$|€|£)\s*[\d,]+(\.\d+)?")
_RATING = re.compile(r"(\d(\.\d)?)\s*(/\s*5|stars?|★)", re.IGNORECASE)


def _resolve(origin: str, ref: Optional[str]) -> Optional[str]:
    if not ref:
        return None
    if ref.startswith("http"):
        return ref
    return f"{origin}{'' if ref.startswith('/') else '/'}{ref}"


def _extract_products(root: Node, base_url: str) -> List[Dict]:
    origin = _origin(base_url)
    containers: Optional[List[Node]] = None
    for sel in ('[class*="product"]', '[class*="item"]', '[class*="card"]',
                "li", "article"):
        found = [el for el in select(root, sel)
                 if (_PRICE_INLINE.search(el.text())
                     or _FREE_PLAN.search(el.text()))
                 and select_first(el, "img") is not None]
        if len(found) >= 2:
            containers = found
            break
    if not containers:
        return []

    items: List[Dict] = []
    for el in containers:
        name_el = select_first(
            el, 'h1,h2,h3,h4,h5,h6,[class*="name"],[class*="title"]')
        name = name_el.text().strip() if name_el is not None else ""
        if not name:
            continue
        m = _PRODUCT_PRICE.search(el.text())
        price = m.group(0).strip() if m else None
        img = select_first(el, "img")
        img_src = (img.get("src") or img.get("data-src")
                   or img.get("data-lazy")) if img is not None else None
        link = select_first(el, "a")
        href = link.get("href") if link is not None else None
        rm = _RATING.search(el.text())
        items.append({
            "name": name, "price": price,
            "image": _resolve(origin, img_src),
            "url": _resolve(origin, href),
            "rating": f"{rm.group(1)}/5" if rm else None,
        })
    return items[:100]


# ── contact (auto-extract.ts:446-502) ───────────────────────────────────

_SOCIAL_DOMAINS = [
    ("twitter.com", "twitter"), ("x.com", "twitter"),
    ("linkedin.com", "linkedin"), ("github.com", "github"),
    ("facebook.com", "facebook"), ("instagram.com", "instagram"),
    ("youtube.com", "youtube"), ("tiktok.com", "tiktok"),
    ("discord.gg", "discord"), ("discord.com", "discord"),
]

_ADDRESS = re.compile(
    r"\d{1,5}\s+[A-Za-z0-9\s,\.]+"
    r"(?:street|st|avenue|ave|road|rd|blvd|boulevard|lane|ln|drive|dr"
    r"|court|ct|way|wy|place|pl)\b[^<\n]{0,80}", re.IGNORECASE)


def _extract_contact(root: Node) -> Dict:
    body_text = _body_text(root)
    emails = list(dict.fromkeys(
        m.group(0).lower() for m in _EMAIL.finditer(body_text)))
    phones = list(dict.fromkeys(
        m.group(0).strip() for m in _PHONE.finditer(body_text)))

    addresses: List[str] = []
    for el in select(root, '[class*="address"], [itemprop="address"], '
                           "address"):
        addr = _WS.sub(" ", el.text()).strip()
        if len(addr) > 10:
            addresses.append(addr)
    am = _ADDRESS.search(body_text)
    if am:
        addr = am.group(0).strip()
        if not any(addr[:10] in a for a in addresses):
            addresses.append(addr)

    social: Dict[str, str] = {}
    for a in select(root, "a"):
        href = a.get("href") or ""
        if not href:
            continue
        for domain, key in _SOCIAL_DOMAINS:
            if domain in href and key not in social:
                social[key] = href

    return {"type": "contact", "emails": emails, "phones": phones,
            "addresses": addresses, "social": social}


# ── article (auto-extract.ts:508-588) ───────────────────────────────────

def _first_text(root: Node, sel: str) -> str:
    el = select_first(root, sel)
    return el.text().strip() if el is not None else ""


def _first_attr(root: Node, sel: str, attr: str) -> Optional[str]:
    el = select_first(root, sel)
    return el.get(attr) if el is not None else None


def _first_sentences(text: str, count: int) -> str:
    last = 0
    n = 0
    for m in re.finditer(r"[.!?]+\s+", text):
        last = m.end()
        n += 1
        if n >= count:
            break
    return text[:last].strip() if n > 0 else text[:300].strip()


def _estimate_reading_time(root: Node) -> str:
    el = select_first(root, 'article, main, [class*="content"], body')
    text = el.text() if el is not None else root.text()
    words = len([w for w in re.split(r"\s+", text) if w])
    minutes = max(1, -(-words // 200))   # ceil(words / 200 wpm)
    return f"{minutes} min"


def _extract_article(root: Node) -> Dict:
    title = (_first_text(root, "h1")
             or _first_attr(root, 'meta[property="og:title"]', "content")
             # $('title').text() concatenates ALL title elements,
             # SVG icon titles included (auto-extract.ts:513)
             or "".join(el.text() for el in select(root, "title")).strip()
             or None)
    author = (_first_attr(root, 'meta[name="author"]', "content")
              or _first_text(root, '[itemprop="author"]')
              or _first_text(root, '[class*="author"]')
              or _first_text(root, '[rel="author"]') or None)
    date = (_first_attr(root, "time[datetime]", "datetime")
            or _first_attr(root, "time[pubdate]", "datetime")
            or _first_attr(root, 'meta[name="date"]', "content")
            or _first_attr(root, 'meta[property="article:published_time"]',
                           "content")
            or _first_text(root, "time") or None)

    rt_el = select_first(root, '[class*="reading-time"], '
                               '[class*="read-time"], [class*="readtime"]')
    reading_time = rt_el.text().strip() if rt_el is not None \
        else _estimate_reading_time(root)

    content_el = select_first(root, "article") or select_first(root, "main")
    first_para = (
        (_first_text(content_el, "p") if content_el is not None else "")
        or _first_attr(root, 'meta[name="description"]', "content")
        or _first_attr(root, 'meta[property="og:description"]', "content")
        or "")
    summary = _first_sentences(first_para, 2) if first_para else None

    sections: List[Dict] = []
    headings = select(content_el, "h2, h3") if content_el is not None else []
    for h in headings:
        heading = h.text().strip()
        if not heading:
            continue
        parts: List[str] = []
        sib = _next_element(h)
        while sib is not None and sib.tag not in ("h2", "h3"):
            t = sib.text().strip()
            if t:
                parts.append(t)
            sib = _next_element(sib)
        if parts:
            sections.append({"heading": heading, "content": " ".join(parts)})

    return {"type": "article", "title": title, "author": author,
            "date": date, "readingTime": reading_time, "summary": summary,
            "sections": sections}


# ── api docs (auto-extract.ts:596-694) ──────────────────────────────────

def _find_nearest_heading(el: Node) -> Optional[str]:
    """Walk backwards ≤5 steps through prev siblings (climbing to the
    parent's prev when siblings run out — the reference re-anchors on
    ``$el.parent()`` each time, auto-extract.ts:677-694)."""
    current = _prev_element(el)
    depth = 0
    while depth < 5:
        if current is None:
            parent = el.parent
            if parent is None:
                break
            current = _prev_element(parent)
        elif current.tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            return current.text().strip()
        else:
            current = _prev_element(current)
        depth += 1
    return None


def _extract_api_docs(root: Node, url: str) -> Dict:
    page_text = _body_text(root)
    m = re.search(r"https?://api\.[a-zA-Z0-9.-]+", page_text)
    if m:
        base_url: Optional[str] = m.group(0)
    else:
        try:
            s = urlsplit(url)
            base_url = f"{s.scheme}://api.{s.hostname}" \
                if s.scheme and s.hostname else None
        except ValueError:
            base_url = None

    endpoints: List[Dict] = []

    # strategy 1: HTTP method + path lines inside code blocks
    for el in select(root, "code, pre"):
        for line in el.text().strip().split("\n"):
            trimmed = line.strip()
            for method in _HTTP_METHODS:
                if trimmed.startswith(method + " ") \
                        or trimmed.startswith(method + "\t"):
                    rest = trimmed[len(method):].strip()
                    pm = re.match(r"(https?://\S+|/\S*)", rest)
                    if pm:
                        path = pm.group(0)
                        if base_url and path.startswith(base_url):
                            path = path[len(base_url):]
                        path = path.split("?")[0]
                        endpoints.append({
                            "method": method, "path": path,
                            "description": _find_nearest_heading(el),
                            "params": None,
                        })

    # strategy 2: method badges + adjacent path elements
    for el in select(root, '[class*="method"], [class*="http-method"], '
                           ".badge, .label"):
        method_text = el.text().strip().upper()
        if method_text not in _HTTP_METHODS:
            continue
        nxt = _next_element(el)
        candidates = []
        if nxt is not None and any(
                _matches_any(nxt, s) for s in
                ('[class*="path"]', '[class*="endpoint"]',
                 '[class*="route"]', "code")):
            candidates.append(nxt)
        parent_code = select_first(el.parent, "code") \
            if el.parent is not None else None
        if parent_code is not None:
            candidates.append(parent_code)
        for cand in candidates:
            path = cand.text().strip()
            if _URL_PATH.search(path):
                endpoints.append({"method": method_text, "path": path,
                                  "description": None, "params": None})
                break

    seen = set()
    unique = []
    for ep in endpoints:
        key = f"{ep['method']}:{ep['path']}"
        if key not in seen:
            seen.add(key)
            unique.append(ep)
    return {"type": "api_docs", "baseUrl": base_url, "endpoints": unique}


def _matches_any(node: Node, selector: str) -> bool:
    from ..dom import matches
    return matches(node, selector)


# ── SPA / shell detection (strategies.ts:162-251) ───────────────────────

_EMPTY_ROOTS = (
    '<div id="root"></div>', '<div id="root"> </div>',
    '<div id="app"></div>', '<div id="app"> </div>',
    '<div id="__next"></div>', '<div id="__next"> </div>',
    '<div id="___gatsby"></div>', '<div id="gatsby-focus-wrapper"></div>',
)
_NOSCRIPT_SIGNALS = (
    "enable javascript", "javascript is required",
    "javascript must be enabled", "requires javascript",
    "javascript to run this app", "you need to enable javascript",
)
_SCRIPT_BLOCK = re.compile(r"<script[\s\S]*?</script>", re.IGNORECASE)
_STYLE_BLOCK = re.compile(r"<style[\s\S]*?</style>", re.IGNORECASE)
_NOSCRIPT_BLOCK = re.compile(r"<noscript[\s\S]*?</noscript>", re.IGNORECASE)


def has_spa_indicators(html: str) -> bool:
    """True when the HTML is a JS-rendered SPA shell (empty root mount
    point, enable-JS noscript, or script-heavy with no visible text) —
    strategies.ts:162-216."""
    if any(p in html for p in _EMPTY_ROOTS):
        return True
    nm = re.search(r"<noscript[^>]*>([\s\S]*?)</noscript>", html,
                   re.IGNORECASE)
    if nm:
        content = nm.group(1).lower()
        if any(s in content for s in _NOSCRIPT_SIGNALS):
            return True
    if len(re.findall(r"<script", html, re.IGNORECASE)) >= 5:
        stripped = _NOSCRIPT_BLOCK.sub(
            "", _STYLE_BLOCK.sub("", _SCRIPT_BLOCK.sub("", html)))
        stripped = _WS.sub(" ", _TAG.sub("", stripped)).strip()
        if len(stripped) < 150:
            return True
    return False


def looks_like_shell_page(html: str, content_type: str = "text/html") -> bool:
    """Big HTML payload, <500 chars of visible text
    (strategies.ts:227-232)."""
    if "html" not in (content_type or "").lower():
        return False
    text = _TAG.sub("", html).strip()
    return len(text) < 500 and len(html) > 1000


def should_escalate_for_low_content(html: str,
                                    content_type: str = "text/html") -> bool:
    """>1500-char HTML with <200 chars visible after stripping
    script/style/noscript (strategies.ts:239-251)."""
    if "html" not in (content_type or "").lower():
        return False
    if len(html) <= 1500:
        return False
    stripped = _NOSCRIPT_BLOCK.sub(
        "", _STYLE_BLOCK.sub("", _SCRIPT_BLOCK.sub("", html)))
    visible = _WS.sub(" ", _TAG.sub("", stripped)).strip()
    return len(visible) < 200


# ── entry point (auto-extract.ts:708-749) ───────────────────────────────

_EMPTY_RESULTS = {
    "pricing": {"type": "pricing", "plans": []},
    "products": {"type": "products", "items": []},
    "contact": {"type": "contact", "emails": [], "phones": [],
                "addresses": [], "social": {}},
    "article": {"type": "article", "title": None, "author": None,
                "date": None, "readingTime": None, "summary": None,
                "sections": []},
    "api_docs": {"type": "api_docs", "baseUrl": None, "endpoints": []},
    "unknown": {"type": "unknown"},
}


def auto_extract(html: str, url: str) -> Dict:
    """Detect the page type and extract its structured fields.
    Never raises — parse failures return the empty shape for the
    detected type (auto-extract.ts:732-748)."""
    page_type = detect_page_type(html, url)
    try:
        root = parse_html(html or "")
        if page_type == "pricing":
            return {"type": "pricing",
                    "plans": _extract_pricing_plans(root)}
        if page_type == "products":
            return {"type": "products",
                    "items": _extract_products(root, url)}
        if page_type == "contact":
            return _extract_contact(root)
        if page_type == "article":
            return _extract_article(root)
        if page_type == "api_docs":
            return _extract_api_docs(root, url)
        return {"type": "unknown"}
    except Exception:
        # DEEP copy: the shallow dict() shared the nested lists/dicts
        # module-wide, so a caller mutation polluted every later
        # error-path result in the long-lived executor process
        import copy
        return copy.deepcopy(_EMPTY_RESULTS.get(page_type,
                                                {"type": "unknown"}))
