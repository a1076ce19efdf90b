"""Business-intelligence content analyzers (business-intel.ts:31-231).

The reference's `getBusinessIntel` fetches a homepage (+ /pricing) and
runs these pure analyzers over the content; the fetch shell is N/A
here (the input table holds the page bytes), the analyzers port 1:1:
tech-stack fingerprints, social links, pricing-plan proximity pairs,
keyword industry vote, and schema.org/OG company facts.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Optional

from .jsonld import _js_parse_float

TECH_PATTERNS = [
    ("React", r"react(?:\.min)?\.js|__reactFiber|react-dom", "script"),
    ("Vue.js", r"vue(?:\.min)?\.js|Vue\.component|__vue_", "script"),
    ("Angular", r"angular(?:\.min)?\.js|ng-version|ng-app", "script"),
    ("Next.js", r"__NEXT_DATA__|next/dist/|_next/static", "script"),
    ("Nuxt.js", r"__NUXT__|_nuxt/|nuxtjs\.org", "script"),
    ("Svelte", r"svelte/internal|SvelteComponent", "script"),
    ("Shopify", r"shopify\.com|Shopify\.theme|cdn\.shopify", "script"),
    ("WordPress", r"wp-content/|wp-includes/|WordPress", "script"),
    ("Webflow", r"webflow\.com|Webflow\.require", "script"),
    ("Squarespace", r"squarespace\.com|SQUARESPACE_ROLLUPS", "script"),
    ("Wix", r"wix\.com|wixstatic\.com", "script"),
    ("Google Analytics", r"google-analytics\.com|gtag\(|ga\('send", "script"),
    ("Segment", r"segment\.com|analytics\.identify", "script"),
    ("Mixpanel", r"mixpanel\.com|mixpanel\.track", "script"),
    ("Intercom", r"intercom\.io|window\.Intercom", "script"),
    ("Hubspot", r"hubspot\.com|hs-scripts\.com", "script"),
    ("Stripe", r"js\.stripe\.com|Stripe\(", "script"),
    ("Vercel", r"vercel", "header"),
    ("Netlify", r"netlify", "header"),
    ("Cloudflare", r"cloudflare", "header"),
    ("AWS", r"amazonaws\.com|x-amz-", "header"),
    ("Nginx", r"nginx", "header"),
    ("Apache", r"apache", "header"),
]

SOCIAL_PATTERNS = [
    ("Twitter/X", r"(?:twitter\.com|x\.com)/([^/\"?\s]+)"),
    ("LinkedIn", r"linkedin\.com/(?:company|in)/([^/\"?\s]+)"),
    ("Facebook", r"facebook\.com/([^/\"?\s]+)"),
    ("Instagram", r"instagram\.com/([^/\"?\s]+)"),
    ("YouTube", r"youtube\.com/(?:channel|c|@)/([^/\"?\s]+)"),
    ("GitHub", r"github\.com/([^/\"?\s]+)"),
    ("Discord", r"discord\.(?:gg|com/invite)/([^/\"?\s]+)"),
    ("TikTok", r"tiktok\.com/@([^/\"?\s]+)"),
]

INDUSTRY_KEYWORDS = {
    "SaaS / Software": ["software", "saas", "platform", "api", "developer",
                        "cloud", "app"],
    "E-commerce": ["shop", "store", "buy", "cart", "checkout", "product",
                   "shipping"],
    "Finance / Fintech": ["payment", "invoice", "banking", "crypto",
                          "invest", "finance", "loan"],
    "Healthcare": ["health", "medical", "patient", "clinic", "doctor",
                   "hospital", "pharma"],
    "Education": ["course", "learn", "training", "education", "school",
                  "university", "tutor"],
    "Marketing": ["marketing", "seo", "email campaign", "crm", "lead",
                  "analytics"],
    "AI / Machine Learning": ["ai", "machine learning", "nlp", "model",
                              "inference", "llm"],
    "Food & Restaurant": ["restaurant", "food", "menu", "delivery",
                          "catering", "dining"],
    "Travel": ["travel", "hotel", "flight", "booking", "tourism",
               "vacation"],
    "Real Estate": ["real estate", "property", "mortgage", "rent",
                    "apartment", "lease"],
    "Media / Content": ["news", "blog", "podcast", "video", "streaming",
                        "media", "content"],
}

_PLAN_RE = re.compile(
    r"\b(free|starter|basic|pro|professional|business|enterprise|premium"
    r"|growth|scale|team|individual|personal)\b", re.I)
_PRICE_RE = re.compile(r"\$([\d,]+(?:\.\d{2})?)")
_JSONLD_RE = re.compile(
    r'<script[^>]*type="application/ld\+json"[^>]*>([\s\S]*?)</script>',
    re.I)
_SCRIPT_TAG_RE = re.compile(r"<script[^>]*>|</script>", re.I)
_OG_TITLE_RE = re.compile(r'property="og:title"\s+content="([^"]+)"')
_OG_DESC_RE = re.compile(
    r'(?:property="og:description"|name="description")\s+content="([^"]+)"')


def extract_pricing(content: str) -> List[Dict[str, str]]:
    """business-intel.ts:96 — plan name + nearby price, 8-plan cap."""
    plans: List[Dict[str, str]] = []
    seen = set()
    lines = content.split("\n")
    for i, line in enumerate(lines):
        plan_match = _PLAN_RE.search(line)
        if not plan_match:
            continue
        context = " ".join(lines[max(0, i - 1):min(len(lines), i + 5)])
        price_match = _PRICE_RE.search(context)
        if price_match:
            key = f"{plan_match.group(1).lower()}:{price_match.group(0)}"
            if key not in seen:
                seen.add(key)
                plans.append({"plan": plan_match.group(1),
                              "price": price_match.group(0)})
        elif re.search(r"\bfree\b", plan_match.group(1), re.I):
            key = f"{plan_match.group(1).lower()}:$0"
            if key not in seen:
                seen.add(key)
                plans.append({"plan": plan_match.group(1), "price": "$0"})
    return plans[:8]


def detect_tech_stack(content: str,
                      headers: Optional[Dict[str, str]] = None) -> List[str]:
    """business-intel.ts:128 — sorted detected names."""
    detected = set()
    header_string = "\n".join(
        f"{k}: {v}" for k, v in (headers or {}).items()).lower()
    for name, pattern, kind in TECH_PATTERNS:
        target = header_string if kind == "header" else content
        if re.search(pattern, target, re.I):
            detected.add(name)
    return sorted(detected)


def extract_social_media(content: str) -> List[Dict[str, str]]:
    """business-intel.ts:149 — first non-share link per platform."""
    found: List[Dict[str, str]] = []
    seen = set()
    for platform, pattern in SOCIAL_PATTERNS:
        for m in re.finditer(pattern, content, re.I):
            full = m.group(0)
            if "share" in full or "intent" in full or full in seen:
                continue
            seen.add(full)
            url = full if full.startswith("http") else "https://" + full
            found.append({"platform": platform, "url": url})
            break
    return found


def detect_industry(text: str) -> Optional[str]:
    """business-intel.ts:171 — keyword containment vote; ties keep
    declaration order (JS stable sort)."""
    lower = text.lower()
    best_industry, best_score = None, 0
    for industry, keywords in INDUSTRY_KEYWORDS.items():
        score = sum(1 for kw in keywords if kw in lower)
        if score > best_score:
            best_industry, best_score = industry, score
    return best_industry


def _num_str(v) -> str:
    """String form parseFloat/parseInt see (numbers print bare)."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


_INT_PREFIX_RE = re.compile(r"\s*([+-]?[0-9]+)")


def _js_parse_int_prefix(s: str):
    m = _INT_PREFIX_RE.match(s)
    return int(m.group(1)) if m else None


def extract_schema_org_data(content: str) -> Dict[str, Any]:
    """business-intel.ts:186 — JSON-LD company facts, OG fallback."""
    result: Dict[str, Any] = {}
    for m in _JSONLD_RE.finditer(content):
        block = m.group(0)
        try:
            parsed = json.loads(_SCRIPT_TAG_RE.sub("", block))
        except (json.JSONDecodeError, TypeError):
            continue
        items = parsed if isinstance(parsed, list) else [parsed]
        for item in items:
            if not isinstance(item, dict):
                continue
            if not result.get("name") and item.get("name"):
                result["name"] = item["name"]
            if not result.get("description") and item.get("description"):
                result["description"] = item["description"]
            if not result.get("founded") and item.get("foundingDate"):
                result["founded"] = str(item["foundingDate"])
            if not result.get("employees") and item.get("numberOfEmployees"):
                emp = item["numberOfEmployees"]
                if isinstance(emp, dict):
                    # `emp.minValue ?? ''` also catches explicit null
                    # (business-intel.ts:202) — dict.get's default only
                    # fires on a MISSING key
                    lo = emp.get("minValue")
                    hi = emp.get("maxValue")
                    result["employees"] = (
                        f"{'' if lo is None else lo}–"
                        f"{'' if hi is None else hi}")
                else:
                    result["employees"] = str(emp)
            if item.get("aggregateRating"):
                # truthiness gate + parseFloat/parseInt prefix
                # semantics with || 0 (business-intel.ts:205-211):
                # '4.5 out of 5' → 4.5, '1,234' → 1, 3.9 count → 3
                agg = item["aggregateRating"]
                rv = agg.get("ratingValue") if isinstance(agg, dict) else None
                rc = agg.get("reviewCount") if isinstance(agg, dict) else None
                rating = _js_parse_float(_num_str(rv)) or 0.0
                pi = _js_parse_int_prefix(_num_str(rc))
                count = pi if pi is not None else 0
                result.setdefault("reviews", []).append(
                    {"source": "Schema.org", "rating": rating,
                     "count": count})
    if not result.get("name"):
        og = _OG_TITLE_RE.search(content)
        if og:
            result["name"] = og.group(1)
    if not result.get("description"):
        og = _OG_DESC_RE.search(content)
        if og:
            result["description"] = og.group(1)
    return result


def business_intel(content: str, text: Optional[str] = None,
                   headers: Optional[Dict[str, str]] = None
                   ) -> Dict[str, Any]:
    """All analyzers over one page (the getBusinessIntel compute core —
    ``content`` is the raw HTML, ``text`` the extracted readable text
    used for industry detection; reference uses both the same way)."""
    intel: Dict[str, Any] = extract_schema_org_data(content)
    intel["tech_stack"] = detect_tech_stack(content, headers)
    # extractSocialMedia(homeHtml + homeContent) — BOTH surfaces
    # (business-intel.ts:271)
    intel["social_media"] = extract_social_media(
        content + (text or ""))
    intel["pricing"] = extract_pricing(text if text is not None else content)
    # industry text = [schemaData.description, homeContent]
    # .filter(Boolean).join(' ') (business-intel.ts:275): the schema/OG
    # description participates in the keyword vote
    industry_text = " ".join(
        p for p in (intel.get("description"),
                    text if text is not None else content) if p)
    industry = detect_industry(industry_text)
    if industry:
        intel["industry"] = industry
    return intel
