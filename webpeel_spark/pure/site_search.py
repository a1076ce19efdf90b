"""Site-aware search URL builders (site-search.ts:1-278).

Pure string templates: site id (or alias) + query → canonical search
URL, the site list, and the reverse hostname → site-id lookup.  The
reference feeds these to its live search layer; the batch face is
frontier construction (seed a crawl with per-site search pages for a
query list) and URL classification (which site a corpus url's search
page belongs to).  Reference suite (13 cases) ported in
tests/test_site_search_ref.py.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from .extractors.shared_util import encode_uri_component as _e
from .url_validator import whatwg_hostname


# site-search.ts:26-175 — (name, category, prefix[, suffix]); every
# template is prefix + encodeURIComponent(query) + suffix
SITE_TEMPLATES: Dict[str, Dict[str, str]] = {
    "ebay": {"name": "eBay", "category": "shopping",
             "prefix": "https://www.ebay.com/sch/i.html?_nkw="},
    "amazon": {"name": "Amazon", "category": "shopping",
               "prefix": "https://www.amazon.com/s?k="},
    "walmart": {"name": "Walmart", "category": "shopping",
                "prefix": "https://www.walmart.com/search?q="},
    "target": {"name": "Target", "category": "shopping",
               "prefix": "https://www.target.com/s?searchTerm="},
    "bestbuy": {"name": "Best Buy", "category": "shopping",
                "prefix": "https://www.bestbuy.com/site/searchpage.jsp?st="},
    "etsy": {"name": "Etsy", "category": "shopping",
             "prefix": "https://www.etsy.com/search?q="},
    "aliexpress": {"name": "AliExpress", "category": "shopping",
                   "prefix":
                   "https://www.aliexpress.com/wholesale?SearchText="},
    "newegg": {"name": "Newegg", "category": "shopping",
               "prefix": "https://www.newegg.com/p/pl?d="},
    "google": {"name": "Google", "category": "general",
               "prefix": "https://www.google.com/search?q="},
    "bing": {"name": "Bing", "category": "general",
             "prefix": "https://www.bing.com/search?q="},
    "duckduckgo": {"name": "DuckDuckGo", "category": "general",
                   "prefix": "https://html.duckduckgo.com/html/?q="},
    "reddit": {"name": "Reddit", "category": "social",
               "prefix": "https://www.reddit.com/search/?q="},
    "youtube": {"name": "YouTube", "category": "social",
                "prefix": "https://www.youtube.com/results?search_query="},
    "twitter": {"name": "X (Twitter)", "category": "social",
                "prefix": "https://x.com/search?q="},
    "linkedin": {"name": "LinkedIn", "category": "social",
                 "prefix":
                 "https://www.linkedin.com/search/results/all/?keywords="},
    "github": {"name": "GitHub", "category": "tech",
               "prefix": "https://github.com/search?q="},
    "stackoverflow": {"name": "Stack Overflow", "category": "tech",
                      "prefix": "https://stackoverflow.com/search?q="},
    "npm": {"name": "npm", "category": "tech",
            "prefix": "https://www.npmjs.com/search?q="},
    "pypi": {"name": "PyPI", "category": "tech",
             "prefix": "https://pypi.org/search/?q="},
    "zillow": {"name": "Zillow", "category": "real-estate",
               "prefix": "https://www.zillow.com/homes/",
               "suffix": "_rb/"},
    "realtor": {"name": "Realtor.com", "category": "real-estate",
                "prefix":
                "https://www.realtor.com/realestateandhomes-search/"},
    "indeed": {"name": "Indeed", "category": "jobs",
               "prefix": "https://www.indeed.com/jobs?q="},
    "glassdoor": {"name": "Glassdoor", "category": "jobs",
                  "prefix":
                  "https://www.glassdoor.com/Job/jobs.htm?sc.keyword="},
    "linkedin-jobs": {"name": "LinkedIn Jobs", "category": "jobs",
                      "prefix":
                      "https://www.linkedin.com/jobs/search/?keywords="},
    "yelp": {"name": "Yelp", "category": "food",
             "prefix": "https://www.yelp.com/search?find_desc="},
    "doordash": {"name": "DoorDash", "category": "food",
                 "prefix": "https://www.doordash.com/search/store/"},
    "ubereats": {"name": "Uber Eats", "category": "food",
                 "prefix": "https://www.ubereats.com/search?q="},
}

# site-search.ts:178-184
SITE_ALIASES: Dict[str, str] = {
    "x": "twitter",
    "best-buy": "bestbuy",
    "ali-express": "aliexpress",
    "stack-overflow": "stackoverflow",
    "duck-duck-go": "duckduckgo",
}

# site-search.ts:243-272
_HOSTNAME_MAP: Dict[str, str] = {
    "ebay.com": "ebay", "amazon.com": "amazon", "walmart.com": "walmart",
    "target.com": "target", "bestbuy.com": "bestbuy", "etsy.com": "etsy",
    "aliexpress.com": "aliexpress", "newegg.com": "newegg",
    "google.com": "google", "bing.com": "bing",
    "html.duckduckgo.com": "duckduckgo", "duckduckgo.com": "duckduckgo",
    "reddit.com": "reddit", "youtube.com": "youtube", "x.com": "twitter",
    "twitter.com": "twitter", "linkedin.com": "linkedin",
    "github.com": "github", "stackoverflow.com": "stackoverflow",
    "npmjs.com": "npm", "pypi.org": "pypi", "zillow.com": "zillow",
    "realtor.com": "realtor", "indeed.com": "indeed",
    "glassdoor.com": "glassdoor", "yelp.com": "yelp",
    "doordash.com": "doordash", "ubereats.com": "ubereats",
}


def resolve_site_id(site: str) -> Optional[str]:
    """site-search.ts:190-195."""
    lower = site.lower()
    if lower in SITE_TEMPLATES:
        return lower
    return SITE_ALIASES.get(lower)


def build_site_search_url(site: str, query: str) -> Dict[str, str]:
    """site-search.ts:204-220 — {url, site, query}; raises ValueError
    with the reference's message shape for unknown sites."""
    canonical = resolve_site_id(site)
    if not canonical:
        available = ", ".join(SITE_TEMPLATES)
        raise ValueError(
            f'Unknown site: "{site}". Available sites: {available}. '
            f'Run "webpeel sites" to list all supported sites.')
    t = SITE_TEMPLATES[canonical]
    url = t["prefix"] + _e(query) + t.get("suffix", "")
    return {"url": url, "site": canonical, "query": query}


def list_sites() -> List[Dict[str, str]]:
    """site-search.ts:225-231."""
    return [{"id": sid, "name": t["name"], "category": t["category"]}
            for sid, t in SITE_TEMPLATES.items()]


def find_site_by_url(url: str) -> Optional[str]:
    """site-search.ts:237-278 — reverse hostname lookup."""
    _scheme, host = whatwg_hostname(url or "")
    if not host:
        return None
    import re

    return _HOSTNAME_MAP.get(re.sub(r"^www\.", "", host))
