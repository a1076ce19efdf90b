"""Domain-specific extractors — host-keyed rule registry.

Port of the class-(a) extractors from /root/reference/src/ee/extractors/
(pure functions of (html, url) — parse the *given* HTML).  Class-(b)
extractors in the reference call site APIs at fetch time (hackernews,
reddit, github, …); a batch engine over stored pages cannot make network
calls from executors, so those hosts fall through to the generic
readability pipeline — exactly what the reference does when an API
extractor returns null (pipeline.ts:571-576, extractors/index.ts:266).

Dispatch semantics preserved from extractors/index.ts:66-160,237-267:
ordered first-match on hostname / URL pattern; results with
``clean_content`` ≤ 20 chars rejected; extractor exceptions → None →
generic path.
"""

from __future__ import annotations

import re
from typing import Callable, List, NamedTuple, Optional, Tuple
from urllib.parse import urlsplit


class DomainExtractResult(NamedTuple):
    domain: str
    type: str
    structured: dict
    clean_content: str


from .allrecipes import allrecipes_extractor
from .carscom import carscom_extractor
from .amazon import amazon_extractor
from .craigslist import craigslist_extractor
from .ebay import ebay_extractor
from .etsy import etsy_extractor
from .facebook import facebook_marketplace_extractor
from .google_flights import google_flights_extractor
from .imdb import imdb_extractor
from .kayak_cars import kayak_car_rental_extractor
from .linkedin import linkedin_extractor
from .medium import medium_extractor
from .news import bbc_extractor, cnn_extractor, nytimes_extractor
from .pdfurl import pdf_url_extractor
from .redfin import redfin_extractor
from .sportsbetting import sports_betting_extractor
from .substack import substack_extractor
from .substackroot import substack_root_extractor
from .twitter import twitter_extractor
from .wikipedia import wikipedia_extractor
from .zillow import zillow_extractor

Extractor = Callable[[str, str], Optional[DomainExtractResult]]

# Hosts handled by network/API extractors in the reference — documented
# fallthrough to the generic pipeline here (no executor-side network).
NETWORK_ONLY_HOSTS = frozenset((
    "twitter.com", "x.com", "reddit.com", "old.reddit.com", "github.com",
    "news.ycombinator.com", "youtube.com", "youtu.be", "arxiv.org",
    "stackoverflow.com", "npmjs.com", "bestbuy.com", "walmart.com",
    "pypi.org", "dev.to", "open.spotify.com", "tiktok.com", "pinterest.com",
    "twitch.tv", "soundcloud.com", "instagram.com", "producthunt.com",
    "polymarket.com", "kalshi.com", "tradingview.com", "espn.com",
    "semanticscholar.org", "pubmed.ncbi.nlm.nih.gov", "coingecko.com",
    "weather.com", "accuweather.com", "yelp.com",
))


def _host_is(h: str, *names: str) -> bool:
    return any(h == n or h == "www." + n for n in names)


_PDF_URL_RE = re.compile(r"\.pdf(\?|$|#)", re.I)
_PDF_PATH_RE = re.compile(r"/pdf/", re.I)

# (match(host, url) -> bool, extractor) — registry order mirrors
# extractors/index.ts:66-134; network-only entries omitted (fallthrough).
REGISTRY: List[Tuple[Callable[[str, str], bool], Extractor]] = [
    (lambda h, u: _host_is(h, "twitter.com", "x.com") or h == "mobile.twitter.com",
     twitter_extractor),
    (lambda h, u: bool(re.match(r"\w+\.wikipedia\.org$", h)) or h == "www.wikipedia.org",
     wikipedia_extractor),
    (lambda h, u: _host_is(h, "amazon.com"), amazon_extractor),
    (lambda h, u: _host_is(h, "medium.com") or h.endswith(".medium.com"),
     medium_extractor),
    # registry order mirrors extractors/index.ts:83-96
    (lambda h, u: h.endswith(".substack.com"), substack_extractor),
    (lambda h, u: _host_is(h, "allrecipes.com"), allrecipes_extractor),
    (lambda h, u: _host_is(h, "imdb.com"), imdb_extractor),
    (lambda h, u: _host_is(h, "linkedin.com"), linkedin_extractor),
    (lambda h, u: _host_is(h, "craigslist.org") or h.endswith(".craigslist.org"),
     craigslist_extractor),
    (lambda h, u: _host_is(h, "nytimes.com"), nytimes_extractor),
    (lambda h, u: _host_is(h, "bbc.com", "bbc.co.uk"), bbc_extractor),
    (lambda h, u: _host_is(h, "cnn.com"), cnn_extractor),
    # bare substack.com only — www.substack.com is shadowed by the
    # endswith('.substack.com') entry above, as in index.ts:113
    (lambda h, u: _host_is(h, "substack.com"), substack_root_extractor),
    (lambda h, u: bool(_PDF_URL_RE.search(u)) or bool(_PDF_PATH_RE.search(u)),
     pdf_url_extractor),
    # entries below the pdf rule mirror index.ts:118-134 — a .pdf URL on
    # these hosts routes to the pdf extractor first
    (lambda h, u: _host_is(h, "draftkings.com") or h == "sportsbook.draftkings.com",
     sports_betting_extractor),
    (lambda h, u: _host_is(h, "fanduel.com") or h == "sportsbook.fanduel.com",
     sports_betting_extractor),
    (lambda h, u: _host_is(h, "betmgm.com"), sports_betting_extractor),
    (lambda h, u: _host_is(h, "facebook.com"), facebook_marketplace_extractor),
    (lambda h, u: _host_is(h, "etsy.com"), etsy_extractor),
    (lambda h, u: _host_is(h, "cars.com"), carscom_extractor),
    (lambda h, u: _host_is(h, "ebay.com"), ebay_extractor),
    (lambda h, u: _host_is(h, "zillow.com"), zillow_extractor),
    (lambda h, u: _host_is(h, "redfin.com"), redfin_extractor),
    (lambda h, u: _host_is(h, "google.com") and "/travel/flights" in u,
     google_flights_extractor),
    (lambda h, u: _host_is(h, "kayak.com") and "/cars/" in u,
     kayak_car_rental_extractor),
]


def get_domain_extractor(url: str) -> Optional[Extractor]:
    try:
        host = (urlsplit(url).hostname or "").lower()
    except ValueError:
        return None
    if not host:
        return None
    for match, extractor in REGISTRY:
        try:
            if match(host, url):
                return extractor
        except Exception:
            continue
    return None


def extract_domain_data(html: str, url: str) -> Optional[DomainExtractResult]:
    """First-match dispatch; <20-char results rejected (index.ts:255)."""
    extractor = get_domain_extractor(url)
    if extractor is None:
        return None
    try:
        result = extractor(html, url)
    except Exception:
        return None
    if result is not None and len(result.clean_content) > 20:
        return result
    return result if result is None else None
