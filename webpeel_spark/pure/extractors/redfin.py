"""Redfin extractor (ee/extractors/redfin.ts:1-174 port).

The reference enriches via Redfin's internal stingray API at fetch
time; batch executors make no network calls, so every branch here is
the reference's API-failure path:

* /city/{id}/{state}/{city} (redfin.ts:16-29): the reference only
  returns from this branch when the API yields homes — with no
  network it FALLS THROUGH (no return) and, since no later pattern
  matches a /city/ path, lands on the homepage guide.  Preserved.
* /{ST}/{city}[/...] (redfin.ts:33-86): API-null → info fallback.
  NOTE this pattern also matches property paths (/{ST}/{city}/addr/
  home/{id}), so with no network the property branch (redfin.ts:90+)
  is unreachable — same as the reference; it is ported anyway to keep
  the formatting contract visible and unit-testable.
* anything else → homepage guide (redfin.ts:152-173).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from .zillow import CITY_REGION_MAP

_CITY_ID_RE = re.compile(r"^/city/(\d+)/([A-Z]{2})/([^/]+)")
_STATE_CITY_RE = re.compile(r"^/([A-Z]{2})/([^/]+)(?:/|$)")
_PROP_RE = re.compile(r"^/([A-Z]{2})/([^/]+)/(.+?)/home/(\d+)")


def redfin_extractor(html: str, url: str):
    from . import DomainExtractResult

    try:
        path = urlsplit(url).path

        # Pattern 1 (/city/{id}/...) returns only with live API homes —
        # fall through, as the reference does on API failure.

        # ── Pattern 2: /{ST}/{city} ──────────────────────────────────
        sc = _STATE_CITY_RE.match(path)
        if sc:
            state_code = sc.group(1)
            city_slug = sc.group(2)
            city_name = city_slug.replace("-", " ")
            location_label = f"{city_name}, {state_code}"
            # marketKey lookup + live fetch (redfin.ts:42-62) N/A →
            # the reference's info fallback (redfin.ts:64-86)
            _ = CITY_REGION_MAP.get(f"{state_code}-{city_slug}")

            clean_content = "\n".join([
                f"# 🏠 Redfin — {location_label}",
                "",
                f"*Redfin listing search for {location_label}*",
                "",
                "> 💡 For the best results, use a city URL with a "
                "region ID:",
                f'> `webpeel "https://www.redfin.com/city/{{id}}/'
                f'{state_code}/{city_slug}"`',
                "",
                f"**[Browse {city_name} on Redfin]({url})**",
            ])
            return DomainExtractResult(
                domain="redfin.com",
                type="real-estate-search",
                structured={"city": city_name, "state": state_code},
                clean_content=clean_content,
            )

        # ── Pattern 3: property page (unreachable with pattern 2 above,
        # as in the no-network reference; kept for the format contract) ─
        pm = _PROP_RE.match(path)
        if pm:
            state_code, city_slug, address_slug, property_id = pm.groups()
            address = address_slug.replace("-", " ")
            city = city_slug.replace("-", " ")
            return DomainExtractResult(
                domain="redfin.com",
                type="property",
                structured={"address": address, "city": city,
                            "state": state_code, "propertyId": property_id},
                clean_content=(f"# 🏠 {address}, {city}, {state_code}\n\n"
                               f"[View on Redfin]({url})"),
            )

        # ── Pattern 4: homepage / general (redfin.ts:152) ────────────
        clean_content = "\n".join([
            "# 🏠 Redfin — Real Estate Listings",
            "",
            "For live MLS listings, use a city or neighborhood URL:",
            "",
            "**City search:**",
            '- `webpeel "https://www.redfin.com/city/30749/NY/New-York"` '
            "— NYC listings",
            '- `webpeel "https://www.redfin.com/city/17184/CA/Los-Angeles"` '
            "— LA listings",
            "",
            "**State/city search:**",
            '- `webpeel "https://www.redfin.com/NY/New-York"` — NYC',
            '- `webpeel "https://www.redfin.com/CA/San-Francisco"` — SF',
            "",
            "*Redfin uses live MLS data — no bot detection blocks "
            "WebPeel.*",
        ])
        return DomainExtractResult(
            domain="redfin.com",
            type="homepage",
            structured={},
            clean_content=clean_content,
        )
    except Exception:
        return None
