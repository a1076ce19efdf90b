"""LinkedIn extractor (ee/extractors/linkedin.ts port): page-type from
URL, Person/Organization JSON-LD + og: meta chains, authwall-aware.
The reference's direct-HTTPS refetch (linkedin.ts:58-100) is a network
path; stored HTML takes the reference's own fallthrough."""

from __future__ import annotations

import json
import re
from urllib.parse import urlsplit

from ...dom import parse_html, select, select_first


def _try_json(raw: str):
    try:
        return json.loads(raw)
    except Exception:
        return None


def linkedin_extractor(html: str, url: str):
    from . import DomainExtractResult

    try:
        root = parse_html(html)
        path_parts = [p for p in urlsplit(url).path.split("/") if p]
        first = path_parts[0] if path_parts else ""
        page_type = ("company" if first == "company"
                     else "profile" if first == "in"
                     else "job" if first == "jobs" else "page")

        is_authwall = ("authwall" in html or "Join LinkedIn" in html
                       or ("Sign in" in html and "linkedin.com/in/" not in html))

        json_ld = None
        for el in select(root, 'script[type="application/ld+json"]'):
            if json_ld is not None:
                break
            parsed = _try_json(el.text() or "")
            if isinstance(parsed, dict) and parsed.get("@type") in ("Person", "Organization"):
                json_ld = parsed
        jl = json_ld or {}

        def meta(attr, name_):
            el = select_first(root, f'meta[{attr}="{name_}"]')
            return (el.get("content") or "") if el is not None else ""

        og_title = meta("property", "og:title")
        og_description = meta("property", "og:description")
        og_image = meta("property", "og:image")
        meta_description = meta("name", "description")

        name = (jl.get("name")
                or re.sub(r"Sign Up \| LinkedIn$", "",
                          re.sub(r" \| LinkedIn$", "", og_title)).strip() or "")
        if is_authwall:
            headline = jl.get("jobTitle") or ""
            description = jl.get("description") or ""
        else:
            headline = (jl.get("jobTitle")
                        or (meta_description.split("|")[0].strip()
                            if meta_description else "")
                        or og_description or "")
            description = jl.get("description") or og_description or ""
        loc_el = select_first(root, '[class*="location"]')
        location = ((loc_el.text().strip() if loc_el is not None else "")
                    or (jl.get("address") or {}).get("addressLocality", "")
                    if isinstance(jl.get("address"), dict)
                    else (loc_el.text().strip() if loc_el is not None else ""))

        if not name:
            return None

        structured = {"name": name, "headline": headline,
                      "description": description, "location": location,
                      "pageType": page_type, "image": og_image, "url": url}

        type_icon = ("🏢" if page_type == "company"
                     else "👤" if page_type == "profile" else "🔗")
        headline_line = f"\n*{headline}*" if headline and headline != name else ""
        location_line = f"\n📍 {location}" if location else ""
        description_line = f"\n\n{description}" if description else ""
        auth_note = ("\n\n⚠️ Full LinkedIn profiles require authentication. "
                     "Use /v1/session to log in first.")

        clean = (f"# {type_icon} {name} — LinkedIn{headline_line}"
                 f"{location_line}{description_line}{auth_note}")
        return DomainExtractResult("linkedin.com", page_type, structured, clean)
    except Exception:
        return None
