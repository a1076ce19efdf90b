"""Medium article extractor (ee/extractors/medium.ts:8-131 port).

JSON-LD Article/NewsArticle + data-testid selectors + article body walk
(h1-h4/p/blockquote/pre/li/figcaption → markdown-ish lines).
"""

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


def medium_extractor(html: str, url: str):
    from . import DomainExtractResult

    root = parse_html(html)

    json_ld = None
    for el in select(root, 'script[type="application/ld+json"]'):
        if json_ld is not None:
            break
        parsed = _try_json(el.text() or "")
        if isinstance(parsed, dict) and parsed.get("@type") in ("NewsArticle", "Article"):
            json_ld = parsed

    def meta(attr: str, name: str) -> str:
        el = select_first(root, f'meta[{attr}="{name}"]')
        return (el.get("content") or "") if el is not None else ""

    def sel_text(selector: str) -> str:
        el = select_first(root, selector)
        return el.text().strip() if el is not None else ""

    title = (
        (json_ld or {}).get("headline")
        or meta("property", "og:title")
        or sel_text("h1")
        or ""
    )
    if not title:
        return None

    jl_author = (json_ld or {}).get("author")
    author = (
        (jl_author.get("name") if isinstance(jl_author, dict) else None)
        or meta("name", "author")
        or sel_text('[data-testid="authorName"]')
        or sel_text('a[rel="author"]')
        or ""
    )

    publish_date = (
        (json_ld or {}).get("datePublished")
        or meta("property", "article:published_time")
        or ""
    )

    reading_time = sel_text('[data-testid="storyReadTime"]')
    if not reading_time:
        for el in select(root, "span"):
            if "min read" in el.text():
                reading_time = el.text().strip()
                break

    description = (json_ld or {}).get("description") or meta("property", "og:description") or ""

    publication = ""
    try:
        hostname = (urlsplit(url).hostname or "")
        if hostname not in ("medium.com", "www.medium.com") and hostname.endswith(".medium.com"):
            base = hostname[: -len(".medium.com")].replace("-", " ")
            publication = re.sub(r"\b\w", lambda m: m.group(0).upper(), base)
    except ValueError:
        pass
    if not publication:
        publication = (
            sel_text('[data-testid="publicationName"]')
            or sel_text('a[data-testid="publicationName"]')
            or meta("property", "article:section")
            or sel_text('a[href*="/tag/"]')
            or ""
        )

    author_bio = (
        sel_text('[data-testid="authorBio"]')
        or sel_text('p[class*="bio"]')
        or sel_text('[aria-label="authorBio"]')
        or ""
    )

    clap_count = ""
    for el in select(root, 'button[data-testid="storyClaps"], button[aria-label*="clap"]'):
        txt = el.text().strip()
        if txt and re.search(r"\d", txt):
            clap_count = txt
            break

    article_body = ""
    article_el = select_first(root, "article")
    if article_el is not None:
        for el in select(article_el, 'nav, aside, button, [data-testid="navbar"], footer, [data-testid="authorCard"]'):
            el.remove()
        parts = []
        for el in article_el.iter_elements():
            tag = el.tag
            if tag not in ("h1", "h2", "h3", "h4", "p", "blockquote", "pre", "li") and not (
                tag == "figcaption" and any(a.tag == "figure" for a in el.ancestors())
            ):
                continue
            text = el.text().strip()
            if not text or len(text) < 5:
                continue
            if tag in ("h1", "h2"):
                parts.append(f"## {text}")
            elif tag in ("h3", "h4"):
                parts.append(f"### {text}")
            elif tag == "blockquote":
                parts.append(f"> {text}")
            elif tag == "pre":
                parts.append("```\n" + text + "\n```")
            elif tag == "figcaption":
                parts.append(f"*{text}*")
            else:
                parts.append(text)
        article_body = "\n\n".join(parts)

    content_body = article_body or description

    structured = {
        "title": title, "author": author, "authorBio": author_bio,
        "publishDate": publish_date, "readingTime": reading_time,
        "description": description, "publication": publication,
        "clapCount": clap_count, "url": url,
    }

    author_line = f"\n**Author:** {author}" if author else ""
    bio_line = f"\n**Author Bio:** {author_bio}" if author_bio else ""
    date_line = f"\n**Published:** {publish_date.split('T')[0]}" if publish_date else ""
    time_line = f"\n**Reading time:** {reading_time}" if reading_time else ""
    pub_line = f"\n**Publication:** {publication}" if publication else ""
    claps_line = f"\n**Claps:** {clap_count}" if clap_count else ""

    clean_content = (
        f"# {title}{author_line}{bio_line}{date_line}{time_line}{pub_line}{claps_line}"
        f"\n\n{content_body}"
    )
    return DomainExtractResult("medium.com", "article", structured, clean_content)
