"""News article extractor — NYTimes / BBC / CNN (ee/extractors/news.ts port).

Schema.org JSON-LD first, HTML fallbacks for author/date/section/
keywords, then a selector-chain body walk emitting markdown-ish lines.
The reference's CNN-Lite network fetches (news.ts:118-174) are network
extractors — a batch engine falls through to the standard article
extraction on the stored HTML, which is exactly the reference's own
fallback (news.ts:178).
"""

from __future__ import annotations

import json
from typing import Optional

from ...dom import parse_html, select, select_first


def _try_json(raw: str):
    try:
        return json.loads(raw)
    except Exception:
        return None


_CONTENT_SELECTORS = [
    "article", '[data-testid="article-body"]', ".article-body", "#article-body",
    ".story-body", ".article__body", ".entry-content", ".post-content",
    "main article", ".content-body", '[itemprop="articleBody"]',
]


def extract_news_article(html: str, url: str, domain: str):
    from . import DomainExtractResult

    try:
        root = parse_html(html)

        json_ld = None
        for el in select(root, 'script[type="application/ld+json"]'):
            if json_ld is not None:
                break
            parsed = _try_json(el.text() or "")
            candidates = parsed if isinstance(parsed, list) else [parsed]
            for item in candidates:
                if not isinstance(item, dict):
                    continue
                if item.get("@type") in ("NewsArticle", "Article", "WebPage"):
                    json_ld = item
                    break
                graph = item.get("@graph")
                if isinstance(graph, list):
                    g = next((n for n in graph if isinstance(n, dict)
                              and n.get("@type") in ("NewsArticle", "Article")), None)
                    if g:
                        json_ld = g
                        break

        def meta(attr: str, name: str) -> str:
            el = select_first(root, f'meta[{attr}="{name}"]')
            return (el.get("content") or "") if el is not None else ""

        def sel_text(selector: str) -> str:
            el = select_first(root, selector)
            return el.text().strip() if el is not None else ""

        jl = json_ld or {}
        og_title = meta("property", "og:title")
        title = jl.get("headline") or og_title or sel_text("h1") or ""
        if not title:
            return None

        author = ""
        if jl.get("author"):
            a = jl["author"][0] if isinstance(jl["author"], list) else jl["author"]
            author = a if isinstance(a, str) else (a or {}).get("name", "") or ""
        if not author:
            author = (meta("name", "author")
                      or sel_text('[itemprop="author"] [itemprop="name"]')
                      or sel_text('[data-testid="byline"]')
                      or sel_text('[class*="author"]') or "")

        publish_date = (jl.get("datePublished")
                        or meta("property", "article:published_time") or "")
        if not publish_date:
            t = select_first(root, "time[datetime]")
            publish_date = (t.get("datetime") or "") if t is not None else ""
        modified_date = (jl.get("dateModified")
                         or meta("property", "article:modified_time") or "")

        description = (jl.get("description") or meta("property", "og:description")
                       or meta("name", "description") or "")
        section = (jl.get("articleSection")
                   or meta("property", "article:section") or "")

        if jl.get("keywords"):
            kws = jl["keywords"]
            kws = kws if isinstance(kws, list) else str(kws).split(",")
            keywords = [k.strip() for k in kws if k and k.strip()]
        else:
            kw_meta = meta("name", "keywords")
            keywords = [k.strip() for k in kw_meta.split(",") if k.strip()] if kw_meta else []

        article_body = ""
        for selector in _CONTENT_SELECTORS:
            el = select_first(root, selector)
            if el is None:
                continue
            for junk in select(el, 'script, style, nav, aside, .ad, '
                                   '[class*="ad-"], button, figure figcaption'):
                junk.remove()
            parts = []
            for node in select(el, "h1, h2, h3, h4, p, blockquote, ul, ol"):
                tag = node.tag
                text = node.text().strip()
                if not text or len(text) < 5:
                    continue
                if tag == "h1":
                    continue  # already have title
                if tag == "h2":
                    parts.append(f"## {text}")
                elif tag in ("h3", "h4"):
                    parts.append(f"### {text}")
                elif tag == "blockquote":
                    parts.append(f"> {text}")
                else:
                    parts.append(text)
            article_body = "\n\n".join(parts)
            if len(article_body) > 200:
                break

        content_body = article_body or description

        structured = {
            "title": title, "author": author, "publishDate": publish_date,
            "modifiedDate": modified_date, "description": description,
            "section": section, "keywords": keywords, "url": url,
            "domain": domain,
        }

        author_line = f"\n**Author:** {author}" if author else ""
        date_line = (f"\n**Published:** {publish_date.split('T')[0]}"
                     if publish_date else "")
        section_line = f"\n**Section:** {section}" if section else ""
        tags_line = (f"\n**Topics:** {', '.join(keywords[:8])}"
                     if keywords else "")

        clean = (f"# {title}{author_line}{date_line}{section_line}{tags_line}"
                 f"\n\n{content_body[:10000]}")
        return DomainExtractResult(domain, "article", structured, clean)
    except Exception:
        return None


def nytimes_extractor(html: str, url: str):
    return extract_news_article(html, url, "nytimes.com")


def bbc_extractor(html: str, url: str):
    return extract_news_article(html, url, "bbc.com")


def cnn_extractor(html: str, url: str):
    # CNN-Lite fetch path is network-only; standard extraction on the
    # stored HTML is the reference's own fallback (news.ts:178)
    return extract_news_article(html, url, "cnn.com")
