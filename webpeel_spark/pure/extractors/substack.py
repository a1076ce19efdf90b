"""Substack post extractor (ee/extractors/substack.ts port).

The reference re-fetches open.substack.com share links
(substack.ts:20-36) — network-only; here those URLs extract from the
stored HTML directly (the reference's own fallthrough when the fetch
fails).  Paywall detection: no article body but a description present.
"""

from __future__ import annotations

import json
from urllib.parse import urlsplit

from ...dom import parse_html, select, select_first


def _try_json(raw: str):
    try:
        return json.loads(raw)
    except Exception:
        return None


def substack_extractor(html: str, url: str):
    from . import DomainExtractResult

    try:
        root = parse_html(html)

        json_ld = None
        for el in select(root, 'script[type="application/ld+json"]'):
            if json_ld is not None:
                break
            parsed = _try_json(el.text() or "")
            if isinstance(parsed, dict) and parsed.get("@type") in ("NewsArticle", "Article"):
                json_ld = parsed
        jl = json_ld or {}

        def meta(attr: str, name: str) -> str:
            el = select_first(root, f'meta[{attr}="{name}"]')
            return (el.get("content") or "") if el is not None else ""

        def sel_text(selector: str) -> str:
            el = select_first(root, selector)
            return el.text().strip() if el is not None else ""

        title = (jl.get("headline") or meta("property", "og:title")
                 or sel_text("h1.post-title") or sel_text("h1") or "")
        if not title:
            return None

        author = ""
        if isinstance(jl.get("author"), dict):
            author = jl["author"].get("name", "") or ""
        if not author:
            author = (meta("name", "author") or sel_text("a.author-name")
                      or sel_text('[class*="author"]') or "")

        publish_date = (jl.get("datePublished")
                        or meta("property", "article:published_time") or "")
        if not publish_date:
            t = select_first(root, "time")
            publish_date = (t.get("datetime") or "") if t is not None else ""

        publication = (meta("property", "og:site_name")
                       or sel_text("a.navbar-title-link")
                       or (urlsplit(url).hostname or "").replace(".substack.com", ""))

        description = (jl.get("description")
                       or meta("property", "og:description") or "")

        article_body = ""
        post_content = select_first(
            root, '.body.markup, .post-content, article, '
                  '[class*="post-content"], .available-content')
        if post_content is not None:
            for junk in select(post_content, "script, style, nav, .paywall, "
                                             ".subscribe-widget, .subscription-widget"):
                junk.remove()
            parts = []
            for el in select(post_content, "h1, h2, h3, h4, p, blockquote, pre, li"):
                tag = el.tag
                text = el.text().strip()
                if not text or len(text) < 3:
                    continue
                if tag in ("h1", "h2"):
                    parts.append(f"## {text}")
                elif tag in ("h3", "h4"):
                    parts.append(f"### {text}")
                elif tag == "blockquote":
                    parts.append(f"> {text}")
                elif tag == "pre":
                    parts.append("```\n" + text + "\n```")
                else:
                    parts.append(text)
            article_body = "\n\n".join(parts)

        if not article_body:
            parts = []
            for el in select(root, 'main p, article p, [class*="content"] p'):
                text = el.text().strip()
                if text and len(text) > 20:
                    parts.append(text)
            article_body = "\n\n".join(parts[:20])

        content_body = article_body or description
        is_paywalled = not article_body and len(description) > 0
        paywall_note = (
            "\n\n---\n*⚠️ This post appears to be behind a paywall. Only the "
            "preview/description is available. Full content requires a "
            "subscription.*" if is_paywalled else "")

        structured = {"title": title, "author": author,
                      "publication": publication, "publishDate": publish_date,
                      "description": description, "paywalled": is_paywalled,
                      "url": url}

        author_line = f"\n**Author:** {author}" if author else ""
        pub_line = f"\n**Publication:** {publication}" if publication else ""
        date_line = (f"\n**Published:** {publish_date.split('T')[0]}"
                     if publish_date else "")

        clean = (f"# {title}{author_line}{pub_line}{date_line}\n\n"
                 f"{content_body[:8000]}{paywall_note}")
        return DomainExtractResult("substack.com", "post", structured, clean)
    except Exception:
        return None
