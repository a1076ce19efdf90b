"""Substack root extractor (ee/extractors/substackroot.ts:1-54 port):
static guide for the substack.com homepage (a JS-rendered marketing
page with nothing worth extracting)."""

from __future__ import annotations

_CONTENT = """# 📰 Substack

Substack's homepage is a JS-rendered marketing page — there's not much useful content to extract here.

## ✅ What Works

Individual Substack posts are **fully server-rendered** and extract cleanly. Try:

- `https://username.substack.com/p/article-title`
- Any specific newsletter post URL

## 💡 Examples

```
https://lethain.substack.com/p/the-art-of-staffing-eng
https://paulgraham.com/articles.html
```

## 📋 Finding Newsletters

Browse newsletters at:
- [substack.com/explore](https://substack.com/explore) — discover publications
- [substack.com/leaderboard](https://substack.com/leaderboard) — top newsletters by category

---

*WebPeel works best with individual Substack post URLs, not the root homepage.*"""


def substack_root_extractor(html: str, url: str):
    from . import DomainExtractResult

    structured = {
        "note": "Substack root homepage is a JS-rendered marketing page "
                "with limited extractable content.",
        "tip": "Fetch individual Substack posts directly for full article "
               "content.",
        "examples": [
            "https://username.substack.com/p/article-slug",
            "https://stratechery.com/2024/...",
        ],
    }
    return DomainExtractResult(
        domain="substack.com",
        type="homepage",
        structured=structured,
        clean_content=_CONTENT,
    )
