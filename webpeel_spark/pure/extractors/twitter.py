"""Twitter/X extractor (ee/extractors/twitter.ts port — the stored-HTML
paths): ``__NEXT_DATA__`` SSR JSON (deepFind over tweet_results /
user_results) and the og-tag fallback.  The FxTwitter API and
syndication-timeline fetches (twitter.ts:95-250) are network extractors
— a batch engine takes the reference's own HTML fallthrough."""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

from ..metadata import js_to_iso
from .shared_util import strip_html, try_parse_json

_NEXT_DATA_RE = re.compile(
    r'<script id="__NEXT_DATA__"[^>]*>([\s\S]*?)</script>', re.I)
_OG_DESC_RE = re.compile(
    r'<meta[^>]+property="og:description"[^>]+content="([^"]+)"', re.I)
_OG_TITLE_RE = re.compile(
    r'<meta[^>]+property="og:title"[^>]+content="([^"]+)"', re.I)


def _deep_find(obj: Any, predicate, depth: int = 0):
    """BFS-ish recursive search (twitter.ts:9-17)."""
    if depth > 12 or obj is None or not isinstance(obj, (dict, list)):
        return None
    try:
        if predicate(obj):
            return obj
    except Exception:
        pass
    values = obj.values() if isinstance(obj, dict) else obj
    for val in values:
        found = _deep_find(val, predicate, depth + 1)
        if found is not None:
            return found
    return None


def _iso(created_at) -> Optional[str]:
    if not created_at:
        return None
    return js_to_iso(str(created_at))


def _parse_tweet_result(result: dict) -> Optional[Dict]:
    legacy = (result or {}).get("legacy")
    if not legacy:
        return None
    core_user = (((result.get("core") or {}).get("user_results") or {})
                 .get("result") or {})
    user_legacy = core_user.get("legacy") \
        or (((result.get("user_results") or {}).get("result") or {})
            .get("legacy")) or {}
    author = {
        "name": user_legacy.get("name", ""),
        "handle": "@" + user_legacy.get("screen_name", ""),
        "verified": (user_legacy.get("verified")
                     or core_user.get("is_blue_verified") or False),
    }
    metrics = {
        "likes": legacy.get("favorite_count", 0),
        "retweets": legacy.get("retweet_count", 0),
        "replies": legacy.get("reply_count", 0),
        "views": int((result.get("views") or {}).get("count") or 0),
    }
    media = [m["media_url_https"]
             for m in ((legacy.get("extended_entities") or {}).get("media")
                       or (legacy.get("entities") or {}).get("media") or [])
             if m.get("media_url_https")]
    quoted = None
    qsr = result.get("quoted_status_result")
    if qsr:
        q_legacy = ((qsr.get("result") or {}).get("legacy")) or None
        q_user = ((((qsr.get("result") or {}).get("core") or {})
                   .get("user_results") or {}).get("result") or {}).get("legacy") or {}
        if q_legacy:
            quoted = {"text": q_legacy.get("full_text") or q_legacy.get("text", ""),
                      "author": {"name": q_user.get("name", ""),
                                 "handle": "@" + q_user.get("screen_name", "")},
                      "timestamp": _iso(q_legacy.get("created_at"))}
    return {"author": author,
            "text": legacy.get("full_text") or legacy.get("text", ""),
            "timestamp": _iso(legacy.get("created_at")),
            "metrics": metrics, "media": media, "quotedTweet": quoted}


def twitter_extractor(html: str, url: str):
    from urllib.parse import urlsplit

    from . import DomainExtractResult

    try:
        path_parts = [p for p in urlsplit(url).path.split("/") if p]
        is_tweet = "status" in path_parts
        type_ = "tweet" if is_tweet else "profile"

        structured = None
        m = _NEXT_DATA_RE.search(html)
        if m:
            next_data = try_parse_json(m.group(1))
            if next_data:
                if is_tweet:
                    tr = _deep_find(
                        next_data,
                        lambda v: isinstance(v, dict)
                        and (((v.get("tweet_results") or {}).get("result") or {})
                             .get("legacy") or {}).get("full_text") is not None)
                    if tr:
                        structured = _parse_tweet_result(tr["tweet_results"]["result"])
                else:
                    ur = _deep_find(
                        next_data,
                        lambda v: isinstance(v, dict)
                        and (((v.get("user_results") or {}).get("result") or {})
                             .get("legacy") or {}).get("screen_name"))
                    if ur:
                        ul = ur["user_results"]["result"]["legacy"]
                        structured = {
                            "name": ul.get("name", ""),
                            "handle": "@" + ul.get("screen_name", ""),
                            "bio": ul.get("description", ""),
                            "followers": ul.get("followers_count", 0),
                            "following": ul.get("friends_count", 0),
                            "tweets": ul.get("statuses_count", 0),
                            "verified": (ur["user_results"]["result"].get("is_blue_verified")
                                         or ul.get("verified") or False),
                            "location": ul.get("location", ""),
                            "created": _iso(ul.get("created_at")),
                        }

        if structured is None and is_tweet:
            og_desc = _OG_DESC_RE.search(html)
            og_title = _OG_TITLE_RE.search(html)
            if og_desc or og_title:
                author_raw = ((og_title.group(1) if og_title else "")
                              .replace(" on X", "").replace(" on Twitter", "").strip())
                text = ""
                if og_desc:
                    text = og_desc.group(1).replace("&#39;", "'").replace("&amp;", "&")
                structured = {"author": {"name": author_raw, "handle": "",
                                         "verified": False},
                              "text": strip_html(text), "timestamp": None,
                              "metrics": {"likes": 0, "retweets": 0,
                                          "replies": 0, "views": 0},
                              "media": [], "quotedTweet": None}

        if structured is None:
            return None

        if type_ == "tweet":
            s = structured
            author_line = (f"**{s['author']['name']}** ({s['author']['handle']})"
                           if s["author"].get("handle")
                           else f"**{s['author'].get('name') or 'Unknown'}**")
            time_line = f"\n*{s['timestamp']}*" if s.get("timestamp") else ""
            met = s.get("metrics") or {}
            metrics_line = (f"\n\n💬 {met.get('replies', 0)}  🔁 {met.get('retweets', 0)}"
                            f"  ❤️ {met.get('likes', 0)}"
                            + (f"  👁 {met['views']}" if met.get("views") else ""))
            media_line = (f"\n\n📷 Media: {', '.join(s['media'])}"
                          if s.get("media") else "")
            quoted_line = ""
            if s.get("quotedTweet"):
                q = s["quotedTweet"]
                quoted_line = (f"\n\n> **Quoted tweet by "
                               f"{q['author'].get('name') or 'unknown'}:** {q['text']}")
            clean = (f"## 🐦 Tweet by {author_line}{time_line}\n\n{s['text']}"
                     f"{quoted_line}{metrics_line}{media_line}")
        else:
            s = structured
            clean = (f"## 🐦 @{(s.get('handle') or '').replace('@', '')} on X/Twitter"
                     f"\n\n**{s.get('name')}**\n{s.get('bio') or ''}\n\n"
                     f"📍 {s.get('location') or 'N/A'}  |  "
                     f"👥 {s.get('followers', 0):,} followers  |  "
                     f"Following: {s.get('following', 0):,}  |  "
                     f"Tweets: {s.get('tweets', 0):,}")

        return DomainExtractResult("twitter.com", type_, structured, clean)
    except Exception:
        return None
