"""Fast-path URL resolution for the extraction hot loop.

``urllib.parse.urljoin`` is ~8% of per-page extraction CPU (it
re-parses the base URL on every anchor).  The overwhelmingly common
case in web corpora is a root-relative href (``/path?q#f``) against an
http(s) base, where RFC 3986 reduces to ``origin + href`` with no
dot-segment removal needed — so resolve that case with one cached
origin split and fall back to ``urljoin`` for everything else.
Byte-identity with urljoin is pinned by tests/test_urlfast.py across
the tricky cases (dot segments, protocol-relative, queries, empties).
"""

from __future__ import annotations

from functools import lru_cache
from urllib.parse import urljoin, urlsplit


@lru_cache(maxsize=256)
def _origin(base_url: str) -> str | None:
    """scheme://netloc of an http(s) base, or None when the base is
    not a clean absolute http(s) URL (force the urljoin path)."""
    if not base_url.startswith(("http://", "https://")):
        return None
    try:
        parts = urlsplit(base_url)
    except ValueError:
        return None
    if not parts.netloc:
        return None
    return f"{parts.scheme}://{parts.netloc}"


def fast_urljoin(base_url: str, href: str) -> str:
    """urljoin with a fast path for root-relative refs.

    The fast path requires: href starts with exactly one ``/`` (not
    protocol-relative ``//``), contains no dot segments (``..`` or
    ``/.``) that urljoin would normalize away, no tab/CR/LF (urljoin
    strips those per WHATWG — attribute values spanning lines exist
    in real HTML), and the base is a clean absolute http(s) URL.
    Everything else falls back to urljoin — including relative-path
    refs, fragments, and malformed bases — so the result is
    byte-identical in all cases.

    Empty trailing components also force the fallback: urljoin drops
    an empty query/fragment marker (``/p?`` → ``/p``, ``/p#`` →
    ``/p``, ``/p?#f`` → ``/p#f`` — urlunsplit omits empty parts), so
    hrefs ending in ``?``/``#`` or containing ``?#`` are not
    origin-concat-safe."""
    if (href.startswith("/") and not href.startswith("//")
            and ".." not in href and "/." not in href
            and "\t" not in href and "\r" not in href
            and "\n" not in href
            and not href.endswith(("?", "#")) and "?#" not in href):
        origin = _origin(base_url)
        if origin is not None:
            return origin + href
    return urljoin(base_url, href)
