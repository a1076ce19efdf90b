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


# ── WHATWG-flavored join+normalize for link/image extraction ─────────────
#
# The reference absolutizes every href with `new URL(href, base).href`
# (metadata.ts extractLinks / extractImages, links.ts), which applies
# WHATWG normalization RFC-3986 urljoin does not: backslashes act as
# slashes in special URLs, the host lowercases (and IDNA-encodes), the
# default port drops, an empty path becomes '/', dot segments collapse
# even in already-absolute hrefs, and disallowed code points (space,
# quotes, angle brackets, non-ASCII, ...) percent-encode as UTF-8.
# whatwg_urljoin covers those rules for http(s) URLs; existing %xx
# escapes pass through untouched, exactly like the URL parser.

_WS_CTRL = "".join(chr(c) for c in range(0x21)) + "\x7f"

_PATH_EXTRA = ' "<>`{}'
_QUERY_EXTRA = ' "<>\''
_FRAG_EXTRA = ' "<>`'


def _encode_set(s: str, extra: str) -> str:
    if all(0x20 < ord(ch) < 0x7f and ch not in extra for ch in s):
        return s
    out = []
    for ch in s:
        o = ord(ch)
        if o <= 0x20 or o == 0x7f or o > 0x7e or ch in extra:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
        else:
            out.append(ch)
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    if "." not in path:
        return path
    out = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # trailing '/.' or '/..' keeps a trailing slash
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    return "/".join(out)


def _ascii_host(host: str) -> str:
    host = host.lower()
    if all(ord(c) < 0x80 for c in host):
        return host
    try:
        return host.encode("idna").decode("ascii")
    except UnicodeError:
        return host


def whatwg_urljoin(base_url: str, href: str, require_http: bool = True):
    """``new URL(href, base).href`` for http(s) results, else None.

    None covers both the reference's throw path (invalid host) and its
    non-http(s) filter — callers drop the link either way.  With
    ``require_http=False`` (the link-pairs path, whose reference loop
    keeps any scheme), a non-http(s) join falls back to the plain
    RFC-3986 result instead of None — an approximation documented on
    the caller; http(s) results normalize identically."""
    # WHATWG trims C0/space from both ends and strips tab/LF/CR inside
    href = href.strip(_WS_CTRL).replace("\t", "").replace("\n", "").replace("\r", "")
    # backslashes act as path separators in special URLs, up to the
    # query/fragment
    cut = len(href)
    for d in "?#":
        i = href.find(d)
        if i != -1:
            cut = min(cut, i)
    if "\\" in href[:cut]:
        href = href[:cut].replace("\\", "/") + href[cut:]
    try:
        joined = urljoin(base_url, href)
        parts = urlsplit(joined)
    except ValueError:
        return None
    if parts.scheme not in ("http", "https"):
        return None if require_http else joined
    if not parts.hostname:
        return None
    try:
        host = _ascii_host(parts.hostname)
        port = parts.port  # raises ValueError on junk ports
    except ValueError:
        return None
    netloc = host
    if port is not None and str(port) != {"http": "80", "https": "443"}[parts.scheme]:
        netloc += f":{port}"
    path = _encode_set(_remove_dot_segments(parts.path), _PATH_EXTRA) or "/"
    out = f"{parts.scheme}://{netloc}{path}"
    if parts.query or joined.rstrip("#").endswith("?"):
        out += "?" + _encode_set(parts.query, _QUERY_EXTRA)
    if parts.fragment or joined.endswith("#"):
        out += "#" + _encode_set(parts.fragment, _FRAG_EXTRA)
    return out
