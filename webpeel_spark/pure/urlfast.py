"""WHATWG URL join + normalize for link/image extraction.

The reference absolutizes every href with ``new URL(href, base).href``
(metadata.ts extractLinks / extractImages, links.ts:41), so the WHATWG
URL parser's byte behavior IS the spec for link output.  RFC-3986
``urllib.parse.urljoin`` diverges from it in ways that break
byte-parity on real pages:

- urlparse treats ``;`` in the last path segment as a params separator
  and *drops an empty marker* (``/x;`` → ``/x``); WHATWG keeps ``;``
  as a plain path code point.
- urljoin drops empty ``?`` / ``#`` markers (``/p?`` → ``/p``); WHATWG
  serializes a non-null empty query/fragment (``/p?`` stays ``/p?``).
- WHATWG lowercases + IDNA-encodes the host, drops default ports,
  normalizes IPv4-ish hosts (``0x7f.1`` → ``127.0.0.1``) and IPv6
  brackets, percent-decodes the host, treats ``\\`` as ``/`` in
  special URLs, collapses dot segments (including ``%2e``) even in
  absolute hrefs, and percent-encodes disallowed code points per
  component encode set.

``whatwg_urljoin`` implements that join/serialize pipeline directly
(no ``urljoin`` in the http(s) path, so none of the above leaks in).
Parity is pinned by ``tests/golden/whatwg_urljoin_node.json`` — 5.5k
recorded outputs of Node v20's ``new URL`` (curated edge table plus a
seeded fuzz corpus, regenerable via tools/gen_whatwg_url_fixture.mjs).

Known, documented divergences from Node (outside the pinned corpus):
- IDNA runs UTS#46 non-transitional via the ``idna`` package's
  ``uts46_remap`` + per-label punycode (Node's algorithm; round 9 —
  the stdlib IDNA2003 codec mapped ``faß``→``fass`` where Node emits
  ``xn--fa-hia``), but CheckBidi/CheckJoiners are skipped (RTL/ZWJ
  label margins), and without the package it falls back to IDNA2003.
- Invalid percent-bytes in a host decode with U+FFFD then fail IDNA
  (→ None), where Node's exact failure set differs at the margin.
- ``require_http=False`` margins: relative refs against a NON-SPECIAL
  base (mailto:) and ``//``-authority non-special hrefs use the RFC
  fallback — unreachable in production, where the base is always the
  page's http(s) URL.  Absolute non-special hrefs (mailto:, tel:,
  data:) serialize WHATWG-exact (opaque-path C0 encode, dot-segment
  removal for path-absolute, empty-marker preservation); ftp/ws/wss
  are full special-scheme citizens (round 9).
"""

from __future__ import annotations

import ipaddress
import re
from functools import lru_cache
from typing import Optional, Tuple
from urllib.parse import unquote, urljoin

__all__ = ["whatwg_urljoin"]

# WHATWG special schemes minus file (whose host/path semantics differ;
# file hrefs fall to the documented RFC fallback).  ftp/ws/wss join and
# serialize exactly like http — authority, default-port drop, dot
# segments, empty-marker preservation — and real pages do carry ftp
# links, so the require_http=False path keeps them byte-exact.
_SPECIAL = ("http", "https", "ftp", "ws", "wss")
_DEFAULT_PORT = {"http": 80, "https": 443, "ftp": 21, "ws": 80, "wss": 443}

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+\-.]*:")

# C0 controls + space (WHATWG trims these from both ends of input)
_WS_CTRL = "".join(chr(c) for c in range(0x21)) + "\x7f"

# component percent-encode sets (chars beyond controls/space/non-ASCII)
_PATH_EXTRA = ' "<>`{}'
_QUERY_EXTRA = " \"<>'"  # special-query set (http/https add the quote)
_FRAG_EXTRA = ' "<>`'
_USERINFO_EXTRA = ' "<>`{}?#/:;=@[\\]^|'

# forbidden domain code points (post-percent-decode, pre-IDNA);
# C0/DEL/space are handled by the ord checks in _host_ascii
_FORBIDDEN_HOST = set('#/:<>?@[\\]^|%')


# per-encode-set "needs encoding?" scanners: one C-level regex scan
# replaces the Python per-char genexpr on the (overwhelmingly common)
# nothing-to-encode path
_NEEDS_ENC = {
    extra: re.compile("[\\x00-\\x20\\x7f-\\U0010ffff"
                      + re.escape(extra) + "]")
    for extra in (' "<>`{}', " \"<>'", ' "<>`', ' "<>`{}?#/:;=@[\\]^|')
}


def _encode_set(s: str, extra: str) -> str:
    scanner = _NEEDS_ENC.get(extra)
    if scanner is not None:
        if not scanner.search(s):
            return s
    elif all(0x20 < ord(ch) < 0x7F and ch not in extra for ch in s):
        return s
    out = []
    for ch in s:
        o = ord(ch)
        if o <= 0x20 or o == 0x7F or o > 0x7E or ch in extra:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
        else:
            out.append(ch)
    return "".join(out)


def _clean_input(s: str) -> str:
    """WHATWG input preprocessing: trim C0/space from both ends, strip
    tab/LF/CR everywhere."""
    s = s.strip(_WS_CTRL)
    if "\t" in s or "\n" in s or "\r" in s:
        s = s.replace("\t", "").replace("\n", "").replace("\r", "")
    return s


def _backslash_fix(s: str) -> str:
    """``\\`` acts as ``/`` in special URLs, up to the query/fragment
    (inside query/fragment it stays a literal code point)."""
    cut = len(s)
    for d in "?#":
        i = s.find(d)
        if i != -1 and i < cut:
            cut = i
    if "\\" in s[:cut]:
        s = s[:cut].replace("\\", "/") + s[cut:]
    return s


def _split_ref(s: str) -> Tuple[str, str, bool, str, bool]:
    """(path_part, query, has_query_marker, fragment, has_frag_marker).

    Marker booleans record the *presence* of ``?`` / ``#`` in the
    input — WHATWG serializes a non-null empty query/fragment, which
    component values alone can't represent."""
    fi = s.find("#")
    if fi != -1:
        frag, has_f, rest = s[fi + 1:], True, s[:fi]
    else:
        frag, has_f, rest = "", False, s
    qi = rest.find("?")
    if qi != -1:
        return rest[:qi], rest[qi + 1:], True, frag, has_f
    return rest, "", False, frag, has_f


class _UrlError(ValueError):
    """Mirror of the WHATWG parser's failure (Node's throw path)."""


# ── host parsing ──────────────────────────────────────────────────────────

def _ipv4_number(part: str) -> int:
    if not part:
        raise _UrlError("empty ipv4 part")
    radix = 10
    if len(part) >= 2 and part[:2] in ("0x", "0X"):
        part, radix = part[2:], 16
        if not part:
            return 0
    elif len(part) >= 2 and part[0] == "0":
        part, radix = part[1:], 8
    try:
        return int(part, radix)
    except ValueError:
        raise _UrlError("bad ipv4 number") from None


def _ends_in_number(host: str) -> bool:
    parts = host.split(".")
    if parts and parts[-1] == "":
        parts = parts[:-1]
    if not parts or not parts[-1]:
        return False
    last = parts[-1]
    if last.isascii() and last.isdigit():
        return True
    if re.fullmatch(r"0[xX][0-9a-fA-F]*", last):
        return True
    return False


def _ipv4_parse(host: str) -> str:
    parts = host.split(".")
    if parts and parts[-1] == "":
        parts = parts[:-1]
    if not parts or len(parts) > 4:
        raise _UrlError("bad ipv4")
    nums = [_ipv4_number(p) for p in parts]
    if any(n > 255 for n in nums[:-1]):
        raise _UrlError("ipv4 part > 255")
    if nums[-1] >= 256 ** (5 - len(nums)):
        raise _UrlError("ipv4 out of range")
    ipv4 = nums[-1]
    for i, n in enumerate(nums[:-1]):
        ipv4 += n * 256 ** (3 - i)
    return ".".join(str((ipv4 >> (8 * s)) & 0xFF) for s in (3, 2, 1, 0))


def _ipv6_serialize(packed: bytes) -> str:
    """WHATWG IPv6 serializer: pure hex groups (never the dotted
    IPv4-mapped form Python's ``compressed`` emits), longest zero run
    (>1) compressed, first run on ties."""
    groups = [int.from_bytes(packed[i:i + 2], "big") for i in range(0, 16, 2)]
    best_start, best_len, cur_start, cur_len = -1, 0, -1, 0
    for i, g in enumerate(groups + [-1]):
        if g == 0:
            if cur_start == -1:
                cur_start, cur_len = i, 1
            else:
                cur_len += 1
        else:
            if cur_len > best_len:
                best_start, best_len = cur_start, cur_len
            cur_start, cur_len = -1, 0
    if best_len <= 1:
        return ":".join(f"{g:x}" for g in groups)
    head = ":".join(f"{g:x}" for g in groups[:best_start])
    tail = ":".join(f"{g:x}" for g in groups[best_start + best_len:])
    return f"{head}::{tail}"


def _host_ascii(host: str) -> str:
    """WHATWG host parser for special schemes → serialized host.

    Raises _UrlError on anything Node's parser throws on (empty host,
    forbidden code points, bad IPv4/IPv6/port shapes, IDNA failure)."""
    if not host:
        raise _UrlError("empty host")
    if host.startswith("["):
        if not host.endswith("]"):
            raise _UrlError("unclosed ipv6")
        try:
            addr = ipaddress.IPv6Address(host[1:-1])
        except ValueError:
            raise _UrlError("bad ipv6") from None
        return "[" + _ipv6_serialize(addr.packed) + "]"
    dec = unquote(host, errors="replace")
    if not dec:
        raise _UrlError("empty host")
    for ch in dec:
        o = ord(ch)
        if o <= 0x20 or o == 0x7F or ch in _FORBIDDEN_HOST:
            raise _UrlError("forbidden host code point")
    if dec.isascii() and "xn--" not in dec.lower():
        ascii_host = dec.lower()
    else:
        ascii_host = _domain_to_ascii(dec)
    if _ends_in_number(ascii_host):
        return _ipv4_parse(ascii_host)
    return ascii_host


def _domain_to_ascii(dec: str) -> str:
    """WHATWG domain-to-ASCII with beStrict=false — UTS#46
    non-transitional mapping (Node's behavior), NOT the stdlib "idna"
    codec (IDNA2003: maps ``faß``→``fass`` where Node emits
    ``xn--fa-hia``) and NOT ``idna.encode`` (IDNA2008 protocol checks:
    rejects ``☃``/``ab--cd``/underscores that Node accepts because
    UseSTD3ASCIIRules/CheckHyphens/VerifyDnsLength are all off).
    Per-label: UTS#46 remap, then punycode decode-validate-reencode
    for ``xn--`` labels (invalid punycode throws, like Node) and plain
    punycode encode for non-ASCII labels.  Known margin: CheckBidi/
    CheckJoiners are skipped (RTL/ZWJ label edge cases)."""
    try:
        import idna as _idna
    except ImportError:
        # fallback: stdlib IDNA2003 (documented divergence on mapped
        # code points); ASCII input passes through lowercased
        if dec.isascii():
            return dec.lower()
        try:
            return dec.encode("idna").decode("ascii")
        except UnicodeError:
            raise _UrlError("idna failure") from None
    try:
        mapped = _idna.uts46_remap(dec, std3_rules=False,
                                   transitional=False)
    except _idna.IDNAError:
        raise _UrlError("idna failure") from None
    out = []
    for label in mapped.split("."):
        if label.startswith("xn--"):
            # decode-validate-reencode, keeping the xn-- form (Node:
            # 'xn--abc-' stays 'xn--abc-', never bare 'abc').  Python's
            # punycode decoder is lenient where Node's throws
            # ('a' → U+0080), so validity comes from the decoded label:
            # non-empty, UTS#46-valid, and already in mapped form.
            try:
                uni = label[4:].encode("ascii").decode("punycode")
            except (UnicodeError, OverflowError):
                raise _UrlError("bad punycode") from None
            if not uni:
                raise _UrlError("bad punycode")
            try:
                remapped = _idna.uts46_remap(uni, std3_rules=False,
                                             transitional=False)
            except _idna.IDNAError:
                raise _UrlError("bad punycode") from None
            if remapped != uni:
                raise _UrlError("bad punycode")
            out.append("xn--" + uni.encode("punycode").decode("ascii"))
        elif label.isascii():
            out.append(label)
        else:
            out.append("xn--" + label.encode("punycode").decode("ascii"))
    return ".".join(out)


def _parse_authority(auth: str) -> Tuple[str, str, Optional[int]]:
    """authority string → (serialized_userinfo ('' or 'u:p@'), host,
    port or None).  Raises _UrlError like Node's throw."""
    at = auth.rfind("@")
    userinfo = ""
    if at != -1:
        ui, hostport = auth[:at], auth[at + 1:]
        ci = ui.find(":")
        if ci == -1:
            user, pw = ui, ""
        else:
            user, pw = ui[:ci], ui[ci + 1:]
        user = _encode_set(user, _USERINFO_EXTRA)
        pw = _encode_set(pw, _USERINFO_EXTRA)
        if user or pw:
            userinfo = user + (":" + pw if pw else "") + "@"
    else:
        hostport = auth
    if hostport.startswith("["):
        close = hostport.find("]")
        if close == -1:
            raise _UrlError("unclosed ipv6")
        host_str = hostport[:close + 1]
        rest = hostport[close + 1:]
        if rest and not rest.startswith(":"):
            raise _UrlError("junk after ipv6")
        port_str = rest[1:] if rest else ""
    else:
        ci = hostport.find(":")
        if ci == -1:
            host_str, port_str = hostport, ""
        else:
            host_str, port_str = hostport[:ci], hostport[ci + 1:]
    host = _host_ascii(host_str)
    if not port_str:
        return userinfo, host, None
    if not (port_str.isascii() and port_str.isdigit()):
        raise _UrlError("bad port")
    port = int(port_str)
    if port > 65535:
        raise _UrlError("port out of range")
    return userinfo, host, port


# ── path handling ─────────────────────────────────────────────────────────

def _is_dot(seg: str) -> bool:
    return seg == "." or seg.lower() == "%2e"


def _is_dotdot(seg: str) -> bool:
    if len(seg) > 6:
        return False
    s = seg.lower().replace("%2e", ".")
    return s == ".."


def _remove_dot_segments(path: str) -> str:
    if "." not in path and "%2e" not in path.lower():
        return path
    segs = path.split("/")
    out = []
    for seg in segs:
        if _is_dot(seg):
            continue
        if _is_dotdot(seg):
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # a trailing dot segment always closes with a slash (WHATWG path
    # state appends an empty segment after a '.'/'..' at EOF — even
    # when the previous segment is already empty)
    if _is_dot(segs[-1]) or _is_dotdot(segs[-1]):
        out.append("")
    return "/".join(out)


def _merge_paths(base_path: str, ref_path: str) -> str:
    # base paths are normalized to start with '/' at parse time
    return base_path[:base_path.rfind("/") + 1] + ref_path


# ── base parsing (cached: one base serves every href on a page) ──────────

@lru_cache(maxsize=256)
@lru_cache(maxsize=512)
def _parse_base(base_url: str):
    """→ None (invalid base: Node throws before looking at the href),
    or ('nonspecial', scheme) for a valid non-http(s) base, or a
    ('special', scheme, userinfo, host, port, path, query, has_query)
    tuple for an http(s) base with authority already validated.

    lru_cached: every href on a page joins against the SAME base, so
    the link/image loops re-parse it ~30× per page otherwise (the
    result tuples are immutable)."""
    s = _backslash_fix(_clean_input(base_url))
    m = _SCHEME_RE.match(s)
    if not m:
        return None
    scheme = m.group(0)[:-1].lower()
    if scheme not in _SPECIAL:
        return ("nonspecial", scheme)
    rest = s[m.end():].lstrip("/")
    auth_end = len(rest)
    for d in "/?#":
        i = rest.find(d)
        if i != -1 and i < auth_end:
            auth_end = i
    try:
        userinfo, host, port = _parse_authority(rest[:auth_end])
    except _UrlError:
        return None
    path, query, has_q, _frag, _has_f = _split_ref(rest[auth_end:])
    path = _remove_dot_segments(path) or "/"
    if not path.startswith("/"):
        path = "/" + path
    return ("special", scheme, userinfo, host, port, path, query, has_q)


def _serialize(scheme: str, userinfo: str, host: str, port,
               path: str, query: str, has_q: bool,
               frag: str, has_f: bool) -> str:
    netloc = userinfo + host
    if port is not None and port != _DEFAULT_PORT[scheme]:
        netloc += f":{port}"
    path = _encode_set(_remove_dot_segments(path), _PATH_EXTRA) or "/"
    out = f"{scheme}://{netloc}{path}"
    if has_q:
        out += "?" + _encode_set(query, _QUERY_EXTRA)
    if has_f:
        out += "#" + _encode_set(frag, _FRAG_EXTRA)
    return out


def _fallback(base_url: str, href: str):
    """require_http=False path for non-special results: plain RFC-3986
    join — a documented approximation (the link-pairs caller keeps any
    scheme; special-scheme results never reach here)."""
    try:
        return urljoin(base_url, href)
    except ValueError:
        return None


def _encode_c0(s: str) -> str:
    """C0-control percent-encode set (opaque paths): C0 controls, DEL
    and non-ASCII — space and other printables stay raw."""
    if s.isascii() and all(0x1F < ord(ch) < 0x7F for ch in s):
        return s
    out = []
    for ch in s:
        o = ord(ch)
        if o <= 0x1F or o >= 0x7F:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
        else:
            out.append(ch)
    return "".join(out)


# non-special query encode set (no apostrophe, unlike http/https)
_NS_QUERY_EXTRA = ' "<>'


def _serialize_nonspecial(scheme: str, rest: str):
    """Absolute non-special href (mailto:, tel:, data:, …) →
    ``new URL(href).href``: opaque path C0-encoded (spaces raw),
    path-absolute refs get dot-segment removal, query/fragment keep
    empty markers and use their encode sets.  ``//``-authority forms
    return None to signal the caller's RFC fallback (opaque-host
    parsing margin)."""
    if rest.startswith("//"):
        return None
    path, query, has_q, frag, has_f = _split_ref(rest)
    if path.startswith("/"):
        path = _remove_dot_segments(path)
    out = scheme + ":" + _encode_c0(path)
    if has_q:
        out += "?" + _encode_set(query, _NS_QUERY_EXTRA)
    if has_f:
        out += "#" + _encode_set(frag, _FRAG_EXTRA)
    return out


def whatwg_urljoin(base_url: str, href: str, require_http: bool = True):
    """``new URL(href, base).href`` for http(s) results, else None.

    None covers both the reference's throw path (invalid base or host
    — Node parses the base FIRST, so an invalid base drops absolute
    hrefs too) and its non-http(s) filter.  With ``require_http=False``
    (the link-pairs path, whose reference loop keeps any scheme), a
    non-http(s) target falls back to the plain RFC-3986 result instead
    of None — an approximation documented on the caller; http(s)
    results serialize identically either way."""
    href = _clean_input(href)
    m = _SCHEME_RE.match(href)
    if m:
        scheme: Optional[str] = m.group(0)[:-1].lower()
        rest = href[m.end():]
    else:
        scheme, rest = None, href

    if scheme is not None and scheme not in _SPECIAL:
        if require_http:
            return None
        if _parse_base(base_url) is None:
            # Node parses the base first: an invalid base throws even
            # for an absolute non-special href
            return None
        out = _serialize_nonspecial(scheme, rest)
        return out if out is not None else _fallback(base_url, href)

    base = _parse_base(base_url)
    if base is None:
        # Node: new URL(href, base) throws on an invalid base even
        # when href is absolute
        return None
    if base[0] == "nonspecial":
        if scheme is None or scheme == base[1]:
            # relative against a non-http(s) base → non-http(s) result
            return None if require_http else _fallback(base_url, href)
        cross_scheme = True
    else:
        cross_scheme = scheme is not None and scheme != base[1]

    rest = _backslash_fix(rest)
    out_scheme = scheme if scheme is not None else base[1]
    if require_http and out_scheme not in ("http", "https"):
        # special-but-not-http(s) result (ftp/ws/wss): the http-only
        # callers (metadata links/images) drop it like the reference's
        # protocol filter
        return None

    try:
        if cross_scheme or rest.startswith("//"):
            # authority parse: WHATWG skips ALL leading slashes
            # (special-authority-ignore-slashes; relative-slash state
            # reaches it for any 2+ slash run too)
            rest = rest.lstrip("/")
            auth_end = len(rest)
            for d in "/?#":
                i = rest.find(d)
                if i != -1 and i < auth_end:
                    auth_end = i
            userinfo, host, port = _parse_authority(rest[:auth_end])
            path, query, has_q, frag, has_f = _split_ref(rest[auth_end:])
            return _serialize(out_scheme, userinfo, host, port,
                              path, query, has_q, frag, has_f)

        # relative resolution against a special base
        _tag, _scheme, userinfo, host, port, bpath, bquery, bhas_q = base
        path, query, has_q, frag, has_f = _split_ref(rest)
        if path == "":
            path = bpath
            if not has_q:
                # inherited query: content survives, an empty marker
                # does not (Node: 'http://a/p?' + '' → 'http://a/p')
                query, has_q = bquery, bool(bquery)
        elif not path.startswith("/"):
            path = _merge_paths(bpath, path)
        return _serialize(out_scheme, userinfo, host, port,
                          path, query, has_q, frag, has_f)
    except _UrlError:
        return None
