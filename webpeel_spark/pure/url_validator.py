"""SSRF URL validation (server/middleware/url-validator.ts:1-227).

The reference validates every inbound URL BEFORE any network request:
protocol allow-list, localhost / cloud-metadata hostname blocks, and
private/reserved IP ranges with WHATWG's alternate-notation IPv4
parsing (hex ``0x7f000001``, octal ``0177.0.0.1``, bare decimal
``2130706433`` all canonicalize to dotted form inside ``new URL`` and
are then range-checked).  Pure decision logic with no I/O — the batch
face is a crawl-frontier hygiene filter next to the safe-browsing gate
(``operators/safety.py``): at 10^12 candidate URLs you run this as a
vectorized projection before fetch scheduling, for the same reason the
server runs it as middleware.

Parity is pinned against Node's actual output of the reference
function (52-case fixture, tests/test_url_validator.py), including the
reference's own quirks, reproduced deliberately:

* ``computeMetadata`` in the metadata block-list is compared
  case-sensitively against the already-lowercased hostname, so that
  entry can never match — ``http://computemetadata/`` is allowed;
* every ``::ffff:`` v4-mapped IPv6 address is blocked unconditionally
  (url-validator.ts:214 throws after the embedded-IPv4 check no
  matter what it found);
* ``fec0::/10`` (deprecated site-local) is NOT blocked — only the
  fe8/fe9/fea/feb prefixes of fe80::/10 are.
"""

from __future__ import annotations

import ipaddress
import re
from typing import List, Optional, Tuple

SSRF_MSG = "Cannot fetch localhost, private networks, or non-HTTP URLs"
INVALID_MSG = "Invalid URL format"


class SSRFError(Exception):
    """url-validator.ts:63-68."""



# url-validator.ts:27 / :36-43
_LOCALHOST_PATTERNS = ("localhost", "0.0.0.0")
_METADATA_HOSTNAMES = (
    "metadata.google.internal",
    "metadata.goog",
    "metadata.internal",
    "instance-data.ec2.internal",
    "computeMetadata",  # never matches a lowercased hostname — ts quirk
)


def _whatwg_number(part: str) -> Optional[int]:
    """One IPv4 label per the WHATWG host parser: 0x hex / leading-0
    octal / decimal; None when not a number."""
    if part.lower().startswith("0x"):
        rest = part[2:]
        if rest == "":
            return 0
        if re.fullmatch(r"[0-9a-fA-F]+", rest):
            return int(rest, 16)
        return None
    if len(part) >= 2 and part[0] == "0":
        if re.fullmatch(r"[0-7]+", part):
            return int(part, 8)
        return None
    if re.fullmatch(r"[0-9]+", part):
        return int(part, 10)
    return None


_ENDS_IN_NUMBER = re.compile(r"[0-9]+|0[xX][0-9a-fA-F]*")


def _whatwg_ipv4(host: str) -> Optional[str]:
    """WHATWG IPv4 canonicalization as ``new URL`` applies it to the
    hostname: returns dotted-quad when the host is IPv4-shaped, None
    when it is a regular hostname, raises ValueError when IPv4-shaped
    but invalid (``999.1.2.3``, ``1.2.3.4.5``, ``x.0.0.0.0`` — and
    number-SHAPED labels that fail the strict parse, like the octal
    ``1.2.3.08``: the ends-in-a-number check is a looser test than
    the number parser, so detection and parsing must stay separate)."""
    parts = host.split(".")
    if parts and parts[-1] == "":  # one trailing dot is allowed
        parts = parts[:-1]
    if not parts:
        return None
    if not _ENDS_IN_NUMBER.fullmatch(parts[-1]):
        return None  # not IPv4-shaped — regular hostname
    if len(parts) > 4:
        raise ValueError(INVALID_MSG)
    nums: List[int] = []
    for p in parts:
        n = _whatwg_number(p)
        if n is None:
            raise ValueError(INVALID_MSG)
        nums.append(n)
    for n in nums[:-1]:
        if n > 255:
            raise ValueError(INVALID_MSG)
    last_max = 256 ** (5 - len(nums)) - 1
    if nums[-1] > last_max:
        raise ValueError(INVALID_MSG)
    value = nums[-1]
    for i, n in enumerate(nums[:-1]):
        value += n * 256 ** (3 - i)
    return ".".join(str((value >> s) & 0xFF) for s in (24, 16, 8, 0))


# WHATWG special schemes — these lowercase, percent-decode,
# IDNA-encode and IPv4-canonicalize their hosts; all other schemes
# carry an OPAQUE host (case preserved, non-ASCII percent-encoded,
# no decode, no IPv4 parse)
_SPECIAL_SCHEMES = ("http", "https", "ws", "wss", "ftp", "file")
# code points WHATWG forbids in any (opaque) host
_FORBIDDEN_HOST = set("\x00\t\n\r #/:<>?@[\\]^|")
# …and additionally in special-scheme domains, checked AFTER the one
# percent-decode pass (a '%' that survives decoding is malformed)
_FORBIDDEN_DOMAIN = _FORBIDDEN_HOST | set("%")

_SCHEME_SPLIT = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*):(.*)$", re.S)
# file: has an authority ONLY in the exactly-two-slashes form
# ('file:/p' and 'file:p' are host-less; \ counts as / per spec)
_FILE_AUTH = re.compile(r"^[/\\]{2}(?![/\\])(.*)$", re.S)


def _idna_ascii(host: str) -> Optional[str]:
    """domain-to-ASCII for a non-ASCII host.  The ``idna`` package's
    UTS-46 non-transitional mode matches Node (``faß.de`` →
    ``xn--fa-hia.de``, where the stdlib IDNA-2003 codec gives the
    transitional ``fass.de``); the codec is the fallback when the
    package is absent."""
    try:
        import idna as _idna

        try:
            return _idna.encode(host, uts46=True,
                                transitional=False).decode("ascii")
        except _idna.IDNAError:
            return None
    except ImportError:
        try:
            return host.encode("idna").decode("ascii")
        except UnicodeError:
            return None


def whatwg_hostname(url: str) -> Tuple[str, Optional[str]]:
    """(scheme-with-colon, hostname) exactly as ``new URL(url)`` yields
    them — hostname None where the constructor throws.

    Special schemes (authority parsed even without '//', slashes and
    backslashes interchangeable): one percent-decode pass, forbidden
    domain code points → throw, lowercase, UTS-46 IDNA for unicode,
    punycode-label validation, WHATWG IPv4 canonicalization (hex /
    octal / decimal spellings → dotted; IPv4-shaped-but-invalid →
    throw), ``file://localhost`` → empty host, no port on file URLs.
    Other schemes: opaque host, case preserved, non-ASCII
    percent-encoded from the ORIGINAL case, forbidden host code
    points → throw.  Bracketed IPv6 canonicalizes per RFC 5952 either
    way (stdlib ``ipaddress`` is bit-identical to Node, incl.
    v4-mapped).  Behaviors pinned by the Node fuzz goldens."""
    # WHATWG first strips leading/trailing C0-or-space and removes
    # tab/newline everywhere
    url = (url or "").strip("\x00\x01\x02\x03\x04\x05\x06\x07\x08\t\n"
                            "\x0b\x0c\r\x0e\x0f\x10\x11\x12\x13\x14\x15"
                            "\x16\x17\x18\x19\x1a\x1b\x1c\x1d\x1e\x1f ")
    url = url.replace("\t", "").replace("\n", "").replace("\r", "")
    m = _SCHEME_SPLIT.match(url)
    if not m:
        return "", None
    sname = m.group(1).lower()
    scheme = sname + ":"
    rest = m.group(2)
    special = sname in _SPECIAL_SCHEMES

    # authority extraction
    if sname == "file":
        fm = _FILE_AUTH.match(rest)
        auth = re.split(r"[/?#\\]", fm.group(1), 1)[0] if fm else ""
    elif special:
        # special-authority-ignore-slashes: any run of / or \ (incl.
        # none — 'http:example.com') precedes the authority
        auth = re.split(r"[/?#\\]", rest.lstrip("/\\"), 1)[0]
    else:
        if not rest.startswith("//"):
            return scheme, ""
        auth = re.split(r"[/?#]", rest[2:], 1)[0]

    if "@" in auth:
        auth = auth.rsplit("@", 1)[1]  # userinfo ends at the LAST @

    # split host : port (a colon outside brackets is the port separator)
    if auth.startswith("["):
        end = auth.find("]")
        if end < 0:
            return scheme, None
        hostpart, portpart = auth[:end + 1], auth[end + 1:]
        if portpart and not portpart.startswith(":"):
            return scheme, None
        has_port_sep = bool(portpart)
        port = portpart[1:] if portpart else ""
    else:
        hostpart, sep, port = auth.partition(":")
        has_port_sep = bool(sep)
    if sname == "file" and has_port_sep:
        return scheme, None  # file URLs reject even an EMPTY port colon
    if port:
        if not re.fullmatch(r"[0-9]+", port) or int(port) > 65535:
            return scheme, None

    if hostpart == "":
        if special and sname != "file":
            return scheme, None  # special schemes need a host
        return scheme, ""
    if hostpart.startswith("["):
        try:
            return scheme, "[" + str(
                ipaddress.IPv6Address(hostpart[1:-1])) + "]"
        except ValueError:
            return scheme, None

    if not special:  # opaque host
        if any(c in _FORBIDDEN_HOST for c in hostpart):
            return scheme, None
        return scheme, "".join(
            c if ord(c) < 0x80 else
            "".join("%%%02X" % b for b in c.encode("utf-8"))
            for c in hostpart)

    # special: ONE percent-decode pass, bytes → utf-8
    from urllib.parse import unquote_to_bytes

    host = unquote_to_bytes(hostpart).decode("utf-8", "replace").lower()
    if any(c in _FORBIDDEN_DOMAIN for c in host):
        return scheme, None
    if not all(ord(c) < 128 for c in host):
        encoded = _idna_ascii(host)
        if encoded is None:
            return scheme, None
        host = encoded
    else:
        for label in host.split("."):
            if label.startswith("xn--"):  # Node validates punycode +
                # the decoded codepoints (xn--abc decodes to control
                # chars → throw); idna.decode per label matches
                try:
                    import idna as _idna

                    _idna.decode(label)
                except ImportError:
                    try:
                        label[4:].encode("ascii").decode("punycode")
                    except (UnicodeError, ValueError):
                        return scheme, None
                except Exception:
                    return scheme, None
    if sname == "file" and host == "localhost":
        return scheme, ""
    try:
        dotted = _whatwg_ipv4(host)
    except ValueError:
        return scheme, None
    return scheme, dotted if dotted is not None else host


def js_url_host(url: str) -> Tuple[str, str]:
    """(protocol-with-colon, hostname) as ``new URL(url)`` yields them;
    raises ValueError(INVALID_MSG) where the constructor throws."""
    scheme, host = whatwg_hostname(url)
    if host is None:
        raise ValueError(INVALID_MSG)
    return scheme, host


def whatwg_url(url: str) -> Optional[dict]:
    """{scheme, hostname, pathname, query} approximating ``new URL``
    for parsers that key on pathname/searchParams (None where the
    constructor throws).  Shares whatwg_hostname's authority rules —
    tab/newline stripping, special-scheme ignore-slashes, backslash
    separators — and normalizes backslashes in special-scheme paths;
    dot-segment removal and path percent-encoding are NOT applied
    (callers here match literal well-formed paths like '/watch')."""
    cleaned = (url or "").strip(
        "\x00\x01\x02\x03\x04\x05\x06\x07\x08\t\n\x0b\x0c\r\x0e\x0f"
        "\x10\x11\x12\x13\x14\x15\x16\x17\x18\x19\x1a\x1b\x1c\x1d\x1e"
        "\x1f ")
    cleaned = cleaned.replace("\t", "").replace("\n", "").replace("\r", "")
    scheme, host = whatwg_hostname(cleaned)
    if host is None:
        return None
    m = _SCHEME_SPLIT.match(cleaned)
    sname, rest = m.group(1).lower(), m.group(2)
    special = sname in _SPECIAL_SCHEMES
    if special:
        rest2 = rest if sname == "file" else rest.lstrip("/\\")
        if sname == "file":
            fm = _FILE_AUTH.match(rest)
            rest2 = fm.group(1) if fm else rest.lstrip("/\\")
        mm = re.search(r"[/?#\\]", rest2)
        tail = rest2[mm.start():] if mm else ""
        tail = tail.replace("\\", "/")
    else:
        if rest.startswith("//"):
            mm = re.search(r"[/?#]", rest[2:])
            tail = rest[2 + mm.start():] if mm else ""
        else:
            tail = rest
    tail = tail.split("#", 1)[0]
    pathname, _, query = tail.partition("?")
    if special and not pathname:
        pathname = "/"
    return {"scheme": scheme, "hostname": host, "pathname": pathname,
            "query": query}


def js_search_params(query: str) -> dict:
    """First-value-wins URLSearchParams over a query string ('+' is a
    space, values percent-decoded)."""
    from urllib.parse import unquote_plus

    out: dict = {}
    for pair in query.split("&"):
        if not pair:
            continue
        k, _, v = pair.partition("=")
        k = unquote_plus(k)
        if k not in out:
            out[k] = unquote_plus(v)
    return out


def _js_parse_int(s: str, radix: int) -> Optional[int]:
    """JS ``parseInt`` — parse the maximal valid-digit PREFIX (so
    ``parseInt('1x', 10)`` is 1, not an error), None for NaN.  The
    reference's dotted-octal branch leans on this: '0177.0.0.1x'
    reaches it as a hostname (not IPv4-shaped for WHATWG, last label
    isn't a number) and still resolves to 127.0.0.1 → blocked."""
    s = s.strip()
    m = re.match(r"[+-]?", s)
    sign = -1 if m.group(0) == "-" else 1
    digits = "01234567" if radix == 8 else "0123456789"
    body = s[m.end():]
    i = 0
    while i < len(body) and body[i] in digits:
        i += 1
    if i == 0:
        return None
    return sign * int(body[:i], radix)


def parse_ipv4(hostname: str) -> Optional[List[int]]:
    """url-validator.ts:73-134 — octets from dotted/hex/octal/decimal
    notation, None when not IPv4-like.  (Via validate_url_for_ssrf the
    hostname is already canonical dotted; the alternate branches match
    the reference for direct callers.)"""
    cleaned = re.sub(r"^\[|\]$", "", hostname)
    m = re.fullmatch(r"(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})", cleaned)
    if m:
        octets = [int(g) for g in m.groups()]
        if all(0 <= o <= 255 for o in octets):
            return octets
        raise SSRFError(SSRF_MSG)
    if re.fullmatch(r"0x[0-9a-fA-F]+", cleaned):
        # JS's (num >>> 24) runs ToUint32 first, so >32-bit hex wraps
        num = int(cleaned, 16) & 0xFFFFFFFF
        return [(num >> 24) & 0xFF, (num >> 16) & 0xFF,
                (num >> 8) & 0xFF, num & 0xFF]
    if re.match(r"0[0-7]", cleaned):
        if re.fullmatch(r"0[0-7]+", cleaned):
            num = int(cleaned, 8)
            if num <= 0xFFFFFFFF:
                return [(num >> 24) & 0xFF, (num >> 16) & 0xFF,
                        (num >> 8) & 0xFF, num & 0xFF]
        parts = cleaned.split(".")
        if len(parts) == 4:
            octets = [_js_parse_int(p, 8 if re.match(r"0[0-7]", p)
                                    else 10) for p in parts]
            if all(o is not None and 0 <= o <= 255 for o in octets):
                return octets
    if re.fullmatch(r"\d+", cleaned):
        num = int(cleaned, 10)
        if num <= 0xFFFFFFFF:
            return [(num >> 24) & 0xFF, (num >> 16) & 0xFF,
                    (num >> 8) & 0xFF, num & 0xFF]
    return None


def validate_ipv4_for_ssrf(octets: List[int]) -> None:
    """url-validator.ts:139-176."""
    a, b, c, d = octets
    if (a == 127 or a == 10
            or (a == 172 and 16 <= b <= 31)
            or (a == 192 and b == 168)
            or (a == 169 and b == 254)
            or (a == 255 and b == 255 and c == 255 and d == 255)
            or a == 0):
        raise SSRFError(SSRF_MSG)


def validate_ipv6_for_ssrf(hostname: str) -> None:
    """url-validator.ts:181-227 — note the unconditional ::ffff: throw."""
    addr = re.sub(r"^\[|\]$", "", hostname).lower()
    if addr in ("::1", "0:0:0:0:0:0:0:1"):
        raise SSRFError(SSRF_MSG)
    if addr.startswith("::ffff:"):
        ipv4_part = addr[7:]
        if "." in ipv4_part:
            parts = ipv4_part.split(".")
            if len(parts) == 4:
                try:
                    octets = [int(p, 10) for p in parts]
                except ValueError:
                    octets = None
                if octets and all(0 <= o <= 255 for o in octets):
                    validate_ipv4_for_ssrf(octets)
        else:
            hex_str = ipv4_part.replace(":", "")
            if re.fullmatch(r"[0-9a-f]{1,8}", hex_str):
                num = int(hex_str, 16)
                validate_ipv4_for_ssrf(
                    [(num >> 24) & 0xFF, (num >> 16) & 0xFF,
                     (num >> 8) & 0xFF, num & 0xFF])
        raise SSRFError(SSRF_MSG)  # ts:214 — all v4-mapped blocked
    if addr.startswith(("fc", "fd")):
        raise SSRFError(SSRF_MSG)
    if addr.startswith(("fe8", "fe9", "fea", "feb")):
        raise SSRFError(SSRF_MSG)


def validate_url_for_ssrf(url: str) -> None:
    """url-validator.ts:10-58 — raises ValueError(INVALID_MSG) where
    ``new URL`` throws, SSRFError for blocked targets, returns None
    when the URL is safe to fetch."""
    protocol, hostname = js_url_host(url)
    if protocol not in ("http:", "https:"):
        raise SSRFError(SSRF_MSG)
    hostname = hostname.lower()
    for pattern in _LOCALHOST_PATTERNS:
        if hostname == pattern or hostname.endswith("." + pattern):
            raise SSRFError(SSRF_MSG)
    for m in _METADATA_HOSTNAMES:
        if hostname == m or hostname.endswith("." + m):
            raise SSRFError(SSRF_MSG)
    octets = parse_ipv4(hostname)
    if octets is not None:
        validate_ipv4_for_ssrf(octets)
    if ":" in hostname:
        validate_ipv6_for_ssrf(hostname)


def ssrf_verdict(url: str) -> dict:
    """Batch face: {'allowed': bool, 'reason': 'ok'|'ssrf'|'invalid'}
    — the exception protocol flattened for a vectorized frontier
    filter (invalid URLs are unfetchable and dropped like blocked
    ones, but the reason distinguishes them for frontier stats)."""
    try:
        validate_url_for_ssrf(url)
        return {"allowed": True, "reason": "ok"}
    except SSRFError:
        return {"allowed": False, "reason": "ssrf"}
    except ValueError:
        return {"allowed": False, "reason": "invalid"}
