"""JS regex-semantics helpers shared by the reference-parity layer.

JavaScript's ``\\s`` and Python's ``\\s`` disagree on three classes
(probed against Node v20, pinned in tests/test_jsws_parity.py):

- U+FEFF (ZWNBSP/BOM): whitespace in JS, NOT in Python — mid-text
  ZWNBSP is real in scraped pages and JS collapses it;
- U+0085 (NEL) and U+001C-U+001F (file/group/record/unit separators):
  whitespace in Python, NOT in JS — Python collapses characters the
  reference emits verbatim.

Every reference-port regex whose ``\\s`` touches PAGE TEXT should use
``JS_WS`` (the exact JS class) instead, via f-string interpolation:
``re.compile(rf"{JS_WS}+")``.  Regexes that only ever see
ASCII-structural strings (tag names, attribute syntax) may keep
``\\s``.  The engine-side operators (token counts, quality) keep
Python ``\\s`` deliberately — their DuckDB oracles use the same class.
"""

from __future__ import annotations

import re

# the exact ECMA-262 WhiteSpace ∪ LineTerminator set matched by /\s/
JS_WS = ("[ \\t\\n\\r\\f\\v\\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029"
         "\\u202f\\u205f\\u3000\\ufeff]")

# complement (JS /\\S/)
JS_NWS = "[^" + JS_WS[1:]

_COLLAPSE = re.compile(JS_WS + "+")
_TRIM_L = re.compile("^" + JS_WS + "+")
_TRIM_R = re.compile(JS_WS + "+$")


JS_WS_SET = frozenset(
    " \t\n\r\f\v\u00a0\u1680\u2028\u2029\u202f\u205f\u3000\ufeff"
    + "".join(chr(c) for c in range(0x2000, 0x200B)))


_ASCII_JS_WS = " \t\n\r\f\v"


def is_js_blank(s: str) -> bool:
    """``/^\\s*$/.test(s)`` with JS semantics (turndown isBlank).
    ASCII fast path stays C-level — this runs per text node in the
    emitter's hot path (JS ws ∩ ASCII is exactly " \\t\\n\\r\\f\\v";
    \\x1c-\\x1f are Python-only and must NOT count as blank)."""
    if not s:
        return True
    if s.isascii():
        return not s.strip(_ASCII_JS_WS)
    return all(ch in JS_WS_SET for ch in s)


def collapse_ws(s: str, repl: str = " ") -> str:
    """``s.replace(/\\s+/g, repl)`` with JS semantics."""
    return _COLLAPSE.sub(repl, s)


def js_trim(s: str) -> str:
    """``s.trim()`` — ECMA trims the same set /\\s/ matches (JS
    ``trim`` also covers U+FEFF, unlike Python ``str.strip()``'s
    default which ALSO strips U+0085/U+001C-1F that JS keeps)."""
    return _TRIM_R.sub("", _TRIM_L.sub("", s))
