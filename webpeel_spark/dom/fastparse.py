"""Fast HTML tokenizer feeding the same tree builder.

Drop-in replacement for the stdlib ``html.parser`` tokenization loop:
one compiled-regex ``finditer`` pass emits start/end/data events
directly into ``_TreeBuilder`` (dom/core.py), skipping HTMLParser's
per-token Python overhead (goahead/parse_starttag/updatepos).

Semantics matched to ``HTMLParser(convert_charrefs=True)``:

* tag/attr names lowercased; attr values unescaped (charrefs) always;
  first duplicate attr wins (builder behaviour);
* text charrefs converted (``html.unescape``) outside script/style;
* ``<script>``/``<style>`` switch to raw-text mode: content up to the
  next ``</script``/``</style`` is passed through verbatim;
* comments, doctypes, processing instructions dropped (the builder
  ignores them);
* a ``<`` not opening a valid construct is literal text.

Equivalence to the stdlib path is pinned by tests/test_fastparse.py,
which asserts byte-identical serialized trees over the full synthetic
corpus (every template class) and the edge fixtures.
"""

from __future__ import annotations

import re
from html import unescape

# one token per match: comment | declaration/PI | end tag | start tag
_TOKEN_RE = re.compile(
    r"<(?:"
    r"!--(?P<comment>.*?)(?:-->|$)"
    r"|(?P<decl>[!?][^>]*)>"
    r"|/\s*(?P<end>[a-zA-Z][-.a-zA-Z0-9:_]*)\s*>"
    r"|(?P<start>[a-zA-Z][-.a-zA-Z0-9:_]*)(?P<attrs>(?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(?P<selfclose>/?)>"
    r")",
    re.S,
)

_ATTR_RE = re.compile(
    r"([^\s=/>]+)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?",
)

# attrs tail that ends inside an unquoted value (`... href=https://x` or
# a dangling `=`): a following '/' belongs to the VALUE, not to a
# self-closing marker (stdlib/HTML5: unquoted values run to whitespace
# or '>', so `<a href=https://example.com/>` is an OPEN tag with the
# trailing slash kept in href)
_UNQUOTED_VALUE_TAIL_RE = re.compile(r"=\s*(?:[^\s>\"'][^\s>\"']*)?$")

_RAW_END = {
    "script": re.compile(r"</\s*script", re.I),
    "style": re.compile(r"</\s*style", re.I),
}

# stdlib parse_endtag accepts only `</name\s*>`; `</script foo>` inside
# raw text is DATA, not an end tag (HTMLParser tolerant cdata path)
_RAW_END_FULL = {
    "script": re.compile(r"</\s*script\s*>", re.I),
    "style": re.compile(r"</\s*style\s*>", re.I),
}

_AMP = "&"


def _emit_text(builder, text: str, raw: bool) -> None:
    if not text:
        return
    builder.handle_data(text if raw else (unescape(text) if _AMP in text else text))


def fast_feed(builder, html: str, xml: bool = False) -> None:
    """Tokenize ``html`` into builder events (same events the stdlib
    HTMLParser would deliver for well-formed-ish web HTML)."""
    pos = 0
    n = len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt == -1:
            _emit_text(builder, html[pos:], raw=False)
            break
        if lt > pos:
            _emit_text(builder, html[pos:lt], raw=False)
        m = _TOKEN_RE.match(html, lt)
        if m is None:
            # literal '<' in text (stdlib: CHARACTERS before next '<')
            nxt = html.find("<", lt + 1)
            if nxt == -1:
                _emit_text(builder, html[lt:], raw=False)
                break
            _emit_text(builder, html[lt:nxt], raw=False)
            pos = nxt
            continue
        pos = m.end()
        # numeric groups, most-common branch first: 1=comment 2=decl
        # 3=end 4=start 5=attrs 6=selfclose (start tags dominate real
        # pages — one group fetch decides the hot branch)
        start = m.group(4)
        if start is None:
            end = m.group(3)
            if end is not None:
                builder.handle_endtag(end.lower())
                continue
            decl = m.group(2)
            if decl is not None and decl.startswith("![CDATA["):
                # marked section runs to "]]>", which may contain ">"
                close = html.find("]]>", lt)
                if close != -1:
                    pos = close + 3
            continue  # builder drops comments/declarations/PIs
        tag = start.lower()
        attrs = []
        raw_attrs = m.group(5)
        selfclose = m.group(6)
        if selfclose and raw_attrs \
                and _UNQUOTED_VALUE_TAIL_RE.search(raw_attrs):
            # '/' terminates an unquoted attribute value — fold it back
            raw_attrs += "/"
            selfclose = ""
        if raw_attrs:
            for am in _ATTR_RE.finditer(raw_attrs):
                name = am.group(1)
                if name.endswith("/") and am.group(2) is None \
                        and am.group(3) is None and not am.group(4):
                    name = name.rstrip("/")
                    if not name:
                        continue
                value = am.group(2)
                if value is None:
                    value = am.group(3)
                if value is None:
                    value = am.group(4)
                if value is None:
                    value = ""   # bare attribute → "" (builder semantics)
                elif _AMP in value:
                    value = unescape(value)
                attrs.append((name.lower(), value))
        if selfclose:
            builder.handle_startendtag(tag, attrs)
            continue
        builder.handle_starttag(tag, attrs)
        if not xml and tag in _RAW_END:
            # raw-text element: verbatim content up to its end tag;
            # a `</script ...>` that is not a well-formed end tag stays
            # DATA (stdlib tolerant cdata path), keep scanning
            while True:
                em = _RAW_END[tag].search(html, pos)
                if em is None:
                    _emit_text(builder, html[pos:], raw=True)
                    pos = n
                    break
                if _RAW_END_FULL[tag].match(html, em.start()):
                    _emit_text(builder, html[pos:em.start()], raw=True)
                    gt = html.find(">", em.end())
                    builder.handle_endtag(tag)
                    pos = n if gt == -1 else gt + 1
                    break
                # emit through the '</' and keep looking in raw mode
                _emit_text(builder, html[pos:em.start() + 2], raw=True)
                pos = em.start() + 2
