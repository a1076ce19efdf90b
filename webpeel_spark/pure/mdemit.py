"""HTML → Markdown emitter (Turndown-equivalent).

A from-scratch Python reimplementation of the markdown conversion the
reference engine performs with Turndown + turndown-plugin-gfm under the
exact configuration at /root/reference/src/core/markdown.ts:538-578:

    headingStyle: 'atx', codeBlockStyle: 'fenced', bulletListMarker: '-',
    emDelimiter: '_', strongDelimiter: '**', plus GFM
    (tables / strikethrough / task lists) and two custom rules:
    images → alt-only (``![alt](src)``, dropped when no alt) and
    ``pre > code`` → fenced block with ``language-*`` class detection.

The whitespace-collapse pre-pass, escaping table, flanking-whitespace
handling, blank-node logic and block joining all mirror Turndown's
observable behaviour so the emitted bytes define our golden fixtures.

Head content (``<title>``/``<meta>``) never emits output.
"""

from __future__ import annotations

import math
import re

from .jstext import JS_NWS, JS_WS, is_js_blank
from typing import Optional

from ..dom import Node, VOID_TAGS, parse_html, document_body


def _js_number(s: str) -> float:
    """JS ``Number(string)``: trimmed; '' → 0; hex accepted; else NaN."""
    t = s.strip()
    if not t:
        return 0.0
    try:
        low = t.lower()
        if low.startswith(("0x", "+0x", "-0x")):
            sign = -1.0 if low.startswith("-") else 1.0
            return sign * int(low.lstrip("+-"), 16)
        return float(t)
    except ValueError:
        return float("nan")


def _js_num_str(x: float) -> str:
    """JS number-to-string for the common cases (integers bare, NaN)."""
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    if x == int(x) and abs(x) < 1e21:
        return str(int(x))
    return repr(x)

# ── element classification (Turndown's block-elements list) ─────────────

BLOCK_ELEMENTS = frozenset(
    """address article aside audio blockquote body canvas center dd dir div dl
    dt fieldset figcaption figure footer form frameset h1 h2 h3 h4 h5 h6 header
    hgroup hr html isindex li main menu nav noframes noscript ol output p pre
    section table tbody td tfoot th thead tr ul""".split()
)

_MEANINGFUL_WHEN_BLANK = frozenset(
    "a table thead tbody tfoot th td iframe script audio video".split()
)

# head and title are NOT skipped: turndown's re-parse of a full
# document dissolves <html>/<head>/<body> but keeps <title> in the
# tree, and title has no rule — its text is EMITTED by the default
# rule (the well-known turndown behavior that makes full-document
# conversion start with the page title; also why <svg><title> icon
# labels appear in reference output).  head is not in turndown's
# block list, so it acts as a transparent inline container here.
_SKIP_ENTIRELY = frozenset(("meta", "link", "base", "#comment"))


def _is_block(node: Node) -> bool:
    return node.tag in BLOCK_ELEMENTS


def _is_void(node: Node) -> bool:
    return node.tag in VOID_TAGS


def _is_pre(node: Node) -> bool:
    return node.tag == "pre"


# ── whitespace collapse (collapse-whitespace algorithm) ──────────────────

_WS_RE = re.compile(r"[ \r\n\t]+")


class _CollapseState:
    __slots__ = ("prev_parent", "prev_idx", "keep_leading")

    def __init__(self):
        self.prev_parent: Optional[Node] = None
        self.prev_idx: int = -1
        self.keep_leading = False

    def prev_text(self) -> Optional[str]:
        if self.prev_parent is None:
            return None
        return self.prev_parent.children[self.prev_idx]

    def set_prev(self, parent: Node, idx: int) -> None:
        self.prev_parent = parent
        self.prev_idx = idx

    def clear_prev(self) -> None:
        self.prev_parent = None

    def trim_prev_trailing(self) -> None:
        t = self.prev_text()
        if t is not None and t.endswith(" "):
            self.prev_parent.children[self.prev_idx] = t[:-1]


def collapse_whitespace(element: Node) -> None:
    """In-place whitespace normalization, mirroring Turndown's pre-pass."""
    if not element.children or _is_pre(element):
        return
    state = _CollapseState()
    _collapse_walk(element, state)
    t = state.prev_text()
    if t is not None:
        t2 = t[:-1] if t.endswith(" ") else t
        if t2:
            state.prev_parent.children[state.prev_idx] = t2
        else:
            del state.prev_parent.children[state.prev_idx]


def _collapse_walk(el: Node, state: _CollapseState) -> None:
    i = 0
    while i < len(el.children):
        c = el.children[i]
        if isinstance(c, str):
            text = _WS_RE.sub(" ", c)
            prev = state.prev_text()
            if (
                (prev is None or prev.endswith(" "))
                and not state.keep_leading
                and text.startswith(" ")
            ):
                text = text[1:]
            if not text:
                del el.children[i]
                continue
            el.children[i] = text
            state.set_prev(el, i)
        else:
            if c.tag in _SKIP_ENTIRELY:
                i += 1
                continue
            if _is_block(c) or c.tag == "br":
                state.trim_prev_trailing()
                state.clear_prev()
                state.keep_leading = False
                if not _is_pre(c):
                    _collapse_walk(c, state)
            elif _is_void(c) or _is_pre(c):
                state.clear_prev()
                state.keep_leading = True
            else:
                if state.prev_parent is not None:
                    state.keep_leading = False
                _collapse_walk(c, state)
        i += 1


# ── markdown escaping (Turndown's escapes table, anchors unflagged) ──────

_ESCAPE_STEPS = [
    (re.compile(r"\\"), "\\\\\\\\"),
    (re.compile(r"\*"), "\\*"),
    (re.compile(r"^-"), "\\-"),
    (re.compile(r"^\+ "), "\\+ "),
    (re.compile(r"^(=+)"), "\\\\\\1"),
    (re.compile(r"^(#{1,6}) "), "\\\\\\1 "),
    (re.compile(r"`"), "\\`"),
    (re.compile(r"^~~~"), "\\~~~"),
    (re.compile(r"\["), "\\["),
    (re.compile(r"\]"), "\\]"),
    (re.compile(r"^>"), "\\>"),
    (re.compile(r"_"), "\\_"),
    (re.compile(r"^([0-9]+)\. "), "\\1\\\\. "),  # JS \d = ASCII
]


# one search deciding whether ANY escape step can fire: the unanchored
# chars, or a line-start char of the anchored steps (superset test —
# false positives just run the full table, never change output)
_ESCAPE_NEEDED = re.compile(r"[\\*`\[\]_]|^[-+=#~>]|^[0-9]+\. ")


def escape_markdown(text: str) -> str:
    if _ESCAPE_NEEDED.search(text) is None:
        return text
    for pattern, repl in _ESCAPE_STEPS:
        text = pattern.sub(repl, text)
    return text


# ── blank detection ──────────────────────────────────────────────────────

_BLANK_RE = re.compile(rf"^{JS_WS}*$")


def _has_meaningful_or_void(node: Node) -> bool:
    for d in node.iter_elements():
        if d.tag in VOID_TAGS or d.tag in _MEANINGFUL_WHEN_BLANK:
            return True
    return False


def _all_text_blank(node: Node) -> bool:
    """True iff every text descendant is JS-whitespace-only —
    equivalent to turndown's ``/^\\s*$/`` over ``node.text()`` without
    building the string.  JS ``\\s`` ≠ Python ``\\s``/``isspace``
    (U+FEFF is JS-blank only; U+0085/U+001C-1F Python-blank only), so
    membership uses the exact ECMA set (jstext.JS_WS_SET, pinned
    exhaustively by tests/test_jsws_parity.py)."""
    stack = list(node.children)
    while stack:
        c = stack.pop()
        if isinstance(c, str):
            if c and not is_js_blank(c):
                return False
        else:
            stack.extend(c.children)
    return True


def _is_blank(node: Node) -> bool:
    return (
        not _is_void(node)
        and node.tag not in _MEANINGFUL_WHEN_BLANK
        and _all_text_blank(node)
        and not _has_meaningful_or_void(node)
    )


# ── joining / flanking whitespace ────────────────────────────────────────

def _join(output: str, replacement: str) -> str:
    # strip("\n") ≡ the original \n+$ / ^\n+ regex trims (hot path:
    # one call per emitted block)
    s1 = output.rstrip("\n")
    s2 = replacement.lstrip("\n")
    nls = min(max(len(output) - len(s1), len(replacement) - len(s2)), 2)
    return s1 + ("\n" * nls) + s2


_EDGE_WS_RE = re.compile(
    rf"^(([ \t\r\n]*)({JS_WS}*))(?:(?={JS_NWS})[\s\S]*{JS_NWS})?"
    rf"(({JS_WS}*?)([ \t\r\n]*))$"
)


def _flanking_whitespace(node: Node) -> tuple:
    if _is_block(node):
        return "", ""
    m = _EDGE_WS_RE.match(node.text())
    if m is None:
        return "", ""
    leading, lead_ascii, lead_non = m.group(1), m.group(2), m.group(3)
    trailing, trail_non, trail_ascii = m.group(4), m.group(5), m.group(6)
    if lead_ascii and _flanked_by_ws("left", node):
        leading = lead_non
    if trail_ascii and _flanked_by_ws("right", node):
        trailing = trail_non
    return leading, trailing


def _sibling(node: Node, side: str):
    parent = node.parent
    if parent is None:
        return None
    idx = parent.children.index(node)
    j = idx - 1 if side == "left" else idx + 1
    if 0 <= j < len(parent.children):
        return parent.children[j]
    return None


def _flanked_by_ws(side: str, node: Node) -> bool:
    sib = _sibling(node, side)
    if sib is None:
        return False
    if isinstance(sib, str):
        return sib.endswith(" ") if side == "left" else sib.startswith(" ")
    if not _is_block(sib):
        t = sib.text()
        return t.endswith(" ") if side == "left" else t.startswith(" ")
    return False


# ── GFM table helpers ────────────────────────────────────────────────────

def _first_tr(table: Node) -> Optional[Node]:
    for el in table.iter_elements():
        if el.tag == "tr":
            return el
    return None


def _is_first_tbody(el: Node) -> bool:
    if el.tag != "tbody" or el.parent is None:
        return False
    sibs = el.parent.element_children()
    idx = sibs.index(el)
    if idx == 0:
        return True
    prev = sibs[idx - 1]
    return prev.tag == "thead" and _BLANK_RE.match(prev.text()) is not None


def _is_heading_row(tr: Node) -> bool:
    parent = tr.parent
    if parent is None:
        return False
    if parent.tag == "thead":
        return True
    first = next((c for c in parent.children if not (isinstance(c, str))), None)
    if first is not tr:
        return False
    if parent.tag != "table" and not _is_first_tbody(parent):
        return False
    # JS Array.every on EMPTY childNodes is true: a childless first
    # <tr> IS a heading row in gfm's isHeadingRow (no len>0 guard)
    return all(
        (isinstance(c, Node) and c.tag == "th") for c in tr.children
    )


def _table_cell(content: str, node: Node) -> str:
    idx = node.parent.children.index(node) if node.parent else 0
    prefix = "| " if idx == 0 else " "
    return prefix + content + " |"


_ALIGN_BORDERS = {"left": ":--", "right": "--:", "center": ":-:"}


# ── emitter ──────────────────────────────────────────────────────────────

class MarkdownEmitter:
    """Stateless converter; instantiate once per executor (cheap anyway)."""

    bullet = "-"
    em = "_"
    strong = "**"
    hr = "* * *"
    br = "  "

    def convert_document(self, html: str) -> str:
        root = parse_html(html)
        body = document_body(root) or root
        return self.convert_node(body)

    def convert_node(self, node: Node) -> str:
        collapse_whitespace(node)
        out = self._process(node, in_code=False)
        # Turndown postProcess
        out = re.sub(r"^[\t\r\n]+", "", out)
        out = re.sub(rf"{JS_WS}+$", "", out)
        return out

    # .....................................................................
    def _process(self, parent: Node, in_code: bool) -> str:
        out = ""
        for child in parent.children:
            if isinstance(child, str):
                rep = child if in_code else escape_markdown(child)
            else:
                rep = self._replacement(child, in_code)
            out = _join(out, rep)
        return out

    def _replacement(self, node: Node, in_code: bool) -> str:
        tag = node.tag
        if tag in _SKIP_ENTIRELY or tag in ("script", "style", "noscript"):
            return ""
        if _is_blank(node):
            return self._blank_replacement(node)
        child_in_code = in_code or tag == "code"
        content = self._process(node, child_in_code)
        leading, trailing = _flanking_whitespace(node)
        if leading or trailing:
            content = content.strip()
        return leading + self._apply_rule(node, content) + trailing

    def _blank_replacement(self, node: Node) -> str:
        if node.tag == "table" and not self._table_convertible(node):
            return "\n\n" + node.html() + "\n\n"
        return "\n\n" if _is_block(node) else ""

    def _table_convertible(self, table: Node) -> bool:
        tr = _first_tr(table)
        return tr is not None and _is_heading_row(tr)

    # rule dispatch, highest priority first (reference addRule order) .....
    def _apply_rule(self, node: Node, content: str) -> str:
        tag = node.tag

        # custom codeBlocks rule (markdown.ts:565-575)
        if tag == "pre":
            first = next((c for c in node.children if isinstance(c, Node)), None)
            first_child = node.children[0] if node.children else None
            if first is not None and first is first_child and first.tag == "code":
                cls = first.get("class") or ""
                m = re.search(r"language-([0-9A-Za-z_]+)", cls)  # JS \w = ASCII
                language = m.group(1) if m else ""
                return "\n\n```" + language + "\n" + first.text() + "\n```\n\n"

        # custom images rule (markdown.ts:552-561): alt-only, drop altless
        if tag == "img":
            alt = node.get("alt") or ""
            src = node.get("src") or ""
            if alt:
                return f"![{alt}]({src})"
            return ""

        # GFM task list items
        if tag == "input" and (node.get("type") or "").lower() == "checkbox" \
                and node.parent is not None and node.parent.tag == "li":
            return ("[x]" if node.get("checked") is not None else "[ ]") + " "

        # GFM tables
        if tag in ("thead", "tbody", "tfoot"):
            return content
        if tag == "table":
            if not any(e.tag == "tr" for e in node.iter_elements()):
                # turndown-plugin-gfm's table filter calls
                # isHeadingRow(node.rows[0]); a rowless table makes
                # rows[0] undefined and 'tr.parentNode' THROW, which
                # markdown.ts:599-605 catches by converting the WHOLE
                # page via $.text() whitespace-collapse — reproduce
                # the crash so the same fallback fires here
                raise ValueError("rowless <table>: gfm isHeadingRow "
                                 "TypeError equivalent")
            if self._table_convertible(node):
                return "\n\n" + content.replace("\n\n", "\n", 1) + "\n\n"
            return "\n\n" + node.html() + "\n\n"  # keep: raw table
        if tag == "tr":
            border_cells = ""
            if _is_heading_row(node):
                for c in node.children:
                    if not isinstance(c, Node):
                        continue
                    border = "---"
                    align = (c.get("align") or "").lower()
                    if align in _ALIGN_BORDERS:
                        border = _ALIGN_BORDERS[align]
                    border_cells += _table_cell(border, c)
            return "\n" + content + (("\n" + border_cells) if border_cells else "")
        if tag in ("th", "td"):
            return _table_cell(content, node)

        # GFM strikethrough
        if tag in ("del", "s", "strike"):
            return "~" + content + "~"

        # GFM highlighted code block (div.highlight-source-x > pre)
        if tag == "div":
            cls = node.get("class") or ""
            m = re.search(r"highlight-(?:text|source)-([a-z0-9]+)", cls)
            # gfm's highlightedCodeBlock filter checks firstChild (ANY
            # node): non-whitespace text before the <pre> defeats it
            first = node.children[0] if node.children else None
            if m and isinstance(first, Node) and first.tag == "pre":
                return "\n\n```" + m.group(1) + "\n" + first.text() + "\n```\n\n"

        # ── default Turndown rules ────────────────────────────────────
        if tag == "p":
            return "\n\n" + content + "\n\n"
        if tag == "br":
            return self.br + "\n"
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            level = int(tag[1])
            return "\n\n" + "#" * level + " " + content + "\n\n"
        if tag == "blockquote":
            inner = re.sub(r"^\n+|\n+$", "", content)
            inner = re.sub(r"^", "> ", inner, flags=re.M)
            return "\n\n" + inner + "\n\n"
        if tag in ("ul", "ol"):
            parent = node.parent
            if parent is not None and parent.tag == "li":
                kids = parent.element_children()
                if kids and kids[-1] is node:
                    return "\n" + content
            return "\n\n" + content + "\n\n"
        if tag == "li":
            return self._list_item(node, content)
        if tag == "hr":
            return "\n\n" + self.hr + "\n\n"
        # truthy-href filter like Turndown's inlineLink (href="" falls
        # through to the default rule and emits bare content)
        if tag == "a" and node.get("href"):
            href = (node.get("href") or "").replace("(", "\\(").replace(")", "\\)")
            title = node.get("title") or ""
            title = re.sub(rf"(\n+{JS_WS}*)+", "\n", title)
            title_part = ' "' + title.replace('"', '\\"') + '"' if title else ""
            return "[" + content + "](" + href + title_part + ")"
        if tag in ("em", "i"):
            if not content.strip():
                return ""
            return self.em + content + self.em
        if tag in ("strong", "b"):
            if not content.strip():
                return ""
            return self.strong + content + self.strong
        if tag == "code":
            return self._inline_code(node, content)

        # default rule: pass through content; blocks get separation
        if _is_block(node):
            return "\n\n" + content + "\n\n"
        return content

    def _list_item(self, node: Node, content: str) -> str:
        content = re.sub(r"^\n+", "", content)
        content = re.sub(r"\n+$", "\n", content)
        content = content.replace("\n", "\n    ")
        prefix = self.bullet + "   "
        parent = node.parent
        if parent is not None and parent.tag == "ol":
            kids = parent.element_children()
            index = kids.index(node)
            start_attr = parent.get("start")
            # turndown: (start ? Number(start) + index : index + 1) —
            # JS Number semantics, so start="abc" yields 'NaN.  ' and
            # start="5.5" yields '5.5.  ', faithfully
            if start_attr:
                prefix = f"{_js_num_str(_js_number(start_attr) + index)}.  "
            else:
                prefix = f"{index + 1}.  "
        has_next = False
        if parent is not None:
            idx = parent.children.index(node)
            has_next = idx + 1 < len(parent.children)
        return prefix + content + ("\n" if has_next and not content.endswith("\n") else "")

    def _inline_code(self, node: Node, content: str) -> str:
        # code inside pre handled by the pre rule; a lone code child of pre
        # without siblings would be a code block — treat as inline elsewhere.
        # Turndown's hasSiblings = previousSibling || nextSibling counts ANY
        # sibling node, including whitespace text (never collapsed inside
        # pre), so '<pre> <code>ls</code></pre>' is INLINE code there —
        # count raw children, don't strip-filter them.
        if node.parent is not None and node.parent.tag == "pre":
            if len(node.parent.children) == 1:
                return content
        text = content
        if not text:
            return ""
        text = re.sub(r"\r?\n|\r", " ", text)
        extra = " " if re.search(r"^`|^ .*?[^ ].* $|`$", text) else ""
        delimiter = "`"
        matches = re.findall(r"`+", text)
        while delimiter in matches:
            delimiter += "`"
        return delimiter + extra + text + extra + delimiter


_EMITTER = MarkdownEmitter()


def html_to_markdown_raw(html: str) -> str:
    """Turndown-equivalent conversion of an HTML string (no cleaning)."""
    return _EMITTER.convert_document(html)


def node_to_markdown(node: Node) -> str:
    """Turndown-equivalent conversion of a DOM subtree (mutates the tree)."""
    return _EMITTER.convert_node(node)
