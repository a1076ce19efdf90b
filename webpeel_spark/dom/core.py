"""Minimal DOM for server-side HTML extraction.

A from-scratch, dependency-free DOM.  Tokenization is a single
compiled-regex scanner (``fastparse.py`` — it replaced the original
stdlib ``html.parser`` backend for ~2× parse throughput, see BENCH.md);
tree construction lives here.  Plays the role cheerio (parse5) plays
in the reference engine
(/root/reference/src/core/readability.ts:571, markdown.ts:237): parse
malformed real-world HTML into a navigable, mutable tree that supports
the operations the extraction pipeline needs — select / text / remove /
replace / serialize.

Design notes
------------
* One Python object per element; text nodes are plain ``str`` entries in
  ``children`` (cheap, no wrapper objects on the hot path).
* The parser auto-closes the common HTML omissions (``<p>``, ``<li>``,
  table rows/cells, ``<dd>/<dt>``, ``<option>``) and recovers from stray
  end tags by scanning the open-element stack, mirroring parse5's
  forgiving behaviour closely enough for web-corpus HTML.
* ``text()`` includes script/style contents (cheerio semantics — callers
  clone + drop those tags first, exactly like the reference does).
"""

from __future__ import annotations

from html import escape as _escape_html
from html.parser import HTMLParser
from typing import Iterator, Optional

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

RAW_TEXT_TAGS = frozenset(("script", "style"))

# start tag -> set of open tags it implicitly closes (nearest first)
_AUTOCLOSE = {
    "p": frozenset(("p",)),
    "li": frozenset(("li",)),
    "tr": frozenset(("tr", "td", "th")),
    "td": frozenset(("td", "th")),
    "th": frozenset(("td", "th")),
    "dd": frozenset(("dd", "dt")),
    "dt": frozenset(("dd", "dt")),
    "option": frozenset(("option",)),
    "thead": frozenset(("tr", "td", "th")),
    "tbody": frozenset(("tr", "td", "th", "thead")),
    "tfoot": frozenset(("tr", "td", "th", "tbody")),
}

# tags that belong in <head> when no explicit structure exists
_HEAD_TAGS = frozenset(("title", "meta", "base"))

# block elements also close an open <p>
_P_CLOSERS = frozenset(
    "address article aside blockquote details div dl fieldset figcaption figure "
    "footer form h1 h2 h3 h4 h5 h6 header hr main menu nav ol p pre section "
    "table ul".split()
)


class Node:
    """An element node. Text children are plain ``str``."""

    __slots__ = ("tag", "attrs", "children", "parent", "_elements")

    def __init__(self, tag: str, attrs: Optional[dict] = None):
        self.tag = tag
        self.attrs: dict = attrs if attrs is not None else {}
        self.children: list = []
        self.parent: Optional["Node"] = None
        # memoized document-order descendant-element list (see
        # elements_list): populated by the first full materializing
        # walk, dropped for every ancestor on any element-membership
        # mutation (remove / replace_with_html / append_child).  Full
        # walks are the hottest loop in extraction (junk sweep, anchor
        # collection, selector engine) and most of them run on a tree
        # that hasn't mutated since the previous walk.
        self._elements: Optional[list] = None

    def _invalidate_up(self) -> None:
        """Drop cached element lists on self and every ancestor — the
        exact set whose descendant lists a membership change under
        ``self`` affects (detached subtrees keep their caches)."""
        n = self
        while n is not None:
            n._elements = None
            n = n.parent

    # ── attribute helpers ────────────────────────────────────────────
    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    @property
    def classes(self) -> list:
        return (self.attrs.get("class") or "").split()

    # ── tree navigation ──────────────────────────────────────────────
    def iter_elements(self) -> Iterator["Node"]:
        """All descendant elements, document order, self excluded.

        Served from the memoized list when one is cached (see
        elements_list).  Snapshot iteration is behavior-identical to
        the lazy walk for every consumer in this codebase: mutating
        consumers materialize the walk first (``select`` returns a
        list), and the lazy walk itself already visits subtrees of
        nodes removed mid-iteration (children are pushed on resume,
        after the consumer ran) — pinned by
        tests/test_dom.py::TestElementsCache."""
        els = self._elements
        if els is not None:
            yield from els
            return
        # list-comp (not genexpr) inside extend: one C-level pass, no
        # generator frame per node — this is the hottest loop in the
        # selector engine
        stack = [c for c in reversed(self.children) if isinstance(c, Node)]
        while stack:
            node = stack.pop()
            yield node
            if node.children:
                stack.extend(
                    [c for c in reversed(node.children) if isinstance(c, Node)])

    def elements_list(self) -> list:
        """Materialized ``iter_elements`` with memoization.  Callers
        must not mutate the returned list (they may mutate the TREE —
        that drops the cache via _invalidate_up without touching the
        list object an in-flight loop is reading)."""
        els = self._elements
        if els is None:
            els = []
            stack = [c for c in reversed(self.children) if isinstance(c, Node)]
            while stack:
                node = stack.pop()
                els.append(node)
                if node.children:
                    stack.extend(
                        [c for c in reversed(node.children)
                         if isinstance(c, Node)])
            self._elements = els
        return els

    def element_children(self) -> list:
        return [c for c in self.children if isinstance(c, Node)]

    def ancestors(self) -> Iterator["Node"]:
        node = self.parent
        while node is not None:
            yield node
            node = node.parent

    # ── content ──────────────────────────────────────────────────────
    def text(self) -> str:
        """Concatenated text of all descendants (cheerio ``.text()``)."""
        parts: list = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                parts.append(c)
            else:
                stack.extend(reversed(c.children))
        return "".join(parts)

    def own_text(self) -> str:
        return "".join(c for c in self.children if isinstance(c, str))

    # ── mutation ─────────────────────────────────────────────────────
    def remove(self) -> None:
        if self.parent is not None:
            self.parent._invalidate_up()
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    def replace_with_html(self, html: str) -> None:
        """Replace this node with nodes parsed from an HTML fragment."""
        if self.parent is None:
            return
        self.parent._invalidate_up()
        frag = parse_fragment(html)
        idx = self.parent.children.index(self)
        new_children = list(frag.children)
        for c in new_children:
            if isinstance(c, Node):
                c.parent = self.parent
        self.parent.children[idx : idx + 1] = new_children
        self.parent = None

    def replace_with_text(self, text: str) -> None:
        """Replace this node with a plain text child of its parent."""
        if self.parent is None:
            return
        self.parent._invalidate_up()
        idx = self.parent.children.index(self)
        self.parent.children[idx] = text
        self.parent = None

    def append_child(self, child) -> None:
        if isinstance(child, Node):
            child.parent = self
            self._invalidate_up()
        self.children.append(child)

    def clone(self) -> "Node":
        # direct appends: every node in the copy is fresh, so no element
        # cache can exist to invalidate (append_child would walk the
        # ancestor chain once per cloned node)
        n = Node(self.tag, dict(self.attrs))
        cc = n.children
        for c in self.children:
            if isinstance(c, Node):
                c2 = c.clone()
                c2.parent = n
                cc.append(c2)
            else:
                cc.append(c)
        return n

    # ── serialization ────────────────────────────────────────────────
    def html(self) -> str:
        """Outer HTML of this node."""
        out: list = []
        _serialize(self, out)
        return "".join(out)

    def inner_html(self) -> str:
        out: list = []
        raw = self.tag in RAW_TEXT_TAGS
        for c in self.children:
            if isinstance(c, str):
                out.append(c if raw else _escape_text(c))
            else:
                _serialize(c, out)
        return "".join(out)

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Node {self.tag} {self.attrs!r} kids={len(self.children)}>"


def _escape_text(s: str) -> str:
    if "&" in s or "<" in s or ">" in s:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return s


def _serialize(node: Node, out: list) -> None:
    tag = node.tag
    out.append("<")
    out.append(tag)
    for k, v in node.attrs.items():
        out.append(" ")
        out.append(k)
        out.append('="')
        out.append(_escape_html(v if v is not None else "", quote=True))
        out.append('"')
    out.append(">")
    if tag in VOID_TAGS:
        return
    raw = tag in RAW_TEXT_TAGS
    for c in node.children:
        if isinstance(c, str):
            out.append(c if raw else _escape_text(c))
        else:
            _serialize(c, out)
    out.append("</")
    out.append(tag)
    out.append(">")


class _TreeBuilder(HTMLParser):
    def __init__(self, fragment: bool = False, xml: bool = False):
        super().__init__(convert_charrefs=True)
        self.fragment = fragment
        self.xml = xml
        self.root = Node("#root")
        self.stack: list = [self.root]
        self._html: Optional[Node] = None
        self._head: Optional[Node] = None
        self._body: Optional[Node] = None

    # document-mode structural targets -------------------------------
    def _ensure_structure(self) -> None:
        if self._html is None:
            self._html = Node("html")
            self.root.append_child(self._html)
        if self._head is None:
            self._head = Node("head")
            self._html.append_child(self._head)
        if self._body is None:
            self._body = Node("body")
            self._html.append_child(self._body)

    def _target(self) -> Node:
        return self.stack[-1]

    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        attr_dict: dict = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k] = v if v is not None else ""

        if self.xml:
            node = Node(tag, attr_dict)
            # parser-internal fast append (see handle_starttag below):
            # no cache can exist mid-parse
            parent = self._target()
            node.parent = parent
            parent.children.append(node)
            self.stack.append(node)
            return

        if not self.fragment:
            if tag == "html":
                self._ensure_structure()
                self._html.attrs.update(attr_dict)
                return
            if tag == "head":
                self._ensure_structure()
                self.stack.append(self._head)
                return
            if tag == "body":
                self._ensure_structure()
                self._body.attrs.update(attr_dict)
                self.stack.append(self._body)
                return

        # implicit closes
        if tag in _AUTOCLOSE:
            closers = _AUTOCLOSE[tag]
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t in closers:
                    del self.stack[i:]
                    break
                if t not in ("a", "b", "i", "em", "strong", "span", "font", "u",
                             "small", "s", "code", "sub", "sup", "p", "li",
                             "td", "th", "tr", "dd", "dt", "option"):
                    break
        elif tag in _P_CLOSERS:
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == "p":
                    del self.stack[i:]
                    break

        node = Node(tag, attr_dict)
        parent = self._resolve_parent(tag)
        # parser-internal fast append: no cache can exist mid-parse, so
        # skip append_child's _invalidate_up ancestor walk (this runs
        # once per element — the hottest allocation site in extraction)
        node.parent = parent
        parent.children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def _resolve_parent(self, tag: str) -> Node:
        cur = self._target()
        if not self.fragment and cur is self.root:
            self._ensure_structure()
            if tag in _HEAD_TAGS and not self._body.children:
                return self._head
            if tag in ("link", "style") and not self._body.children:
                return self._head
            return self._body
        return cur

    def handle_startendtag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        if tag in VOID_TAGS:
            self.handle_starttag(tag, attrs)
            return
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if self.xml:
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == tag:
                    del self.stack[i:]
                    return
            return
        if tag in VOID_TAGS:
            return
        if not self.fragment and tag in ("html", "head", "body"):
            # pop back to the corresponding structural level
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == tag:
                    del self.stack[i:]
                    return
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data: str) -> None:
        if not data:
            return
        cur = self._target()
        if not self.fragment and cur is self.root:
            if not data.strip():
                return
            self._ensure_structure()
            cur = self._body
        # merge adjacent text nodes
        if cur.children and isinstance(cur.children[-1], str):
            cur.children[-1] += data
        else:
            cur.children.append(data)

    def handle_comment(self, data: str) -> None:
        pass  # comments are dropped (they never affect extraction output)

    def handle_decl(self, decl: str) -> None:
        pass


def parse_html(html: str) -> Node:
    """Parse an HTML document; always yields #root > html > (head, body).

    Tokenization is the single-regex fast path (dom/fastparse.py) —
    event-equivalent to ``html.parser`` with convert_charrefs, ~1.5×
    faster; equivalence pinned over the full corpus in
    tests/test_fastparse.py."""
    from .fastparse import fast_feed

    builder = _TreeBuilder(fragment=False)
    try:
        fast_feed(builder, html)
    except Exception:
        pass  # keep whatever tree was built — per-row error isolation
    builder._ensure_structure()
    return builder.root


def parse_html_stdlib(html: str) -> Node:
    """stdlib-HTMLParser tokenization path (equivalence reference)."""
    builder = _TreeBuilder(fragment=False)
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass
    builder._ensure_structure()
    return builder.root


def parse_fragment(html: str) -> Node:
    """Parse an HTML fragment; returns a #root whose children are the nodes."""
    from .fastparse import fast_feed

    builder = _TreeBuilder(fragment=True)
    try:
        fast_feed(builder, html)
    except Exception:
        pass
    return builder.root


def parse_xml(xml: str) -> Node:
    """Parse XML (RSS/Atom): no void tags, no HTML structure synthesis."""
    from .fastparse import fast_feed

    builder = _TreeBuilder(fragment=True, xml=True)
    try:
        fast_feed(builder, xml, xml=True)
    except Exception:
        pass
    return builder.root


def document_body(root: Node) -> Optional[Node]:
    for c in root.iter_elements():
        if c.tag == "body":
            return c
    return None


def document_head(root: Node) -> Optional[Node]:
    for c in root.iter_elements():
        if c.tag == "head":
            return c
    return None


def document_html_el(root: Node) -> Optional[Node]:
    for c in root.children:
        if isinstance(c, Node) and c.tag == "html":
            return c
    return None
