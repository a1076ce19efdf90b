"""Tiny CSS selector engine for the extraction DOM.

Supports exactly the selector grammar the webpeel-equivalent pipeline
uses (see /root/reference/src/core/markdown.ts:10-55, readability.ts,
metadata.ts): compound selectors of ``tag``, ``.class``, ``#id``,
``[attr]``, ``[attr="v"]``, ``[attr*="v"]``, ``[attr^="v"]``,
``[attr$="v"]``, ``:empty``, ``:not(<compound>)``; combinators
descendant (space) and child (``>``); comma-separated lists.

Compiled selectors are memoized; matching walks the document once per
query, returning elements in document order.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import List, Optional, Tuple

from .core import Node

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s*[>~+]\s*|\s+)           # combinator (>, ~, +, descendant)
  | (?P<tag>[a-zA-Z][\w-]*|\*)
  | \.(?P<cls>[\w-]+)
  | \#(?P<id>[\w-]+)
  | \[(?P<attr>[\w-]+)
        (?:(?P<op>[*^$|~]?=)
        (?P<q>["']?)(?P<val>[^\]"']*)(?P=q))?\]
  | :(?P<pseudo>not|empty|first-child|last-child|nth-child)
        (?:\((?P<parg>[^)]*)\))?
    """,
    re.VERBOSE,
)


class Simple:
    __slots__ = ("tag", "classes", "ids", "attrs", "pseudos")

    def __init__(self):
        self.tag: Optional[str] = None
        self.classes: List[str] = []
        self.ids: List[str] = []
        self.attrs: List[Tuple[str, str, str]] = []  # (name, op, value)
        self.pseudos: List[Tuple[str, object]] = []

    def matches(self, node: Node) -> bool:
        if self.tag is not None and self.tag != "*" and node.tag != self.tag:
            return False
        if self.classes:
            cl = node.classes
            for c in self.classes:
                if c not in cl:
                    return False
        if self.ids:
            nid = node.attrs.get("id")
            for i in self.ids:
                if nid != i:
                    return False
        for name, op, val in self.attrs:
            actual = node.attrs.get(name)
            if actual is None:
                return False
            if op == "":
                continue
            if op == "=":
                if actual != val:
                    return False
            elif op == "*=":
                if val not in actual:
                    return False
            elif op == "^=":
                if not actual.startswith(val):
                    return False
            elif op == "$=":
                if not actual.endswith(val):
                    return False
            elif op == "~=":
                if val not in actual.split():
                    return False
            elif op == "|=":
                if actual != val and not actual.startswith(val + "-"):
                    return False
        for pname, parg in self.pseudos:
            if pname == "empty":
                if any(
                    (isinstance(c, Node)) or (isinstance(c, str) and c != "")
                    for c in node.children
                ):
                    return False
            elif pname == "not":
                if parg is not None and parg.matches(node):  # type: ignore[union-attr]
                    return False
            elif pname == "first-child":
                p = node.parent
                if p is None:
                    return False
                sibs = [c for c in p.children if isinstance(c, Node)]
                if not sibs or sibs[0] is not node:
                    return False
            elif pname == "last-child":
                p = node.parent
                if p is None:
                    return False
                sibs = [c for c in p.children if isinstance(c, Node)]
                if not sibs or sibs[-1] is not node:
                    return False
            elif pname == "nth-child":
                p = node.parent
                if p is None or parg is None:
                    return False
                sibs = [c for c in p.children if isinstance(c, Node)]
                try:
                    want_idx = int(parg)  # numeric form only (1-based)
                except ValueError:
                    return False
                if want_idx < 1 or len(sibs) < want_idx \
                        or sibs[want_idx - 1] is not node:
                    return False
        return True


def _parse_compound_text(text: str) -> Simple:
    chains = _parse_selector_list(text)
    # a :not() argument is a single compound
    return chains[0][0][1]


def _parse_selector_list(selector: str):
    """Parse into list of chains; chain = [(combinator, Simple), ...]."""
    result = []
    for part in _split_commas(selector):
        chain: List[Tuple[str, Simple]] = []
        cur = Simple()
        cur_comb = " "
        has_any = False
        pos = 0
        part = part.strip()
        while pos < len(part):
            m = _TOKEN_RE.match(part, pos)
            if not m:
                raise ValueError(f"bad selector: {selector!r} at {pos}")
            pos = m.end()
            if m.group("ws") is not None:
                if has_any:
                    chain.append((cur_comb, cur))
                    cur = Simple()
                    has_any = False
                    ws = m.group("ws")
                    cur_comb = (">" if ">" in ws else
                                "~" if "~" in ws else
                                "+" if "+" in ws else " ")
                continue
            has_any = True
            if m.group("tag"):
                cur.tag = m.group("tag").lower()
            elif m.group("cls"):
                cur.classes.append(m.group("cls"))
            elif m.group("id"):
                cur.ids.append(m.group("id"))
            elif m.group("attr"):
                op = m.group("op") or ""
                val = m.group("val") or ""
                cur.attrs.append((m.group("attr").lower(), op, val))
            elif m.group("pseudo"):
                pname = m.group("pseudo")
                parg = m.group("parg")
                if pname == "not" and parg:
                    cur.pseudos.append(("not", _parse_compound_text(parg)))
                elif pname == "nth-child":
                    cur.pseudos.append(("nth-child",
                                        (parg or "").strip()))
                else:
                    cur.pseudos.append((pname, None))
        if has_any:
            chain.append((cur_comb, cur))
        if chain:
            result.append(chain)
    return result


def _split_commas(selector: str) -> List[str]:
    parts = []
    depth = 0
    buf = []
    for ch in selector:
        if ch == "(" or ch == "[":
            depth += 1
        elif ch == ")" or ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return parts


@lru_cache(maxsize=4096)
def compile_selector(selector: str):
    return _parse_selector_list(selector)


def _chain_matches(chain, node: Node) -> bool:
    comb, simple = chain[-1]
    if not simple.matches(node):
        return False
    return _match_rest(chain, len(chain) - 2, node)


def _match_rest(chain, idx: int, cur: Node) -> bool:
    """Right-to-left match with BACKTRACKING on the multi-candidate
    combinators: ``~`` and descendant must try EVERY candidate
    (nearest first), not only the nearest — greedy binding gave false
    negatives vs css-select on chains like ``x + b ~ c`` where the
    nearest ``b`` fails the remaining steps but a farther one matches.
    Nearest-first keeps the old single-probe cost whenever the greedy
    choice succeeds (the overwhelmingly common case)."""
    if idx < 0:
        return True
    comb_right = chain[idx + 1][0]
    want = chain[idx][1]
    if comb_right == ">":
        parent = cur.parent
        return (parent is not None and want.matches(parent)
                and _match_rest(chain, idx - 1, parent))
    if comb_right == "+":
        parent = cur.parent
        if parent is None:
            return False
        sibs = [c for c in parent.children if isinstance(c, Node)]
        pos = next((i for i, s in enumerate(sibs) if s is cur), -1)
        if pos <= 0 or not want.matches(sibs[pos - 1]):
            return False
        return _match_rest(chain, idx - 1, sibs[pos - 1])
    if comb_right == "~":
        parent = cur.parent
        if parent is None:
            return False
        sibs = [c for c in parent.children if isinstance(c, Node)]
        pos = next((i for i, s in enumerate(sibs) if s is cur), -1)
        if pos <= 0:
            return False
        return any(
            want.matches(s) and _match_rest(chain, idx - 1, s)
            for s in reversed(sibs[:pos]))
    # descendant: try every matching ancestor, nearest first
    parent = cur.parent
    while parent is not None:
        if want.matches(parent) and _match_rest(chain, idx - 1, parent):
            return True
        parent = parent.parent
    return False


def _single_simple(chains):
    """The lone Simple of a one-chain, one-step selector list, else None
    (fast-path eligibility: no combinators, no alternatives)."""
    if len(chains) == 1 and len(chains[0]) == 1:
        return chains[0][0][1]
    return None


def select(root: Node, selector: str) -> List[Node]:
    """All descendant elements of ``root`` matching, in document order."""
    try:
        chains = compile_selector(selector)
    except ValueError:
        return []
    simple = _single_simple(chains)
    if simple is not None:
        # same predicate, same walk order — just no per-node chain
        # dispatch; tag-only selectors ("table", "a") reduce further to
        # a bare tag compare
        if (simple.tag is not None and simple.tag != "*"
                and not simple.classes and not simple.ids
                and not simple.attrs and not simple.pseudos):
            tag = simple.tag
            return [n for n in root.elements_list() if n.tag == tag]
        return [n for n in root.elements_list() if simple.matches(n)]
    out = []
    for node in root.elements_list():
        for chain in chains:
            if _chain_matches(chain, node):
                out.append(node)
                break
    return out


def select_first(root: Node, selector: str) -> Optional[Node]:
    try:
        chains = compile_selector(selector)
    except ValueError:
        return None
    simple = _single_simple(chains)
    if simple is not None:
        for node in root.iter_elements():
            if simple.matches(node):
                return node
        return None
    for node in root.iter_elements():
        for chain in chains:
            if _chain_matches(chain, node):
                return node
    return None


def matches(node: Node, selector: str) -> bool:
    try:
        chains = compile_selector(selector)
    except ValueError:
        return False
    return any(_chain_matches(chain, node) for chain in chains)


class BulkMatcher:
    """Match a node against MANY selectors in near-constant time.

    The junk-selector sweep (markdown.ts:10-55 → pure/markdown.py
    JUNK_SELECTORS) ran one full tree walk per selector — 60+ walks per
    document, the #1 hot spot in the extraction profile.  This compiles
    the selector list once into dispatch buckets (tag set, exact-class
    set, one alternation regex over the class attribute, id buckets,
    role set) so a single walk with one ``matches(node)`` call per node
    covers the whole list.  Selectors that don't fit a fast bucket fall
    back to the generic chain matcher — semantics are the exact union
    of the individual selectors.
    """

    __slots__ = ("tags", "exact_classes", "ids", "roles",
                 "class_re", "id_re", "general")

    def __init__(self, selectors):
        self.tags = set()
        self.exact_classes = set()
        self.ids = set()
        self.roles = set()
        class_substr = []
        id_substr = []
        self.general = []
        for sel in selectors:
            for chain in compile_selector(sel):
                s = chain[0][1] if len(chain) == 1 else None
                if s is None or s.pseudos:
                    self.general.append(chain)
                    continue
                n_feats = ((s.tag is not None) + len(s.classes)
                           + len(s.ids) + len(s.attrs))
                if n_feats != 1:
                    self.general.append(chain)
                elif s.tag is not None and s.tag != "*":
                    self.tags.add(s.tag)
                elif len(s.classes) == 1:
                    self.exact_classes.add(s.classes[0])
                elif len(s.ids) == 1:
                    self.ids.add(s.ids[0])
                elif len(s.attrs) == 1:
                    name, op, val = s.attrs[0]
                    if name == "class" and op == "*=":
                        class_substr.append(val)
                    elif name == "id" and op == "*=":
                        id_substr.append(val)
                    elif name == "role" and op == "=":
                        self.roles.add(val)
                    else:
                        self.general.append(chain)
                else:
                    self.general.append(chain)
        self.class_re = (re.compile("|".join(map(re.escape, class_substr)))
                         if class_substr else None)
        self.id_re = (re.compile("|".join(map(re.escape, id_substr)))
                      if id_substr else None)

    def matches(self, node: Node) -> bool:
        if node.tag in self.tags:
            return True
        attrs = node.attrs
        cls = attrs.get("class")
        if cls:
            if self.class_re is not None and self.class_re.search(cls):
                return True
            if self.exact_classes and not self.exact_classes.isdisjoint(cls.split()):
                return True
        nid = attrs.get("id")
        if nid:
            if nid in self.ids:
                return True
            if self.id_re is not None and self.id_re.search(nid):
                return True
        if self.roles and attrs.get("role") in self.roles:
            return True
        for chain in self.general:
            if _chain_matches(chain, node):
                return True
        return False

    def select(self, root: Node) -> List[Node]:
        # elements_list: memoized full walk (these sweeps run on trees
        # that usually haven't mutated since the previous full walk)
        return [n for n in root.elements_list() if self.matches(n)]


class PriorityMatcher:
    """First document-order match for EACH selector of an ordered list,
    found in a single tree walk.

    Replaces N sequential ``select_first`` calls (N full walks) for
    priority lists like the 30-entry main-content selector chain
    (markdown.ts:416-493).  Chains are bucketed by their rightmost
    discriminator (tag / class token / id / attr name); each node only
    verifies the chains its features could match, so per-node cost is
    near-constant.  Result per index is identical to
    ``select_first(root, selectors[i])``.
    """

    __slots__ = ("n", "by_tag", "by_class", "by_id", "by_attr", "universal")

    def __init__(self, selectors):
        self.n = len(selectors)
        self.by_tag = {}
        self.by_class = {}
        self.by_id = {}
        self.by_attr = {}
        self.universal = []
        for idx, sel in enumerate(selectors):
            for chain in compile_selector(sel):
                s = chain[-1][1]
                entry = (idx, chain)
                if s.tag is not None and s.tag != "*":
                    self.by_tag.setdefault(s.tag, []).append(entry)
                elif s.classes:
                    self.by_class.setdefault(s.classes[0], []).append(entry)
                elif s.ids:
                    self.by_id.setdefault(s.ids[0], []).append(entry)
                elif s.attrs:
                    self.by_attr.setdefault(s.attrs[0][0], []).append(entry)
                else:
                    self.universal.append(entry)

    def first_matches(self, root: Node) -> dict:
        """{selector_index: first matching node in document order}."""
        found: dict = {}
        remaining = self.n
        for node in root.iter_elements():
            cands = []
            bucket = self.by_tag.get(node.tag)
            if bucket:
                cands.extend(bucket)
            attrs = node.attrs
            if self.by_class and attrs.get("class"):
                for tok in node.classes:
                    bucket = self.by_class.get(tok)
                    if bucket:
                        cands.extend(bucket)
            if self.by_id:
                nid = attrs.get("id")
                if nid:
                    bucket = self.by_id.get(nid)
                    if bucket:
                        cands.extend(bucket)
            if self.by_attr:
                for name in self.by_attr:
                    if name in attrs:
                        cands.extend(self.by_attr[name])
            if self.universal:
                cands.extend(self.universal)
            for idx, chain in cands:
                if idx not in found and _chain_matches(chain, node):
                    found[idx] = node
                    remaining -= 1
            if remaining <= 0:
                break
        return found
