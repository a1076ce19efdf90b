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
    (?P<ws>\s*>\s*|\s+)               # combinator
  | (?P<tag>[a-zA-Z][\w-]*|\*)
  | \.(?P<cls>[\w-]+)
  | \#(?P<id>[\w-]+)
  | \[(?P<attr>[\w-]+)
        (?:(?P<op>[*^$|~]?=)
        (?P<q>["']?)(?P<val>[^\]"']*)(?P=q))?\]
  | :(?P<pseudo>not|empty|first-child|last-child)
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
                    cur_comb = ">" if ">" in m.group("ws") else " "
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
    idx = len(chain) - 2
    cur = node
    while idx >= 0:
        comb_right = chain[idx + 1][0]
        want = chain[idx][1]
        if comb_right == ">":
            parent = cur.parent
            if parent is None or not want.matches(parent):
                return False
            cur = parent
            idx -= 1
        else:  # descendant: any ancestor
            parent = cur.parent
            found = None
            while parent is not None:
                if want.matches(parent):
                    found = parent
                    break
                parent = parent.parent
            if found is None:
                return False
            cur = found
            idx -= 1
    return True


def select(root: Node, selector: str) -> List[Node]:
    """All descendant elements of ``root`` matching, in document order."""
    try:
        chains = compile_selector(selector)
    except ValueError:
        return []
    out = []
    for node in root.iter_elements():
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
