"""Structured interactive-element map — "eyes" on a page for agents.

Port of the reference's observe feature (``src/core/observe.ts``):
the in-page extraction logic (observe.ts:95-322 — selector building,
role inference, per-tag attribute capture, per-category collection,
refs, summary) is pure DOM work and ported faithfully over the repo's
DOM engine.  The browser-runtime parts (getBoundingClientRect
viewport/bbox math, computed-style visibility, screenshots,
observe.ts:353-495) have no static-HTML meaning: here ``in_viewport``
is always False and ``bbox`` absent, and visibility falls back to the
static signals (hidden attribute, inline display:none /
visibility:hidden on the element or an ancestor).  The summary omits
the trailing elapsed-ms sentence (deterministic output).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

from ..dom import Node, parse_html, select, select_first

_WS = re.compile(r"\s+")
_HIDDEN_STYLE = re.compile(
    r"display\s*:\s*none|visibility\s*:\s*hidden", re.IGNORECASE)


def _css_escape(s: str) -> str:
    """CSS.escape semantics for the printable range: ASCII chars other
    than [A-Za-z0-9_-] are backslash-escaped (U+0080+ pass through;
    the control-char code-point form is irrelevant for HTML attrs)."""
    out = []
    for i, ch in enumerate(s):
        if ch.isascii() and not (ch.isalnum() or ch in "_-"):
            out.append("\\" + ch)
        elif ch.isdigit() and i == 0:
            out.append(f"\\3{ch} ")
        else:
            out.append(ch)
    return "".join(out)


def _is_visible(el: Node) -> bool:
    node: Optional[Node] = el
    while node is not None:
        if node.get("hidden") is not None:
            return False
        style = node.get("style") or ""
        if style and _HIDDEN_STYLE.search(style):
            return False
        node = node.parent
    return True


def _get_text(el: Node) -> str:
    aria = el.get("aria-label")
    if aria:
        return aria.strip()[:120]
    text = _WS.sub(" ", el.text().strip())
    if text and len(text) <= 120:
        return text
    if text:
        return text[:117] + "..."
    if el.tag == "input":
        return el.get("value") or el.get("placeholder") or ""
    return el.get("title") or el.get("alt") or ""


def _build_selector(root: Node, el: Node) -> str:
    """Best-effort targeting selector: id > data-testid > aria-label >
    name > short href > unique tag.class > parent>tag path
    (observe.ts:163-210)."""
    el_id = el.get("id")
    if el_id:
        return f"#{_css_escape(el_id)}"
    test_id = el.get("data-testid")
    if test_id:
        return f'[data-testid="{_css_escape(test_id)}"]'
    aria = el.get("aria-label")
    if aria:
        return f'{el.tag}[aria-label="{_css_escape(aria)}"]'
    name = el.get("name")
    if name:
        return f'{el.tag}[name="{_css_escape(name)}"]'
    if el.tag == "a":
        href = el.get("href")
        if href and len(href) < 100:
            return f'a[href="{_css_escape(href)}"]'
    cls = (el.get("class") or "").strip().split()
    if cls:
        candidate = f"{el.tag}.{cls[0]}"
        try:
            if len(select(root, f"{el.tag}.{_css_escape(cls[0])}")) == 1:
                return candidate
        except ValueError:
            pass
    parent = el.parent
    if parent is not None:
        siblings = [c for c in parent.element_children() if c.tag == el.tag]
        if len(siblings) == 1:
            pid = parent.get("id")
            if pid:
                return f"#{_css_escape(pid)} > {el.tag}"
            return f"{parent.tag} > {el.tag}"
        idx = siblings.index(el) + 1
        pid = parent.get("id")
        if pid:
            return f"#{_css_escape(pid)} > {el.tag}:nth-of-type({idx})"
    return el.tag


def _get_role(el: Node) -> str:
    explicit = el.get("role")
    if explicit:
        return explicit
    tag = el.tag
    if tag == "a":
        return "link"
    if tag == "button":
        return "button"
    if tag == "input":
        itype = el.get("type") or "text"
        return {"submit": "submit", "checkbox": "checkbox",
                "radio": "radio", "file": "file-upload",
                "search": "search"}.get(itype, "textbox")
    if tag == "textarea":
        return "textbox"
    if tag == "select":
        return "listbox"
    if tag in ("form", "img", "video", "audio"):
        return {"form": "form", "img": "image", "video": "video",
                "audio": "audio"}[tag]
    return tag


def _get_attributes(el: Node) -> Dict[str, str]:
    attrs: Dict[str, str] = {}
    tag = el.tag
    if tag == "a":
        href = el.get("href")
        if href:
            attrs["href"] = href[:200]
        if el.get("target") == "_blank":
            attrs["target"] = "_blank"
    if tag == "input":
        attrs["type"] = el.get("type") or "text"
        for k in ("placeholder", "name"):
            v = el.get(k)
            if v:
                attrs[k] = v
        if el.get("required") is not None:
            attrs["required"] = "true"
        if el.get("disabled") is not None:
            attrs["disabled"] = "true"
        v = el.get("value")
        if v:
            attrs["value"] = v[:50]
    if tag == "select":
        options = [o.text().strip()
                   for o in select(el, "option")][:5]
        if options:
            attrs["options"] = " | ".join(options)
        if el.get("name"):
            attrs["name"] = el.get("name")
    if tag == "textarea":
        for k in ("placeholder", "name"):
            v = el.get(k)
            if v:
                attrs[k] = v
    if tag == "form":
        action = el.get("action")
        if action:
            attrs["action"] = action[:200]
        method = el.get("method")
        if method:
            attrs["method"] = method
        attrs["fields"] = str(len(select(
            el, "input, select, textarea, button")))
    if tag == "img":
        alt = el.get("alt")
        if alt:
            attrs["alt"] = alt[:120]
        src = el.get("src")
        if src:
            attrs["src"] = src[:200]
    if tag in ("video", "audio"):
        src = el.get("src")
        if src:
            attrs["src"] = src[:200]
    return attrs


_CATEGORY_SELECTORS = [
    ("links", "a[href]"),
    ("buttons", 'button, [role="button"], input[type="submit"], '
                'input[type="button"]'),
    ("inputs", 'input:not([type="hidden"]):not([type="submit"])'
               ':not([type="button"]), textarea'),
    ("selects", "select"),
    ("forms", "form"),
    ("media", "img[src], video, audio, iframe[src]"),
]
_REF_PREFIX = {"links": "link", "buttons": "button", "inputs": "input",
               "selects": "select", "forms": "form", "media": "media"}


def observe_html(html: str, url: str = "", selector: Optional[str] = None,
                 max_elements: int = 50) -> Dict:
    """Structured map of interactive elements from static HTML:
    {url, title, elements{links,buttons,inputs,selects,forms,media},
    totalElements, summary}."""
    root = parse_html(html or "")
    # browser semantics (the reference runs in-page): the `type`
    # attribute matches selectors ASCII-case-insensitively and
    # HTMLInputElement.type lowercases — normalize once on our own
    # fresh tree so '<input TYPE="SUBMIT">' categorizes as a button
    # with role 'submit' exactly as in the browser (observe.ts:220,316)
    for el in root.iter_elements():
        if el.tag == "input":
            t = el.get("type")
            if t is not None and t != t.lower():
                el.attrs["type"] = t.lower()
    scope = root
    if selector:
        scope = select_first(root, selector) or root

    title_el = select_first(root, "title")
    title = title_el.text().strip() if title_el is not None else ""

    elements: Dict[str, List[Dict]] = {}
    for category, sel in _CATEGORY_SELECTORS:
        found = [el for el in select(scope, sel) if _is_visible(el)]
        prefix = _REF_PREFIX[category]
        elements[category] = [
            {"ref": f"{prefix}-{i}",
             "tag": el.tag,
             "selector": _build_selector(root, el),
             "text": _get_text(el),
             "role": _get_role(el),
             "attributes": _get_attributes(el),
             "inViewport": False}
            for i, el in enumerate(found[:max_elements])
        ]

    total = sum(len(v) for v in elements.values())

    parts = [f"{len(elements[c])} {c}" for c, _ in _CATEGORY_SELECTORS
             if elements[c]]
    key_actions = []
    for btn in elements["buttons"][:3]:
        if btn["text"]:
            key_actions.append(f'[{btn["ref"]}] "{btn["text"]}"')
    for inp in elements["inputs"][:2]:
        label = (inp["text"] or inp["attributes"].get("placeholder")
                 or inp["attributes"].get("name") or "text field")
        key_actions.append(
            f'[{inp["ref"]}] {label} '
            f'({inp["attributes"].get("type", "text")})')

    summary = f'Page: "{title}" — {", ".join(parts)}'
    if key_actions:
        summary += f'. Key actions: {", ".join(key_actions)}'
    summary += "."

    return {"url": url, "title": title, "elements": elements,
            "totalElements": total, "summary": summary}
