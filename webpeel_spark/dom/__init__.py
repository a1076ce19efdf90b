"""Dependency-free DOM + CSS selector engine for the extraction pipeline."""

from .core import (
    Node,
    parse_html,
    parse_fragment,
    parse_xml,
    document_body,
    document_head,
    document_html_el,
    VOID_TAGS,
)
from .selector import select, select_first, matches, compile_selector, BulkMatcher, PriorityMatcher

__all__ = [
    "Node",
    "parse_html",
    "parse_fragment",
    "parse_xml",
    "document_body",
    "document_head",
    "document_html_el",
    "VOID_TAGS",
    "BulkMatcher",
    "PriorityMatcher",
    "select",
    "select_first",
    "matches",
    "compile_selector",
]
