"""Prompt-injection defense (port of prompt-guard.ts).

Defensive sanitization of untrusted web content before it enters an
LLM context: zero-width-char stripping, HTML-comment/hidden-element
removal, injection-pattern flagging, newline-run collapse.  The
extraction pipeline replaces content with the sanitized form only when
an injection pattern was detected (pipeline.ts:1651-1656).
"""

from __future__ import annotations

import re
from typing import Dict, List

INJECTION_PATTERNS = [
    (re.compile(r"ignore\s+(all\s+)?(previous|prior|above|earlier)\s+(instructions?|rules?|prompts?|guidelines?)", re.I), "instruction-override"),
    (re.compile(r"ignore\s+rules?", re.I), "instruction-override"),
    (re.compile(r"override\s+rules?", re.I), "instruction-override"),
    (re.compile(r"disregard\s+(all\s+)?(previous|prior|above|earlier)\s+(instructions?|rules?|prompts?)", re.I), "disregard-instructions"),
    (re.compile(r"forget\s+(all\s+)?(previous|prior|above|earlier)\s+(instructions?|rules?|prompts?)", re.I), "forget-instructions"),
    (re.compile(r"override\s+(system|previous|all)\s+(prompt|instructions?|rules?)", re.I), "override-system"),
    (re.compile(r"new\s+(system\s+)?(instructions?|rules?|prompt|role|persona|identity)", re.I), "new-instructions"),
    (re.compile(r"you\s+are\s+now\s+(a|an)\s+", re.I), "role-hijack"),
    (re.compile(r"\[?\s*(SYSTEM|ASSISTANT|USER|HUMAN|AI)\s*\]?\s*:", re.I), "fake-role-tag"),
    (re.compile(r"---\s*END\s+OF\s+(SOURCES?|CONTEXT|CONTENT|INPUT)\s*---", re.I), "fake-delimiter"),
    (re.compile(r"</?(?:system|assistant|user|instruction|prompt|context)>", re.I), "fake-xml-tag"),
    (re.compile(r"(?:output|reveal|show|display|print|repeat|echo)\s+(?:your|the)\s+(?:system\s+)?(?:prompt|instructions?|rules?|guidelines?)", re.I), "prompt-extraction"),
    (re.compile(r"what\s+(?:are|were)\s+your\s+(?:original\s+)?(?:instructions?|prompt|rules?|guidelines?)", re.I), "prompt-query"),
    (re.compile(r"!\[.*?\]\(https?://[^)]*(?:steal|exfil|leak|collect|log|track)[^)]*\)", re.I), "markdown-exfil"),
    (re.compile(r"<!--[\s\S]*?(?:instruction|ignore|override|system|prompt|inject)[\s\S]*?-->", re.I), "html-comment-injection"),
    (re.compile(r"<[^>]*style\s*=\s*\"[^\"]*display\s*:\s*none[^\"]*\"[^>]*>[\s\S]*?</[^>]+>", re.I), "hidden-element"),
]

ZERO_WIDTH_RE = re.compile(
    "[\u200B\u200C\u200D\u200E\u200F\uFEFF\u2060\u2061\u2062"
    "\u2063\u2064\u206A-\u206F]"
    "|\U000E0000|\U000E0001|[\U000E0020-\U000E007F]")


# Pattern gating for the clean-content fast path. Each entry:
# (pattern, name, required_substring_of_lowercased_content_or_None).
# The gate substring is a REQUIRED literal of the pattern (single word,
# no internal whitespace — immune to \s+ flexibility), so gating never
# changes the result; None means always scan.
_NOUN_GATE = ("instruction", "rule", "prompt", "guideline", "role",
              "persona", "identity")
_NAME_GATES = {
    "markdown-exfil": ("![",),
    "html-comment-injection": ("<!--",),
    "hidden-element": ("display",),
    "fake-xml-tag": ("<",),
    "role-hijack": ("you",),    # `you\s+are\s+now` requires the word
    "fake-role-tag": (":",),    # trailing colon is a required literal
    "fake-delimiter": ("end",),
}
_GATED_PATTERNS = []
for _p, _n in INJECTION_PATTERNS:
    if _n in _NAME_GATES:
        _gate = _NAME_GATES[_n]
    else:
        # instruction-override / disregard / forget / override-system /
        # new-instructions / prompt-extraction / prompt-query all
        # require one of these nouns
        _gate = _NOUN_GATE
    _GATED_PATTERNS.append((_p, _n, _gate))

# distinct gate tuples, so each substring scan runs once per document
# instead of once per pattern (most patterns share _NOUN_GATE)
_DISTINCT_GATES = tuple({id(g): g for _, _, g in _GATED_PATTERNS if g}.values())


def sanitize_for_llm(content: str) -> Dict:
    """prompt-guard.ts:53-97 — returns content / injection_detected /
    detected_patterns / stripped_chars.  Output identical to the
    ungated form; the substring gates only skip no-op regex passes."""
    detected: List[str] = []
    sanitized = content
    stripped = 0

    if ZERO_WIDTH_RE.search(sanitized):
        zw = ZERO_WIDTH_RE.findall(sanitized)
        stripped += len(zw)
        sanitized = ZERO_WIDTH_RE.sub("", sanitized)

    if "<!--" in sanitized:
        sanitized = re.sub(r"<!--[\s\S]*?-->", "", sanitized)
    if "<" in sanitized:
        sanitized = re.sub(
            r"<[^>]*style\s*=\s*\"[^\"]*display\s*:\s*none[^\"]*\"[^>]*>[\s\S]*?</[^>]+>",
            "", sanitized, flags=re.I)
        sanitized = re.sub(r"<[^>]*hidden[^>]*>[\s\S]*?</[^>]+>", "",
                           sanitized, flags=re.I)

    lower = sanitized.lower()
    gate_open = {id(g): any(s in lower for s in g) for g in _DISTINCT_GATES}
    for pattern, name, gate in _GATED_PATTERNS:
        if gate is not None and not gate_open[id(gate)]:
            continue
        if pattern.search(sanitized):
            detected.append(name)

    if "\n\n\n\n\n" in sanitized:
        sanitized = re.sub(r"\n{5,}", "\n\n\n", sanitized)

    return {"content": sanitized, "injection_detected": bool(detected),
            "detected_patterns": detected, "stripped_chars": stripped}
