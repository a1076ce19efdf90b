"""Watch-mode change primitives (watch-manager.ts:65-168).

The WatchManager's pure logic layer: a whitespace-normalized SHA-256
content fingerprint, a set-based line diff (the ``?diff=true`` response
shape), and a paragraph-level diff used for webhook alert payloads.
The Postgres CRUD surrounding these in the reference is N/A here — the
engine's analog is the change-detection join over extraction snapshots
(operators/extract.py) and the stateful streaming tracker.
"""

from __future__ import annotations

import hashlib
import math
import re
from typing import Dict, List, NamedTuple

_WS = re.compile(r"\s+")


def compute_fingerprint(content: str) -> str:
    """watch-manager.ts:131 — SHA-256 hex of trim+whitespace-collapsed
    content, so cosmetic-only reformatting doesn't trigger alerts."""
    normalized = _WS.sub(" ", content.strip())
    return hashlib.sha256(normalized.encode("utf-8")).hexdigest()


class LineDiff(NamedTuple):
    changed: bool
    added: List[str]
    removed: List[str]
    summary: str
    change_percent: int


def compute_line_diff(old_content: str, new_content: str) -> LineDiff:
    """watch-manager.ts:95 — set-based line diff (blank lines dropped;
    added/removed keep first-seen order; percent vs the larger set)."""
    old_lines = dict.fromkeys(
        l for l in old_content.split("\n") if l.strip())
    new_lines = dict.fromkeys(
        l for l in new_content.split("\n") if l.strip())

    added = [l for l in new_lines if l not in old_lines]
    removed = [l for l in old_lines if l not in new_lines]

    max_len = max(len(old_lines), len(new_lines))
    change_percent = 0 if max_len == 0 else min(
        100, math.floor((len(added) + len(removed)) / max_len * 100 + 0.5))

    changed = bool(added or removed)
    if not changed:
        summary = "No changes detected."
    elif change_percent < 5:
        summary = f"Minor wording changes ({change_percent}% changed)"
    else:
        parts = []
        if added:
            parts.append(f"{len(added)} line{'s' if len(added) != 1 else ''} added")
        if removed:
            parts.append(f"{len(removed)} line{'s' if len(removed) != 1 else ''} removed")
        summary = ", ".join(parts)

    return LineDiff(changed, added, removed, summary, change_percent)


def compute_paragraph_diff(old_content: str,
                           new_content: str) -> Dict[str, List[str]]:
    """watch-manager.ts:142 — paragraph blocks (split on blank lines,
    trimmed, >10 chars only) exclusive to each version, 500-char cap."""
    def to_set(text: str) -> Dict[str, None]:
        return dict.fromkeys(
            p for p in (b.strip() for b in re.split(r"\n{2,}", text))
            if len(p) > 10)

    old_set = to_set(old_content)
    new_set = to_set(new_content)
    return {
        "added_text": [p[:500] for p in new_set if p not in old_set],
        "removed_text": [p[:500] for p in old_set if p not in new_set],
    }
