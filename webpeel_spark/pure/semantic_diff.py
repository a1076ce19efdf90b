"""Semantic snapshot diff (diff.ts:39-277 — the pure core).

The reference's /diff endpoint fetches a URL, loads the previous
snapshot, and computes a structured diff: field-by-field (dot-notation
paths) for JSON content, LCS-sectioned (grouped under the nearest
markdown heading) for text.  The fetch/snapshot plumbing is the
change-tracking join in this engine; this module is the diff
computation itself, faithful to the reference's JS semantics
(JSON.stringify equality — key ORDER matters; the ``line ~N`` section
label quirk; the 5,000-line cap).
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

_HEADING_RE = re.compile(r"^#{1,6}\s")
_MAX_LINES = 5_000


class DiffChange(NamedTuple):
    type: str                 # 'added' | 'removed' | 'modified'
    field: Optional[str]      # JSON diffs: dot-notation path
    path: Optional[str]       # text diffs: section heading / line ref
    before: Optional[str]
    after: Optional[str]


def _js_json(v: Any) -> str:
    """JSON.stringify twin: no whitespace, insertion order preserved
    (two dicts with reordered keys compare UNEQUAL, as in JS)."""
    return json.dumps(v, separators=(",", ":"), ensure_ascii=False)


def _stringify(v: Any) -> str:
    """diff.ts:126 — strings verbatim, everything else JSON."""
    if isinstance(v, str):
        return v
    return _js_json(v)


def _is_plain_object(v: Any) -> bool:
    return isinstance(v, dict)


def diff_json(before: Any, after: Any, path: str = "",
              fields: Optional[List[str]] = None) -> List[DiffChange]:
    """diff.ts:61 — recursive dot-notation field diff with an optional
    field allowlist (a filter path keeps itself, its subtree, and its
    ancestors in scope)."""
    changes: List[DiffChange] = []

    if not _is_plain_object(before) or not _is_plain_object(after):
        if _js_json(before) != _js_json(after):
            if (not fields
                    or any(f == path or path.startswith(f + ".")
                           for f in fields)):
                changes.append(DiffChange("modified", path or "(root)",
                                          None, _stringify(before),
                                          _stringify(after)))
        return changes

    all_keys = dict.fromkeys([*before.keys(), *after.keys()])
    for key in all_keys:
        full_path = f"{path}.{key}" if path else key
        if fields:
            in_scope = any(full_path == f or full_path.startswith(f + ".")
                           or f.startswith(full_path + ".") for f in fields)
            if not in_scope:
                continue
        b_has, a_has = key in before, key in after
        b_val = before.get(key)
        a_val = after.get(key)
        if not b_has and a_has:
            changes.append(DiffChange("added", full_path, None, None,
                                      _stringify(a_val)))
        elif b_has and not a_has:
            changes.append(DiffChange("removed", full_path, None,
                                      _stringify(b_val), None))
        elif _js_json(b_val) != _js_json(a_val):
            if _is_plain_object(b_val) and _is_plain_object(a_val):
                changes.extend(diff_json(b_val, a_val, full_path, fields))
            else:
                changes.append(DiffChange("modified", full_path, None,
                                          _stringify(b_val),
                                          _stringify(a_val)))
    return changes


class TextDiffStats(NamedTuple):
    lines_added: int
    lines_removed: int


def diff_text(before_text: str,
              after_text: str) -> Tuple[List[DiffChange], TextDiffStats]:
    """diff.ts:143 — LCS line diff, runs grouped into sections keyed by
    the nearest preceding markdown heading among unchanged lines."""
    b_lines = before_text.split("\n")[:_MAX_LINES]
    a_lines = after_text.split("\n")[:_MAX_LINES]
    m, n = len(b_lines), len(a_lines)

    lcs = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(1, m + 1):
        bi = b_lines[i - 1]
        row, prev = lcs[i], lcs[i - 1]
        for j in range(1, n + 1):
            if bi == a_lines[j - 1]:
                row[j] = prev[j - 1] + 1
            else:
                row[j] = prev[j] if prev[j] >= row[j - 1] else row[j - 1]

    ops: List[Tuple[str, str]] = []
    bi_i, ai_i = m, n
    while bi_i > 0 or ai_i > 0:
        if bi_i > 0 and ai_i > 0 and b_lines[bi_i - 1] == a_lines[ai_i - 1]:
            ops.append(("same", a_lines[ai_i - 1]))
            bi_i -= 1
            ai_i -= 1
        elif ai_i > 0 and (bi_i == 0
                           or lcs[bi_i][ai_i - 1] >= lcs[bi_i - 1][ai_i]):
            ops.append(("add", a_lines[ai_i - 1]))
            ai_i -= 1
        else:
            ops.append(("del", b_lines[bi_i - 1]))
            bi_i -= 1
    ops.reverse()

    changes: List[DiffChange] = []
    lines_added = lines_removed = 0
    i = 0
    while i < len(ops):
        if ops[i][0] == "same":
            i += 1
            continue
        added: List[str] = []
        removed: List[str] = []
        while i < len(ops) and ops[i][0] != "same":
            op, line = ops[i]
            if op == "add":
                added.append(line)
            elif op == "del":
                removed.append(line)
            i += 1
        lines_added += len(added)
        lines_removed += len(removed)

        # nearest heading among preceding unchanged lines; the default
        # label uses the post-run index (reference quirk kept)
        section_label = f"line ~{i}"
        for k in range(i - len(added) - len(removed) - 1, -1, -1):
            op, line = ops[k]
            if op == "same" and _HEADING_RE.match(line):
                section_label = line.strip()
                break

        if removed and added:
            changes.append(DiffChange("modified", None, section_label,
                                      "\n".join(removed), "\n".join(added)))
        elif added:
            changes.append(DiffChange("added", None, section_label, None,
                                      "\n".join(added)))
        elif removed:
            changes.append(DiffChange("removed", None, section_label,
                                      "\n".join(removed), None))

    return changes, TextDiffStats(lines_added, lines_removed)


def build_summary(changes: List[DiffChange], mode: str,
                  json_total_fields: Optional[int] = None,
                  text_stats: Optional[TextDiffStats] = None) -> str:
    """diff.ts:228."""
    if not changes:
        return "No changes detected."
    if mode == "json":
        unchanged = max(0, (json_total_fields or 0) - len(changes))
        parts = [f"{len(changes)} field{'' if len(changes) == 1 else 's'}"
                 f" changed"]
        if unchanged > 0:
            parts.append(f"{unchanged} unchanged")
        return ", ".join(parts) + "."
    sections = len(changes)
    added = text_stats.lines_added if text_stats else 0
    removed = text_stats.lines_removed if text_stats else 0
    return (f"{sections} section{'' if sections == 1 else 's'} changed"
            + (f", {added} lines added" if added > 0 else "")
            + (f", {removed} removed" if removed > 0 else "") + ".")


def count_total_fields(a: Any, b: Any) -> int:
    """diff.ts:260 — distinct dot-notation keys across both values."""
    keys: set = set()
    _collect_keys(a, "", keys)
    _collect_keys(b, "", keys)
    return len(keys)


def _collect_keys(obj: Any, prefix: str, acc: set) -> None:
    if not isinstance(obj, dict):
        if prefix:
            acc.add(prefix)
        return
    for key in obj:
        path = f"{prefix}.{key}" if prefix else key
        acc.add(path)
        _collect_keys(obj[key], path, acc)


def semantic_diff(before: str, after: str,
                  fields: Optional[List[str]] = None) -> Dict[str, Any]:
    """diff.ts public flow minus fetch/snapshot: JSON mode when BOTH
    sides parse as JSON objects/values, else text mode."""
    try:
        b_parsed = json.loads(before)
        a_parsed = json.loads(after)
        is_json = True
    except (json.JSONDecodeError, TypeError):
        is_json = False
    if is_json:
        changes = diff_json(b_parsed, a_parsed, "", fields)
        summary = build_summary(changes, "json",
                                count_total_fields(b_parsed, a_parsed))
        stats = None
    else:
        changes, stats = diff_text(before or "", after or "")
        summary = build_summary(changes, "text", text_stats=stats)
    return {
        "changed": bool(changes),
        "mode": "json" if is_json else "text",
        "changes": changes,
        "summary": summary,
        "lines_added": stats.lines_added if stats else 0,
        "lines_removed": stats.lines_removed if stats else 0,
    }
