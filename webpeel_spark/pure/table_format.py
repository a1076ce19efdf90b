"""Unicode box-drawing table renderer (table-format.ts:1-176) plus the
listing output helpers built on it (cli/utils.ts:733-789,
cli/commands/fetch.ts:1180-1188).

Renders a list of row dicts (e.g. listing items) as an auto-sized
table — column order follows first-seen key order, entirely-empty
columns are omitted, cells truncate at 40 chars with an ellipsis."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

_MAX_COL_WIDTH = 40
_MIN_COL_WIDTH = 3


def _truncate(s: str, max_len: int) -> str:
    if len(s) <= max_len:
        return s
    return s[:max_len - 1] + "…"


def _pad_right(s: str, width: int) -> str:
    return s if len(s) >= width else s + " " * (width - len(s))


def _capitalise(s: str) -> str:
    return s[:1].upper() + s[1:] if s else s


def _derive_columns(rows: List[Dict[str, Optional[str]]]) -> List[str]:
    order: List[str] = []
    seen = set()
    for row in rows:
        for key in row:
            if key not in seen:
                seen.add(key)
                order.append(key)
    return [col for col in order
            if any((r.get(col) or "").strip() for r in rows)]


def format_table(rows: List[Dict[str, Optional[str]]],
                 columns: Optional[List[str]] = None) -> str:
    """Multi-line box-drawing table; '' for no rows / no columns."""
    if not rows:
        return ""
    cols = columns if columns is not None else _derive_columns(rows)
    if not cols:
        return ""

    headers = [_capitalise(c) for c in cols]
    widths = []
    for i, col in enumerate(cols):
        max_w = len(headers[i])
        for row in rows:
            val = row.get(col) or ""
            if len(val) > max_w:
                max_w = len(val)
        widths.append(max(_MIN_COL_WIDTH, min(max_w, _MAX_COL_WIDTH)))

    lines = []
    lines.append("┌" + "┬".join("─" * (w + 2) for w in widths) + "┐")
    lines.append("│" + "│".join(
        " " + _pad_right(_truncate(h, widths[i]), widths[i]) + " "
        for i, h in enumerate(headers)) + "│")
    lines.append("├" + "┼".join("─" * (w + 2) for w in widths) + "┤")
    for row in rows:
        lines.append("│" + "│".join(
            " " + _pad_right(_truncate(row.get(col) or "", widths[i]),
                             widths[i]) + " "
            for i, col in enumerate(cols)) + "│")
    lines.append("└" + "┴".join("─" * (w + 2) for w in widths) + "┘")
    return "\n".join(lines)


def render_listings_table(items: List[Dict[str, Optional[str]]]) -> str:
    """Listing items → box table (fetch.ts:1180-1188 --table path):
    None-valued keys are dropped per row before rendering."""
    return format_table([
        {k: v for k, v in item.items() if v is not None}
        for item in items
    ])


def _escape_csv(s: Optional[str]) -> str:
    if s is None:
        return '""'
    s = str(s)
    if '"' in s or "," in s or "\n" in s or "\r" in s:
        return '"' + s.replace('"', '""') + '"'
    return '"' + s + '"'


def format_listings_csv(items: List[Dict[str, Optional[str]]]) -> str:
    """cli/utils.ts:733 — listing items → CSV (all cells quoted, keys
    unioned in first-seen order, None cells empty-quoted)."""
    if not items:
        return ""
    keys: List[str] = []
    seen = set()
    for item in items:
        for k, v in item.items():
            if v is not None and k not in seen:
                seen.add(k)
                keys.append(k)
    lines = [",".join(keys)]
    for item in items:
        lines.append(",".join(_escape_csv(item.get(k)) for k in keys))
    return "\n".join(lines) + "\n"


def normalise_extracted_to_rows(extracted: Dict[str, Any]
                                ) -> List[Dict[str, Optional[str]]]:
    """cli/utils.ts:764 — flat extract result → row dicts: if every
    value is a list, zip them into rows (first list's length governs);
    otherwise one row, values stringified, None kept as None."""
    values = list(extracted.values())
    if values and all(isinstance(v, list) for v in values):
        length = len(values[0])
        rows = []
        for i in range(length):
            row = {}
            for key, vals in extracted.items():
                val = vals[i] if i < len(vals) else None
                row[key] = str(val) if val is not None else None
            rows.append(row)
        return rows
    return [{k: (str(v) if v is not None else None)
             for k, v in extracted.items()}]
