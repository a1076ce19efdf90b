"""Pure output helpers from the CLI shell (cli/utils.ts).

The CLI module is 800 LoC of terminal shell (colors, commander help,
stdout plumbing — N/A), but five helpers inside it are pure data
logic the batch engine reuses: CSV rendering with the reference's
exact quoting, extracted-object → row normalization, the branding
color/font regex extractors, and relative-time formatting.  Ported so
an export produced here is byte-identical to the reference CLI's
``--csv`` output for the same rows.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from .structured_extract import _js_str


def format_listings_csv(items: List[Dict[str, Optional[str]]]) -> str:
    """cli/utils.ts:733-759 — header from union of defined keys in
    first-seen order; EVERY cell quoted; embedded quotes doubled."""
    if not items:
        return ""
    keys: List[str] = []
    seen = set()
    for item in items:
        for k, v in item.items():
            if v is not None and k not in seen:
                seen.add(k)
                keys.append(k)

    def escape(s: Optional[str]) -> str:
        if s is None:
            return '""'
        return '"' + _js_str(s).replace('"', '""') + '"'

    lines = [",".join(keys)]
    for item in items:
        lines.append(",".join(escape(item.get(k)) for k in keys))
    return "\n".join(lines) + "\n"


def normalise_extracted_to_rows(
        extracted: Dict[str, Any]) -> List[Dict[str, Optional[str]]]:
    """cli/utils.ts:765-791 — zip same-shaped arrays into rows (ragged
    arrays yield None cells, like JS undefined indexing), else one
    row of stringified scalars."""
    values = list(extracted.values())
    if values and all(isinstance(v, list) for v in values):
        length = len(values[0])
        rows: List[Dict[str, Optional[str]]] = []
        for i in range(length):
            row: Dict[str, Optional[str]] = {}
            for key, arr in extracted.items():
                val = arr[i] if i < len(arr) else None
                row[key] = _js_str(val) if val is not None else None
            rows.append(row)
        return rows
    return [{k: (_js_str(v) if v is not None else None)
             for k, v in extracted.items()}]


def extract_colors(content: str) -> List[str]:
    """cli/utils.ts:794-802 — unique #hex colors, first 10."""
    import re

    matches = re.findall(r"#[0-9A-Fa-f]{6}|#[0-9A-Fa-f]{3}", content or "")
    out: List[str] = []
    for m in matches:
        if m not in out:
            out.append(m)
    return out[:10]


def extract_fonts(content: str) -> List[str]:
    """cli/utils.ts:805-813 — unique font-family values, first 5."""
    import re

    fonts: List[str] = []
    for m in re.finditer(r"font-family:\s*([^;}\"'\n]+)", content or "",
                         re.I):
        f = m.group(1).strip()
        fonts.append(f)
    out: List[str] = []
    for f in fonts:
        if f not in out:
            out.append(f)
    return out[:5]


def _js_round(x: float) -> int:
    """Math.round — half toward +∞, unlike Python's banker's round."""
    import math

    return math.floor(x + 0.5)


def format_relative_time(past_ms: float, now_ms: float) -> str:
    """cli/utils.ts:473-484 with the clock injected (Date.now() →
    now_ms) so batch reports are reproducible."""
    diff_sec = _js_round((now_ms - past_ms) / 1000)
    if diff_sec < 60:
        return f"{diff_sec}s ago"
    diff_min = _js_round(diff_sec / 60)
    if diff_min < 60:
        return f"{diff_min}m ago"
    diff_hr = _js_round(diff_min / 60)
    if diff_hr < 24:
        return f"{diff_hr}h ago"
    return f"{_js_round(diff_hr / 24)}d ago"
