"""Transcript export formatters (transcript-export.ts:22-131).

SRT / plain-text / Markdown / JSON renderings of transcript segments
({text, start, duration}).  The transcripts themselves come from a
network source in the reference (youtube.ts — N/A); the formatters are
pure and also have an all-Catalyst twin in operators/transcripts.py
for corpus-scale formatting.
"""

from __future__ import annotations

import json
import math
from typing import Any, Dict, List


def format_srt_timestamp(seconds: float) -> str:
    """transcript-export.ts:22 — HH:MM:SS,mmm.  Math.round is
    half-UP (Python's round is banker's: 0.0005 s must become 1 ms,
    not 0)."""
    total_ms = math.floor(max(0.0, seconds) * 1000 + 0.5)
    ms = total_ms % 1000
    total_sec = total_ms // 1000
    s = total_sec % 60
    total_min = total_sec // 60
    m = total_min % 60
    h = total_min // 60
    return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"


def format_readable_timestamp(seconds: float) -> str:
    """transcript-export.ts:43 — M:SS or H:MM:SS."""
    total_sec = int(max(0.0, seconds))
    h = total_sec // 3600
    m = (total_sec % 3600) // 60
    s = total_sec % 60
    if h > 0:
        return f"{h}:{m:02d}:{s:02d}"
    return f"{m}:{s:02d}"


def to_srt(segments: List[Dict[str, Any]]) -> str:
    """transcript-export.ts:72."""
    if not segments:
        return ""
    blocks = []
    for i, seg in enumerate(segments):
        start = format_srt_timestamp(seg["start"])
        end = format_srt_timestamp(seg["start"] + max(0.0, seg["duration"]))
        blocks.append(f"{i + 1}\n{start} --> {end}\n{seg['text']}")
    return "\n\n".join(blocks)


def to_txt(segments: List[Dict[str, Any]]) -> str:
    """transcript-export.ts:88."""
    return "\n".join(seg["text"] for seg in segments)


def to_markdown_doc(title: str, channel: str,
                    segments: List[Dict[str, Any]]) -> str:
    """transcript-export.ts:100."""
    lines = [f"# {title or 'Transcript'}", ""]
    if channel:
        lines += [f"**Channel:** {channel}", ""]
    lines += ["## Transcript", ""]
    for seg in segments:
        ts = format_readable_timestamp(seg["start"])
        lines.append(f"**[{ts}]** {seg['text']}")
    return "\n".join(lines)


def to_json(result: Dict[str, Any]) -> str:
    """transcript-export.ts:129 — JSON.stringify(result, null, 2)."""
    return json.dumps(result, indent=2, ensure_ascii=False)
