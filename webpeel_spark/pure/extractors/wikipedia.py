"""Wikipedia extractor — wikitable → markdown pipe tables.

Port of the HTML-based parts of ee/extractors/wikipedia.ts: content
cleanup (:10-23) and regex wikitable extraction (:33-135, header
detection in first 3 rows, colspan flatten ≤6, ``|`` escaping, 50-row
cap).  The reference's REST summary API call (:137-253) is
network-dependent and cannot run in batch executors; when the given
HTML contains no wikitables we return None so the generic readability
path handles the page — the same fallthrough the reference takes when
its API call fails.
"""

from __future__ import annotations

import re
from typing import List, Optional

MAX_TABLE_ROWS = 50

_TAG_RE = re.compile(r"<[^>]*>")


def _strip_html(text: str) -> str:
    """shared.ts:14-16 — tag strip + 6 entity decodes."""
    if not text:
        return ""
    return (
        _TAG_RE.sub("", text)
        .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", '"').replace("&#39;", "'").replace("&nbsp;", " ")
        .strip()
    )


def clean_wikipedia_content(content: str) -> str:
    content = re.sub(r"\[edit\]", "", content, flags=re.I)
    content = re.sub(r"\[\d+\]", "", content)
    content = re.sub(
        r"\[(citation needed|verification|improve this article|adding citations[^\]]*"
        r"|when\?|where\?|who\?|clarification needed|dubious[^\]]*"
        r"|failed verification[^\]]*|unreliable source[^\]]*)\]",
        "", content, flags=re.I,
    )
    content = re.sub(r"\[Learn how and when to remove this message\]", "", content, flags=re.I)
    content = re.sub(r"\n{3,}", "\n\n", content)
    return content.strip()


_ROW_RE = re.compile(r"<tr[^>]*>([\s\S]*?)</tr>", re.I)
_CELL_RE = re.compile(r"<t[hd][^>]*>([\s\S]*?)</t[hd]>", re.I)
_CELL_FULL_RE = re.compile(r"<t[hd][^>]*>[\s\S]*?</t[hd]>", re.I)
_COLSPAN_RE = re.compile(r"colspan=[\"']?(\d+)", re.I)
_TH_RE = re.compile(r"<th[\s>]", re.I)


def _parse_row(row_html: str) -> List[str]:
    cells: List[str] = []
    for m in _CELL_FULL_RE.finditer(row_html):
        cell_html = m.group(0)
        inner = _CELL_RE.match(cell_html)
        body = inner.group(1) if inner else ""
        colspan_m = _COLSPAN_RE.search(cell_html)
        span = min(int(colspan_m.group(1)), 6) if colspan_m else 1
        text = _strip_html(body).replace("|", "\\|").replace("\n", " ").strip()
        cells.append(text)
        for _ in range(1, span):
            cells.append("")
    return cells


def html_table_to_markdown(table_html: str) -> Optional[str]:
    rows = _ROW_RE.findall(table_html)
    row_fulls = [m.group(0) for m in re.finditer(r"<tr[^>]*>[\s\S]*?</tr>", table_html, re.I)]
    if len(row_fulls) < 2:
        return None

    header_idx = -1
    for i in range(min(len(row_fulls), 3)):
        if _TH_RE.search(row_fulls[i]):
            header_idx = i
            break

    if header_idx >= 0:
        headers = _parse_row(row_fulls[header_idx])
        data_start = header_idx + 1
    else:
        headers = _parse_row(row_fulls[0])
        data_start = 1

    if len(headers) < 2:
        return None
    if all(not h for h in headers):
        return None

    col_count = len(headers)
    md_lines = [
        "| " + " | ".join(h or " " for h in headers) + " |",
        "| " + " | ".join("---" for _ in headers) + " |",
    ]
    row_count = 0
    for r in range(data_start, len(row_fulls)):
        if row_count >= MAX_TABLE_ROWS:
            break
        cells = _parse_row(row_fulls[r])
        if not cells:
            continue
        while len(cells) < col_count:
            cells.append("")
        row = cells[:col_count]
        if all(not c for c in row):
            continue
        md_lines.append("| " + " | ".join(c or " " for c in row) + " |")
        row_count += 1

    if row_count == 0:
        return None

    trunc = (
        f"\n\n*Table truncated to {MAX_TABLE_ROWS} rows.*"
        if len(row_fulls) - data_start > MAX_TABLE_ROWS else ""
    )
    return "\n".join(md_lines) + trunc


_WIKITABLE_RE = re.compile(
    r'<table[^>]*class="[^"]*wikitable[^"]*"[^>]*>[\s\S]*?</table>', re.I
)
_CAPTION_RE = re.compile(r"<caption[^>]*>([\s\S]*?)</caption>", re.I)


def extract_wikitables(html: str) -> List[str]:
    tables: List[str] = []
    for m in _WIKITABLE_RE.finditer(html):
        full = m.group(0)
        if re.search(r"navbox|sidebar|metadata", full[:200], re.I):
            continue
        caption_m = _CAPTION_RE.search(full)
        caption = _strip_html(caption_m.group(1)).strip() if caption_m else ""
        md = html_table_to_markdown(full)
        if md:
            prefix = f"**{caption}**\n\n" if caption else ""
            tables.append(prefix + md)
    return tables


_TITLE_RE = re.compile(r"<h1[^>]*>([\s\S]*?)</h1>", re.I)


def wikipedia_extractor(html: str, url: str):
    from . import DomainExtractResult

    if not html:
        return None
    tables = extract_wikitables(html)
    if not tables:
        return None  # generic readability path handles prose-only pages

    title_m = _TITLE_RE.search(html)
    title = _strip_html(title_m.group(1)).strip() if title_m else ""
    header = f"# {title}\n\n" if title else ""
    clean_content = clean_wikipedia_content(header + "\n\n".join(tables))

    structured = {"title": title, "url": url, "tableCount": len(tables)}
    return DomainExtractResult("wikipedia.org", "wikipedia", structured, clean_content)
