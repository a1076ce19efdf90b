"""Metadata extraction chains + JS-compatible date shims.

Pure-Python reimplementation of /root/reference/src/core/metadata.ts:
concatenated-title fix (:14-32), title/description/author chains
(:38-99), publish-date chain with ``new Date().toISOString()``
normalization (:105-145), language chain (:150-164), word count
(:169-187), og:image/canonical (:220-244), link extraction (:250-282),
image extraction (:292-402) and the head-only parse optimization
(:409-421).

The date shims reproduce the two JS behaviours embedded in the
reference's output format: ``Date.prototype.toISOString`` and
``toLocaleDateString('en-US', {year:'numeric', month:'long',
day:'numeric'})`` (readability.ts:622).
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timezone, timedelta
from functools import lru_cache
from typing import Dict, List, NamedTuple, Optional
from urllib.parse import urlsplit

from .jstext import JS_WS
from .urlfast import whatwg_urljoin

from ..dom import Node, parse_html, select, select_first

# ── JS date shims ─────────────────────────────────────────────────────────

_MONTHS = {
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5, "june": 6,
    "july": 7, "august": 8, "september": 9, "october": 10, "november": 11,
    "december": 12,
}
_MONTH_ABBR = {k[:3]: v for k, v in _MONTHS.items()}
_MONTH_NAMES = ["January", "February", "March", "April", "May", "June", "July",
                "August", "September", "October", "November", "December"]

_ISO_RE = re.compile(
    r"^(\d{4})-(\d{2})(?:-(\d{2}))?"
    r"(?:[T ](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{1,6}))?)?"
    r"(Z|[+-]\d{2}:?\d{2})?)?$"
)

# shared legacy time tail: optional ", " separator, H:MM[:SS[.fff]],
# optional AM/PM, optional named zone and/or ±hhmm offset — the forms
# V8's legacy parser accepts after any date ("Jan 5 2024 1:02:03 PM",
# "... 10:00:00 GMT+0500", "... 10:00 EST")
_TIME_TAIL = (
    r"(?:[,]?\s+(?P<th>\d{1,2}):(?P<tm>\d{2})"
    r"(?::(?P<ts>\d{2})(?:\.(?P<tf>\d{1,6}))?)?"
    r"(?:\s*(?P<ampm>[AaPp])\.?[Mm]\.?)?"
    r"(?:\s*(?P<zone>GMT|UTC?|Z|EST|EDT|CST|CDT|MST|MDT|PST|PDT))?"
    r"(?:\s*(?P<off>[+-]\d{2}:?\d{2}))?)?\s*$")

# US timezone abbreviations V8's keyword table recognizes
_ZONE_HOURS = {"GMT": 0, "UT": 0, "UTC": 0, "Z": 0, "EST": -5, "EDT": -4,
               "CST": -6, "CDT": -5, "MST": -7, "MDT": -6, "PST": -8,
               "PDT": -7}

# optional leading words (weekday or any token — V8 skips unknown
# words before the month: 'Foo Aug 15 2023' parses)
_LEAD = r"^(?:[A-Za-z]+[.,]?\s+)*?"

_US_DATE_RE = re.compile(r"^(\d{1,2})/(\d{1,2})/(\d{4})" + _TIME_TAIL)
_YMD_SLASH_RE = re.compile(r"^(\d{4})/(\d{1,2})/(\d{1,2})" + _TIME_TAIL)
_WORDY_RE = re.compile(
    _LEAD + r"([A-Za-z]+)\.?\s+(\d{1,2})(?:st|nd|rd|th)?,?\s+(\d{4})"
    + _TIME_TAIL)
_WORDY2_RE = re.compile(
    _LEAD + r"(\d{1,2})\s+([A-Za-z]+)\.?,?\s+(\d{2,4})" + _TIME_TAIL)
_MONTH_YEAR_RE = re.compile(_LEAD + r"([A-Za-z]+)\.?,?\s+(\d{4})"
                            + _TIME_TAIL)
_BARE_NUM_RE = re.compile(r"^(\d+)$")
_LOOSE_ISO_RE = re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2})" + _TIME_TAIL)
_EXPANDED_YEAR_RE = re.compile(r"^\+(\d{6})(-.*)$")
_TWITTER_DATE_RE = re.compile(
    r"^[A-Za-z]{3}\s+([A-Za-z]{3})\s+(\d{1,2})\s+(\d{2}):(\d{2}):(\d{2})"
    r"\s+([+-]\d{4})\s+(\d{4})$")


def _make_dt(year: int, month: int, day: int, hour: int = 0,
             minute: int = 0, sec: int = 0,
             micro: int = 0) -> Optional[datetime]:
    """V8 MakeDay/MakeTime semantics: month 1-12 and day 1-31 are hard
    bounds, but a day past the month's end ROLLS OVER ('2023-02-29' →
    Mar 1, '2023-02-31' → Mar 3); hour 24 rolls only as 24:00.  Years
    outside datetime's 1-9999 return None (documented margin — Node
    serializes year 0 and ±expanded years the stdlib can't hold)."""
    if not (1 <= month <= 12 and 1 <= day <= 31):
        return None
    if not (0 <= minute <= 59 and 0 <= sec <= 59):
        return None
    if not (0 <= hour <= 23 or (hour == 24 and minute == 0 and sec == 0)):
        return None
    if not (1 <= year <= 9999):
        return None
    base = datetime(year, month, 1, tzinfo=timezone.utc)
    try:
        return base + timedelta(days=day - 1, hours=hour, minutes=minute,
                                seconds=sec, microseconds=micro)
    except OverflowError:
        return None


def _apply_tail(m, year: int, month: int, day: int) -> Optional[datetime]:
    """Build a datetime from a date triple plus a _TIME_TAIL match."""
    h = int(m.group("th")) if m.group("th") else 0
    mi = int(m.group("tm")) if m.group("tm") else 0
    s = int(m.group("ts")) if m.group("ts") else 0
    frac = m.group("tf") or ""
    micro = int((frac + "000000")[:6]) if frac else 0
    ampm = m.group("ampm")
    if ampm:
        if not 1 <= h <= 12:
            return None
        h = h % 12 + (12 if ampm.lower() == "p" else 0)
    dt = _make_dt(year, month, day, h, mi, s, micro)
    if dt is None:
        return None
    zone, off = m.group("zone"), m.group("off")
    if zone:
        dt -= timedelta(hours=_ZONE_HOURS[zone.upper().rstrip()])
    if off:
        sign = 1 if off[0] == "+" else -1
        o = off[1:].replace(":", "")
        dt -= sign * timedelta(hours=int(o[:2]), minutes=int(o[2:4]))
    return dt


def _month_num(word: str) -> Optional[int]:
    w = word.lower()
    full = _MONTHS.get(w)
    if full:
        return full
    # V8 matches keywords by their first 3 chars ('sept' → Sep)
    return _MONTH_ABBR.get(w[:3]) if len(w) >= 3 else None


def _parse_js_date(s: str) -> Optional[datetime]:
    """Parse a date string the way ``new Date(s)`` does (round 9:
    parity pinned against tests/golden/jsdate_node.json, TZ=UTC Node
    recordings — curated formats + seeded fuzz).

    Date-only ISO strings are UTC; date-times without a zone are
    treated as UTC (the reference runs in UTC containers).  Covers
    V8's MakeDay day-overflow rollover ('2023-02-29' → Mar 1), bare
    numeric windowing ('0' → 2000, '12' → Dec 2001, '50' → 1950),
    skipped leading words, 12h AM/PM and named-US-zone/±hhmm time
    tails, month-year forms, Y/M/D slashes and +NNNNNN expanded years.
    Documented margins (all Node-recorded in the fixture, each
    excluded there by name): years outside datetime's 1-9999, and
    ``:60`` seconds in legacy forms (V8 re-tokenizes those into
    year-capture nonsense).  Returns None when JS would yield an
    Invalid Date (the callers catch & skip)."""
    s = s.strip()
    if not s:
        return None
    m = _EXPANDED_YEAR_RE.match(s)
    if m and len(m.group(2)) > 1 and m.group(2)[1].isdigit():
        # '+002023-08-15…' → ISO expanded year; representable ones
        # re-parse as the plain 4-digit form
        year = int(m.group(1))
        if year > 9999:
            return None
        return _parse_js_date(f"{year:04d}{m.group(2)}")
    m = _ISO_RE.match(s)
    if m:
        year, month = int(m.group(1)), int(m.group(2))
        day = int(m.group(3)) if m.group(3) else 1
        hour = int(m.group(4)) if m.group(4) else 0
        minute = int(m.group(5)) if m.group(5) else 0
        sec = int(m.group(6)) if m.group(6) else 0
        frac = m.group(7) or ""
        micro = int((frac + "000000")[:6]) if frac else 0
        dt = _make_dt(year, month, day, hour, minute, sec, micro)
        if dt is None:
            return None
        tz = m.group(8)
        if tz and tz != "Z":
            sign = 1 if tz[0] == "+" else -1
            tzs = tz[1:].replace(":", "")
            offs = timedelta(hours=int(tzs[:2]), minutes=int(tzs[2:4] or 0))
            dt = dt - sign * offs
        return dt
    m = _US_DATE_RE.match(s)
    if m:
        return _apply_tail(m, int(m.group(3)), int(m.group(1)),
                           int(m.group(2)))
    m = _YMD_SLASH_RE.match(s)
    if m:
        # '2023/08/15': a first number >31 makes V8 read Y/M/D
        return _apply_tail(m, int(m.group(1)), int(m.group(2)),
                           int(m.group(3)))
    m = _TWITTER_DATE_RE.match(s)
    if m:
        # "Wed Oct 10 20:19:24 +0000 2018" (Twitter legacy created_at;
        # year trails the offset so the wordy chains can't see it)
        mon = _MONTH_ABBR.get(m.group(1).lower())
        if mon:
            dt = _make_dt(int(m.group(7)), mon, int(m.group(2)),
                          int(m.group(3)), int(m.group(4)),
                          int(m.group(5)))
            if dt is None:
                return None
            tz = m.group(6)
            sign = 1 if tz[0] == "+" else -1
            offs = timedelta(hours=int(tz[1:3]), minutes=int(tz[3:5]))
            return dt - sign * offs
        return None
    m = _WORDY_RE.match(s)
    if m:
        mon = _month_num(m.group(1))
        if mon:
            return _apply_tail(m, int(m.group(3)), mon, int(m.group(2)))
    m = _WORDY2_RE.match(s)
    if m:
        mon = _month_num(m.group(2))
        if mon:
            year = int(m.group(3))
            if year < 50:
                year += 2000  # JS two-digit year windowing
            elif year < 100:
                year += 1900
            return _apply_tail(m, year, mon, int(m.group(1)))
    m = _MONTH_YEAR_RE.match(s)
    if m:
        # 'Aug 2023' → first of the month
        mon = _month_num(m.group(1))
        if mon:
            return _apply_tail(m, int(m.group(2)), mon, 1)
    m = _BARE_NUM_RE.match(s)
    if m:
        # V8's bare-number ladder: '2021' → year; '0'/'00' → 2000;
        # '12' → Dec 2001 (1-12 read as a month); 13-31 invalid;
        # 32-49 → 20xx; 50-99 → 19xx; '0000'+ (4+ digits) literal year
        v = int(m.group(1))
        if len(m.group(1)) >= 4 or v >= 100:
            return _make_dt(v, 1, 1)
        if 1 <= v <= 12:
            return _make_dt(2001, v, 1)
        if 13 <= v <= 31:
            return None
        if v == 0:
            return _make_dt(2000, 1, 1)
        return _make_dt(2000 + v if v < 50 else 1900 + v, 1, 1)
    m = _LOOSE_ISO_RE.match(s)
    if m:
        # '2023-1-5' (single-digit month/day, optional loose time):
        # V8's legacy parser accepts it; UTC per the container rule
        return _apply_tail(m, int(m.group(1)), int(m.group(2)),
                           int(m.group(3)))
    return None


def js_to_iso(s: str) -> Optional[str]:
    """``new Date(s).toISOString()`` — YYYY-MM-DDTHH:MM:SS.sssZ or None."""
    dt = _parse_js_date(s)
    if dt is None:
        return None
    ms = dt.microsecond // 1000
    # manual year formatting: strftime %Y drops leading zeros for
    # years < 1000 on glibc, Node always pads to 4
    return (f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}"
            f"T{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}.{ms:03d}Z")


def js_date_to_locale_en_us(s: str) -> Optional[str]:
    """``toLocaleDateString('en-US', {year,month:'long',day})`` shim."""
    dt = _parse_js_date(s)
    if dt is None:
        return None
    return f"{_MONTH_NAMES[dt.month - 1]} {dt.day}, {dt.year}"


# ── title fix (metadata.ts:14-32) ─────────────────────────────────────────

_CONCAT_TITLE_RE = re.compile(r"^(.+[a-z])([A-Z][a-z].+)$")


def clean_concatenated_title(title: str) -> str:
    if not title:
        return title
    m = _CONCAT_TITLE_RE.match(title)
    if m:
        part1, part2 = m.group(1), m.group(2)
        if len(part1) > 10 and len(part2) > 10:
            return part2
    return title


# ── extraction chains ─────────────────────────────────────────────────────

_META_SEL_RE = re.compile(r'^meta\[([\w-]+)="([^"]+)"\]$')


@lru_cache(maxsize=4)
def _meta_index(root: Node) -> dict:
    """All meta tags of a tree in ONE walk: (attr, value) → content of
    the FIRST matching element (exactly select_first semantics for the
    `meta[attr="value"]` selectors the chains use — profiled: the
    chains issue ~17 meta lookups per page, each a full tree walk
    without this).  Keyed on tree identity; maxsize bounds how many
    short-lived trees stay referenced."""
    idx: dict = {}
    for el in root.iter_elements():
        if el.tag == "meta":
            content = el.get("content")
            for attr in ("property", "name", "itemprop", "http-equiv"):
                v = el.get(attr)
                if v is not None and (attr, v) not in idx:
                    idx[(attr, v)] = content
    return idx


def _meta(root: Node, selector: str) -> Optional[str]:
    m = _META_SEL_RE.match(selector)
    if m:
        return _meta_index(root).get((m.group(1), m.group(2)))
    el = select_first(root, selector)
    if el is None:
        return None
    return el.get("content")


def extract_title(root: Node) -> str:
    title = _meta(root, 'meta[property="og:title"]')
    if title:
        return title.strip()
    title = _meta(root, 'meta[name="twitter:title"]')
    if title:
        return title.strip()
    # $('title').text() concatenates EVERY title element's text,
    # including inline-SVG icon <title>s (metadata.ts:48)
    t = "".join(el.text() for el in select(root, "title"))
    if t:
        return clean_concatenated_title(t.strip())
    el = select_first(root, "h1")
    if el is not None and el.text():
        return el.text().strip()
    return ""


def extract_description(root: Node) -> Optional[str]:
    for sel in ('meta[property="og:description"]', 'meta[name="twitter:description"]',
                'meta[name="description"]'):
        desc = _meta(root, sel)
        if desc:
            return desc.strip()
    return None


def extract_author(root: Node) -> Optional[str]:
    for sel in ('meta[property="article:author"]', 'meta[property="og:article:author"]',
                'meta[name="author"]', 'meta[name="twitter:creator"]'):
        author = _meta(root, sel)
        if author:
            return author.strip()
    return None


def extract_publish_date(root: Node) -> Optional[str]:
    for sel in ('meta[property="article:published_time"]', 'meta[name="date"]',
                'meta[property="og:updated_time"]'):
        v = _meta(root, sel)
        if v:
            iso = js_to_iso(v)
            if iso:
                return iso
    time_el = select_first(root, "time[pubdate], time[datetime][pubdate]")
    if time_el is not None:
        dtv = time_el.get("datetime") or time_el.get("content")
        if dtv:
            iso = js_to_iso(dtv)
            if iso:
                return iso
    for el in select(root, 'script[type="application/ld+json"]'):
        try:
            obj = json.loads(el.text() or "{}")
        except Exception:
            continue
        date = None
        if isinstance(obj, dict):
            date = obj.get("datePublished") or obj.get("publishDate")
            if not date and isinstance(obj.get("@graph"), list):
                for n in obj["@graph"]:
                    if isinstance(n, dict) and n.get("datePublished"):
                        date = n["datePublished"]
                        break
        if date:
            iso = js_to_iso(str(date))
            if iso:
                return iso
    return None


def extract_published(root: Node) -> Optional[str]:
    for sel in ('meta[property="article:published_time"]',
                'meta[itemprop="datePublished"]'):
        v = _meta(root, sel)
        if v:
            iso = js_to_iso(v)
            if iso:
                return iso
    return None


def extract_language(root: Node) -> Optional[str]:
    html_el = select_first(root, "html")
    if html_el is not None and html_el.get("lang"):
        return html_el.get("lang").strip()
    cl = _meta(root, 'meta[http-equiv="Content-Language"]')
    if cl:
        return cl.strip()
    og = _meta(root, 'meta[property="og:locale"]')
    if og:
        return og.strip().replace("_", "-", 1)
    return None


_SCRIPT_RE = re.compile(r"<script[^>]*>[\s\S]*?</script>", re.I)
_STYLE_RE = re.compile(r"<style[^>]*>[\s\S]*?</style>", re.I)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_word_count(html: str) -> int:
    """Regex-level word count (metadata.ts:169-187) — tags stripped, 6 entities."""
    stripped = _SCRIPT_RE.sub(" ", html)
    stripped = _STYLE_RE.sub(" ", stripped)
    stripped = _TAG_RE.sub(" ", stripped)
    stripped = (stripped.replace("&amp;", "&").replace("&lt;", "<")
                .replace("&gt;", ">").replace("&nbsp;", " ").replace("&quot;", '"'))
    # split() collapses whitespace runs and drops empties itself —
    # byte-equivalent to the reference's collapse→trim→split(" ")→filter
    return len(stripped.split())


def extract_image(root: Node) -> Optional[str]:
    img = _meta(root, 'meta[property="og:image"]')
    if img:
        return img.strip()
    img = _meta(root, 'meta[name="twitter:image"]')
    if img:
        return img.strip()
    return None


def extract_canonical(root: Node) -> Optional[str]:
    el = select_first(root, 'link[rel="canonical"]')
    if el is not None and el.get("href"):
        return el.get("href").strip()
    og = _meta(root, 'meta[property="og:url"]')
    if og:
        return og.strip()
    return None


# ── links / images (metadata.ts:250-402) ─────────────────────────────────

def _absolutize(href: str, base_url: str) -> Optional[str]:
    """WHATWG join+normalize — the reference runs EVERY href through
    ``new URL(href, baseUrl).href`` (metadata.ts:259), so absolute
    hrefs normalize too (host lowercase, default port dropped, dot
    segments collapsed, disallowed code points percent-encoded);
    RFC-3986 urljoin kept them verbatim, splitting dedup keys the
    reference merges ('https://Example.com' vs 'https://example.com/').
    Base validity is the join's own contract: ``new URL`` parses the
    BASE first, so an invalid base throws (→ None) even for absolute
    hrefs (metadata.ts:259/:303 catch per element), while a valid
    non-http base still resolves absolute http(s) hrefs."""
    return whatwg_urljoin(base_url, href)


def extract_links(html: str, base_url: str) -> List[str]:
    """Absolute http(s) links, same-page anchors dropped, deduped, sorted."""
    return extract_links_dom(parse_html(html), base_url)


def extract_links_dom(root: Node, base_url: str) -> List[str]:
    """DOM form of extract_links (reuses an existing parse)."""
    return links_from_anchors(select(root, "a[href]"), base_url)


def links_from_anchors(anchors, base_url: str) -> List[str]:
    """Link extraction over a pre-selected anchor list (shared-walk
    form — see links.link_pairs_from_anchors)."""
    links: set = set()
    # the anchor-skip compares against new URL(baseUrl) — the
    # NORMALIZED base (metadata.ts:267), not the raw string
    nb = whatwg_urljoin(base_url, "")
    try:
        base = urlsplit(nb) if nb else None
    except ValueError:
        base = None
    for a in anchors:
        href = a.get("href")
        if not href:
            continue
        absolute = _absolutize(href, base_url)
        if absolute is None:
            continue
        parts = urlsplit(absolute)
        if (
            base is not None
            and parts.fragment
            and (parts.scheme, parts.netloc) == (base.scheme, base.netloc)
            and parts.path == base.path
            and parts.query == base.query
        ):
            continue
        links.add(absolute)
    return sorted(links)


class ImageInfo(NamedTuple):
    src: str
    alt: str
    title: Optional[str]
    width: Optional[int]
    height: Optional[int]


def _parse_int(v: Optional[str]) -> Optional[int]:
    if not v:
        return None
    m = re.match(rf"^{JS_WS}*([+-]?[0-9]+)", v)  # JS parseInt: ASCII digits
    return int(m.group(1)) if m else None


def extract_images(html: str, base_url: str) -> List[ImageInfo]:
    root = parse_html(html)
    images: Dict[str, ImageInfo] = {}

    for img in select(root, "img[src]"):
        src = img.get("src")
        if not src:
            continue
        absolute = _absolutize(src, base_url)
        if absolute is None:
            continue
        images[absolute] = ImageInfo(
            src=absolute,
            alt=img.get("alt") or "",
            title=img.get("title"),
            # `width && !isNaN(width)` (metadata.ts:322): 0 is falsy —
            # a 0-dimension tracking pixel reports undefined, not 0
            width=_parse_int(img.get("width")) or None,
            height=_parse_int(img.get("height")) or None,
        )

    for source in select(root, "picture source[srcset]"):
        srcset = source.get("srcset")
        if not srcset:
            continue
        for part in srcset.split(","):
            url = part.strip().split()[0] if part.strip() else ""
            if not url:
                continue
            absolute = _absolutize(url, base_url)
            if absolute is None:
                continue
            picture = source.parent
            alt = ""
            if picture is not None:
                img_el = next((e for e in picture.iter_elements() if e.tag == "img"), None)
                if img_el is not None:
                    alt = img_el.get("alt") or ""
            images[absolute] = ImageInfo(absolute, alt, None, None, None)

    for el in select(root, '[style*="background"]'):
        style = el.get("style") or ""
        for m in re.finditer(rf"url\(['\"]?([^'\"){JS_WS[1:-1]}]+)['\"]?\)", style):
            absolute = _absolutize(m.group(1), base_url)
            if absolute is None:
                continue
            images[absolute] = ImageInfo(absolute, "", None, None, None)

    return list(images.values())


# ── full metadata (metadata.ts:409-439) ──────────────────────────────────

_HEAD_RE = re.compile(rf"<head[>{JS_WS[1:-1]}][\s\S]*?</head>", re.I)
_H1_RE = re.compile(r"<h1[^>]*>([\s\S]*?)</h1>", re.I)


class PageMetadata(NamedTuple):
    description: Optional[str]
    author: Optional[str]
    published: Optional[str]
    image: Optional[str]
    canonical: Optional[str]
    publish_date: Optional[str]
    language: Optional[str]
    word_count: int


def extract_metadata(html: str, url: str = "") -> tuple:
    """(title, PageMetadata) — head-only parse fast path preserved."""
    head_html = html
    head_match = _HEAD_RE.search(html)
    if head_match:
        h1 = _H1_RE.search(html)
        head_html = (
            "<html>" + head_match.group(0) + "<body>"
            + (h1.group(0) if h1 else "") + "</body></html>"
        )
    root = parse_html(head_html)
    title = extract_title(root)
    publish_date = extract_publish_date(root)
    language = extract_language(root)
    word_count = extract_word_count(html)
    meta = PageMetadata(
        description=extract_description(root),
        author=extract_author(root),
        published=extract_published(root),
        image=extract_image(root),
        canonical=extract_canonical(root),
        publish_date=publish_date,
        language=language,
        word_count=word_count,
    )
    return title, meta
