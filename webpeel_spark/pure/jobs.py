"""Job-board search/detail parsing cores (jobs.ts:76-609).

The reference's two-phase jobs pipeline fetches a search URL with
``peel()``, converts it to markdown, and parses job cards out of the
markdown text; detail pages go through ``parseJobDetail``.  Fetching
(``searchJobs``, ``peel``, the concurrency limiter, jobs.ts:611-706)
is out of scope — the batch engine's input table already holds page
content — but every parser is a pure markdown→struct text stage,
ported here faithfully:

- ``detect_source`` / ``build_search_url``    (jobs.ts:80-106)
- ``clean`` / ``find_salary`` / ``find_date`` (jobs.ts:110-141)
- ``parse_linkedin``                          (jobs.ts:162-230)
- ``parse_glassdoor``                         (jobs.ts:233-292)
- ``parse_indeed``                            (jobs.ts:294-385)
- ``parse_upwork``                            (jobs.ts:388-497)
- ``split_sections`` / ``strip_detail_noise`` /
  ``parse_job_detail``                        (jobs.ts:501-609)

No reference test suite exists for this module; behavior is pinned by
the fixture corpus in tests/test_jobs.py and the planted-generator
contract oracle (jobs_parse).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional
from urllib.parse import quote

Source = str  # 'glassdoor' | 'indeed' | 'linkedin' | 'upwork' | 'generic'


def detect_source(url: str) -> Source:
    h = url.lower()
    if "linkedin.com" in h:
        return "linkedin"
    if "glassdoor.com" in h:
        return "glassdoor"
    if "indeed.com" in h:
        return "indeed"
    if "upwork.com" in h:
        return "upwork"
    return "generic"


def build_search_url(src: Source, kw: str, loc: str) -> str:
    def enc(s: str) -> str:  # encodeURIComponent (jobs.ts:108)
        return quote(s, safe="-_.!~*'()")
    if src == "linkedin":
        return (f"https://www.linkedin.com/jobs/search/?keywords={enc(kw)}"
                f"&location={enc(loc)}")
    if src == "glassdoor":
        return (f"https://www.glassdoor.com/Job/jobs.htm?sc.keyword="
                f"{enc(kw)}&locT=C&locId=1132348&sc.location={enc(loc)}")
    if src == "indeed":
        return f"https://www.indeed.com/jobs?q={enc(kw)}&l={enc(loc)}"
    if src == "upwork":
        return f"https://www.upwork.com/nx/search/jobs/?q={enc(kw)}&sort=recency"
    raise ValueError("Cannot build URL for generic source — provide a url")


from .jstext import JS_WS

_WS = re.compile(JS_WS + "+")


def clean(s: str) -> str:
    s = (s.replace("&amp;", "&").replace("&hellip;", "…")
         .replace("&nbsp;", " ").replace("&#x27;", "'")
         .replace("&quot;", '"'))
    return _WS.sub(" ", s).strip()


def abs_url(href: str, base: str) -> str:
    """jobs.ts:121-123 — ``new URL(href, base).href``, original href
    when the join throws (WHATWG semantics via whatwg_urljoin; the
    RFC-3986 urljoin it replaced dropped empty ';'/'?'/'#' markers and
    skipped host normalization)."""
    from .urlfast import whatwg_urljoin

    out = whatwg_urljoin(base, href, require_http=False)
    return href if out is None else out


_SALARY_RE = re.compile(
    r"\$[\d,]+(?:\.\d+)?(?:\s*[-–]\s*\$[\d,]+(?:\.\d+)?)?"
    r"(?:\s*(?:a\s+year|per\s+hour|an\s+hour|/hr|/yr|K(?:\s|$)))?",
    re.IGNORECASE)


def find_salary(text: str) -> Optional[str]:
    m = _SALARY_RE.search(text)
    return m.group(0).strip() if m else None


_DATE_SHORT = re.compile(r"(\d+[dhm])\b")
_DATE_LONG = re.compile(r"(\d+\s+(?:day|week|month|hour|minute)s?\s+ago)",
                        re.IGNORECASE)


def find_date(text: str) -> Optional[str]:
    m = _DATE_SHORT.search(text) or _DATE_LONG.search(text)
    return m.group(1).strip() if m else None


_REMOTE_RE = re.compile(r"\bremote\b", re.IGNORECASE)


def has_remote(text: str) -> bool:
    return bool(_REMOTE_RE.search(text))


_TOTAL_HEADING = re.compile(r"^#\s+([\d,]+)\+?\s+", re.MULTILINE)


def parse_total_from_heading(content: str) -> int:
    m = _TOTAL_HEADING.search(content)
    if not m:
        return 0
    digits = m.group(1).replace(",", "")
    # parseInt('') is NaN → the caller's jobs.length fallback
    # (jobs.ts:157); int('') raised on a comma-only match
    return int(digits) if digits else 0


# ── LinkedIn (jobs.ts:162-230) ──────────────────────────────────────────

_LI_LINK = re.compile(r"^([^\]]+)\]\(([^)]+)\)")
_LI_H3 = re.compile(r"###\s+(.+)")
_LI_H4_LINK = re.compile(r"####\s+\[([^\]]+)\]")
_LI_H4 = re.compile(r"####\s+(.+)")
_LOC_START = re.compile(r"^[A-Z][a-z]+.*,\s*[A-Z]")
_DATE_TAIL = re.compile(
    r"\d+\s+(?:week|day|month|hour|minute)s?\s+ago", re.IGNORECASE)
_DATE_SHORT_TAIL = re.compile(r"\d+[dhm]\s*$", re.IGNORECASE)


def parse_linkedin(content: str, search_url: str,
                   limit: int = 25) -> Dict[str, Any]:
    jobs: List[Dict[str, Any]] = []
    total_found = parse_total_from_heading(content)

    for block in re.split(r"\n-\s+\[", content)[1:]:
        if len(jobs) >= limit:
            break
        lm = _LI_LINK.match(block)
        if not lm:
            continue
        detail_url = lm.group(2)
        if "linkedin.com/jobs/view/" not in detail_url:
            continue
        hm = _LI_H3.search(block)
        title = clean(hm.group(1) if hm else lm.group(1))
        if not title:
            continue
        cm = _LI_H4_LINK.search(block) or _LI_H4.search(block)
        company = clean(cm.group(1)) if cm else ""

        location = ""
        posted_at: Optional[str] = None
        past_company = False
        for raw in block.split("\n"):
            line = raw.strip()
            if not line:
                continue
            if line.startswith("####"):
                past_company = True
                continue
            if not past_company:
                continue
            if (line.startswith("#") or line.startswith("[")
                    or line.startswith("-")
                    or line in ("Actively Hiring", "Promoted")):
                continue
            if "http://" in line or "https://" in line:
                continue
            date_candidate = find_date(line)
            if not location and _LOC_START.match(line):
                date_in_line = find_date(line)
                if date_in_line:
                    posted_at = date_in_line
                    location = clean(_DATE_SHORT_TAIL.sub(
                        "", _DATE_TAIL.sub("", line)))
                else:
                    location = clean(line)
                continue
            if date_candidate and len(line) < 30:
                posted_at = date_candidate

        jobs.append({
            "title": title, "company": company, "location": location,
            "salary": find_salary(block), "remote": has_remote(block),
            "postedAt": posted_at,
            "detailUrl": abs_url(detail_url, search_url),
            "source": "linkedin",
        })

    return {"jobs": jobs, "totalFound": total_found or len(jobs)}


# ── Glassdoor (jobs.ts:233-292) ─────────────────────────────────────────

_GD_LINK = re.compile(
    r"\[([^\]]+)\]\((https?://[^\s)]*glassdoor\.com/job-listing/[^)]+)\)")
_GD_RATING = re.compile(r"^(\d\.\d)$")
_GD_SKILLS = re.compile(r"\*\*Skills?:\*\*\s*(.+)", re.IGNORECASE)
_GD_DATE = re.compile(r"^\d+[dwm]$")
_GD_LOC = re.compile(r"^[A-Z][a-z]+.*,\s*[A-Z]{2}")


def parse_glassdoor(content: str, search_url: str,
                    limit: int = 25) -> Dict[str, Any]:
    jobs: List[Dict[str, Any]] = []
    total_found = parse_total_from_heading(content)

    for block in re.split(r"\n-\s+", content)[1:]:
        if len(jobs) >= limit:
            break
        lines = [ln.strip() for ln in block.split("\n") if ln.strip()]
        if len(lines) < 2:
            continue
        lm = _GD_LINK.search(block)
        if not lm:
            continue
        title = clean(lm.group(1))
        detail_url = lm.group(2)

        company = ""
        rating: Optional[float] = None
        for line in lines:
            if "[" in line and "glassdoor.com" in line:
                break
            rm = _GD_RATING.match(line)
            if rm:
                rating = float(rm.group(1))
                continue
            if not company and len(line) > 1 and not line[:1].isdigit():
                company = clean(line)

        location = ""
        salary = snippet = None
        skills: Optional[List[str]] = None
        posted_at: Optional[str] = None
        past_link = False
        for line in lines:
            if title in line or "glassdoor.com/job-listing/" in line:
                past_link = True
                continue
            if not past_link:
                continue
            sm = _GD_SKILLS.search(line)
            if sm:
                skills = [s.strip() for s in sm.group(1).split(",")
                          if s.strip()]
                continue
            if _GD_DATE.match(line):
                posted_at = line
                continue
            if not salary and "$" in line:
                salary = find_salary(line) or clean(line)
                continue
            if not location and _GD_LOC.match(line):
                location = clean(line)
                continue
            if not snippet and len(line) > 40 and not line.startswith("**"):
                snippet = clean(line)

        jobs.append({
            "title": title, "company": company, "location": location,
            "salary": salary, "remote": has_remote(block),
            "postedAt": posted_at,
            "detailUrl": abs_url(detail_url, search_url),
            "snippet": snippet, "skills": skills, "rating": rating,
            "source": "glassdoor",
        })

    return {"jobs": jobs, "totalFound": total_found or len(jobs)}


# ── Indeed (jobs.ts:294-385) ────────────────────────────────────────────

_IN_HTML_JOB = re.compile(
    r'id="job_([a-f0-9]+)"[^>]*>.*?<span\s+title="([^"]+)"[^>]*>'
    r"[^<]*</span>", re.DOTALL)
_IN_HTML_COMPANY = re.compile(r'data-testid="company-name"[^>]*>([^<]+)</span>')
_IN_HTML_LOC = re.compile(r'data-testid="text-location"[^>]*>([^<]+)</div>')
_IN_MD_LINK = re.compile(
    r"\[([^\]]+)\]\((https?://[^\s)]*indeed\.com/[^)]*"
    r"(?:viewjob|rc/clk)[^)]*)\)")
_IN_JK = re.compile(r"[?&]jk=([a-f0-9]+)")
_IN_TOTAL = re.compile(r"(?:of|about)\s+([\d,]+)\s+jobs", re.IGNORECASE)
_IN_TOTAL2 = re.compile(r"([\d,]+)\s+jobs", re.IGNORECASE)


def parse_indeed(content: str, search_url: str,
                 limit: int = 25) -> Dict[str, Any]:
    jobs: List[Dict[str, Any]] = []
    html_jobs = list(_IN_HTML_JOB.finditer(content))

    if html_jobs:
        cm = list(_IN_HTML_COMPANY.finditer(content))
        lm = list(_IN_HTML_LOC.finditer(content))
        for i, m in enumerate(html_jobs):
            if len(jobs) >= limit:
                break
            jk = m.group(1)
            next_start = (html_jobs[i + 1].start()
                          if i + 1 < len(html_jobs) else len(content))
            jobs.append({
                "title": clean(m.group(2)),
                "company": clean(cm[i].group(1)) if i < len(cm) else "",
                "location": clean(lm[i].group(1)) if i < len(lm) else "",
                "salary": find_salary(content[m.start():next_start]),
                "remote": False,
                "detailUrl": f"https://www.indeed.com/viewjob?jk={jk}",
                "source": "indeed",
            })
    else:
        for block in re.split(r"\n-\s+", content)[1:]:
            if len(jobs) >= limit:
                break
            lm2 = _IN_MD_LINK.search(block)
            if not lm2:
                continue
            title = clean(lm2.group(1))
            detail_url = lm2.group(2)
            jkm = _IN_JK.search(detail_url)
            if jkm:
                detail_url = f"https://www.indeed.com/viewjob?jk={jkm.group(1)}"

            lines = [ln.strip() for ln in block.split("\n") if ln.strip()]
            company = location = ""
            salary = None
            for line in lines:
                if title in line or "indeed.com" in line:
                    continue
                if not salary:
                    s = find_salary(line)
                    if s:
                        salary = s
                        continue
                if (not company and len(line) > 2
                        and not line.startswith("[")
                        and not line.startswith("#")
                        and not line[:1].isdigit()):
                    company = clean(line)
                    continue
                if not location and _GD_LOC.match(line):
                    location = clean(line)
            if title:
                jobs.append({
                    "title": title, "company": company,
                    "location": location, "salary": salary,
                    "remote": has_remote(block), "detailUrl": detail_url,
                    "source": "indeed",
                })

    tm = _IN_TOTAL.search(content) or _IN_TOTAL2.search(content)
    digits = tm.group(1).replace(",", "") if tm else ""
    total_found = int(digits) if digits else len(jobs)
    return {"jobs": jobs, "totalFound": total_found}


# ── Upwork (jobs.ts:388-497) ────────────────────────────────────────────

_UW_TOTAL = re.compile(
    r"(\d[\d,]*)\+?\s+(?:jobs?|results?)\s+(?:found|available|match)",
    re.IGNORECASE)
_UW_LINK = re.compile(
    r"\[([^\]]+)\]\((https://www\.upwork\.com/jobs/[^)]+)\)")
_UW_ALT_LINK = re.compile(
    r"\[([^\]]+)\]\((https://www\.upwork\.com/(?:nx/)?"
    r"(?:jobs?|freelance-jobs?)[^)]*)\)")
_UW_BUDGET1 = re.compile(
    r"\$[\d,]+(?:\.\d+)?(?:\s*[-–]\s*\$[\d,]+(?:\.\d+)?)?"
    r"\s*(?:/\s*hr|per\s+hour|hourly)?", re.IGNORECASE)
_UW_BUDGET2 = re.compile(
    r"(?:budget|fixed[\s-]?price|hourly\s+rate)[:\s]+\$[\d,]+"
    r"(?:\s*[-–]\s*\$[\d,]+)?", re.IGNORECASE)
_UW_HOURLY = re.compile(r"\bhourly\b", re.IGNORECASE)
_UW_FIXED = re.compile(r"\bfixed[\s-]?price\b", re.IGNORECASE)
_UW_EXP = re.compile(
    r"\b(entry[- ]?level|intermediate|expert|beginner)\b", re.IGNORECASE)
_UW_RATING = re.compile(
    r"(\d+(?:\.\d+)?)\s*(?:of\s+5\s+)?(?:stars?|★)", re.IGNORECASE)
_UW_SPEND = re.compile(
    r"\$[\d,.]+[KkMm]?\+?\s*(?:spent|total\s+spent)", re.IGNORECASE)
_UW_SPEND_STRIP = re.compile(r"\s*(?:spent|total\s+spent)", re.IGNORECASE)
_UW_SKILLS = re.compile(r"(?:skills?|tags?)[:\s]+([^\n]+)", re.IGNORECASE)
_UW_META_LINE = re.compile(
    r"^\d+\s*(?:star|hour|day|week|month|review)", re.IGNORECASE)


def parse_upwork(content: str, search_url: str,
                 limit: int = 25) -> Dict[str, Any]:
    jobs: List[Dict[str, Any]] = []
    tm = _UW_TOTAL.search(content)
    total_found = int(tm.group(1).replace(",", "")) if tm else 0

    matches = list(_UW_LINK.finditer(content))
    if not matches:
        matches = list(_UW_ALT_LINK.finditer(content))
        if not matches:
            return {"jobs": jobs, "totalFound": total_found}

    for i, m in enumerate(matches):
        if len(jobs) >= limit:
            break
        title = clean(m.group(1))
        detail_url = abs_url(m.group(2), search_url)
        block_end = (matches[i + 1].start()
                     if i + 1 < len(matches) else len(content))
        block = content[m.start():block_end]

        bm = _UW_BUDGET1.search(block) or _UW_BUDGET2.search(block)
        budget = bm.group(0).strip() if bm else None

        job_type = None
        if _UW_HOURLY.search(block):
            job_type = "hourly"
        elif _UW_FIXED.search(block):
            job_type = "fixed-price"

        em = _UW_EXP.search(block)
        experience_level = em.group(1) if em else None

        client_rating = None
        rm = _UW_RATING.search(block)
        if rm:
            r = float(rm.group(1))
            if 0 <= r <= 5:
                client_rating = r

        sm = _UW_SPEND.search(block)
        client_spend = (_UW_SPEND_STRIP.sub("", sm.group(0)).strip()
                        if sm else None)

        skills = None
        km = _UW_SKILLS.search(block)
        if km:
            skills = [s.strip() for s in re.split(r"[,;]", km.group(1))
                      if 1 < len(s.strip()) < 40]

        posted_at = find_date(block)

        snippet = None
        for line in (ln.strip() for ln in block.split("\n") if ln.strip()):
            if line == title:
                continue
            if line.startswith("[") or line.startswith("http"):
                continue
            if line.startswith("$") or _UW_META_LINE.match(line):
                continue
            if len(line) > 60:
                snippet = clean(line)[:200]
                break

        if not title:
            continue
        jobs.append({
            "title": title, "company": "", "location": "Remote",
            "remote": True, "salary": budget, "budget": budget,
            "jobType": job_type, "experienceLevel": experience_level,
            "clientRating": client_rating, "clientSpend": client_spend,
            "skills": skills, "snippet": snippet, "postedAt": posted_at,
            "detailUrl": detail_url, "source": "upwork",
        })

    return {"jobs": jobs, "totalFound": total_found or len(jobs)}


_PARSERS = {"linkedin": parse_linkedin, "glassdoor": parse_glassdoor,
            "indeed": parse_indeed, "upwork": parse_upwork}


def parse_job_search(content: str, search_url: str,
                     limit: int = 25) -> Dict[str, Any]:
    """Dispatch by host (jobs.ts searchJobs parse step): returns
    {jobs, totalFound, source}.  Unknown hosts try each parser in
    sequence until one yields jobs (jobs.ts:662-668) — the reference
    only raises for generic sources when BUILDING a url (jobs.ts:104),
    never when parsing."""
    src = detect_source(search_url)
    parser = _PARSERS.get(src)
    if parser is None:
        out = {"jobs": [], "totalFound": 0}
        for fallback in (parse_linkedin, parse_glassdoor, parse_indeed,
                         parse_upwork):
            out = fallback(content, search_url, limit)
            if out["jobs"]:
                break
        out["source"] = src
        return out
    out = parser(content, search_url, limit)
    out["source"] = src
    return out


# ── Detail parsing (jobs.ts:501-609) ────────────────────────────────────

_SEC_DESC = re.compile(
    r"(?:#{1,4}\s*|^\*\*)(?:(?:full\s+)?job\s+description"
    r"|about\s+(?:the\s+)?(?:role|position|job|opportunity)"
    r"|overview|summary)\*?\*?:?\s*$", re.IGNORECASE | re.MULTILINE)
_SEC_REQ = re.compile(
    r"(?:#{1,4}\s*|^\*\*)(?:requirements?|qualifications?"
    r"|what\s+(?:you(?:'ll)?\s+)?(?:need|bring)"
    r"|minimum\s+qualifications?|must\s+have"
    r"|what\s+we(?:'re)?\s+look(?:ing)?\s+for|nice\s+to\s+have)"
    r"\*?\*?:?\s*$", re.IGNORECASE | re.MULTILINE)
_SEC_RESP = re.compile(
    r"(?:#{1,4}\s*|^\*\*)(?:responsibilities|what\s+you(?:'ll)?\s+do"
    r"|duties|key\s+responsibilities|your\s+role|in\s+this\s+role)"
    r"\*?\*?:?\s*$", re.IGNORECASE | re.MULTILINE)
_SEC_BEN = re.compile(
    r"(?:#{1,4}\s*|^\*\*)(?:benefits?|perks?|what\s+we\s+offer"
    r"|compensation(?:\s+and\s+benefits)?|why\s+(?:join|work)"
    r"|our\s+offer)\*?\*?:?\s*$", re.IGNORECASE | re.MULTILINE)
_ANY_HEADING = re.compile(r"^#{1,4}\s+")
_BULLET = re.compile(r"^[-*•]\s+")


def extract_bullets(text: str) -> Optional[List[str]]:
    out = [t for t in
           (_BULLET.sub("", line).strip() for line in text.split("\n"))
           if len(t) > 5]
    return out or None


def split_sections(content: str) -> Dict[str, Any]:
    res: Dict[str, Any] = {}
    cur: Optional[str] = None
    buf: List[str] = []

    def flush() -> None:
        nonlocal buf, cur
        txt = "\n".join(buf).strip()
        buf = []
        if not txt or not cur:
            return
        if cur == "desc":
            res["description"] = txt
        elif cur == "req":
            res["requirements"] = extract_bullets(txt)
        elif cur == "resp":
            res["responsibilities"] = extract_bullets(txt)
        elif cur == "ben":
            res["benefits"] = extract_bullets(txt)

    for line in content.split("\n"):
        if _SEC_DESC.search(line):
            flush(); cur = "desc"; continue
        if _SEC_REQ.search(line):
            flush(); cur = "req"; continue
        if _SEC_RESP.search(line):
            flush(); cur = "resp"; continue
        if _SEC_BEN.search(line):
            flush(); cur = "ben"; continue
        if cur and _ANY_HEADING.match(line):
            flush(); cur = None; continue
        if cur:
            buf.append(line)
    flush()

    if not res.get("description"):
        res["description"] = content[:2000].strip()
    return res


_NOISE_CUTS = [re.compile(p, re.IGNORECASE | re.MULTILINE) for p in (
    r"^#{1,3}\s*similar\s+jobs",
    r"^#{1,3}\s*people\s+also\s+viewed",
    r"^#{1,3}\s*similar\s+searches",
    r"^#{1,3}\s*explore\s+collaborative",
    r"^#{1,3}\s*seniority\s+level",
    r"^#{1,3}\s*company\s+and\s+salary",
    r"^#{1,3}\s*career\s+guide",
    r"^#{1,3}\s*jobs\s+with\s+similar",
    r"^#{1,3}\s*similar\s+jobs?\s+nearby",
)]


def strip_detail_noise(content: str) -> str:
    """Cut trailing boilerplate sections, but only when the cut point
    sits past 30% of the document (jobs.ts:583-591)."""
    result = content
    for pattern in _NOISE_CUTS:
        m = pattern.search(result)
        if m and m.start() > len(result) * 0.3:
            result = result[:m.start()].strip()
    return result


_EMP_RE = re.compile(
    r"\b(full[- ]?time|part[- ]?time|contract|internship|freelance"
    r"|temporary)\b", re.IGNORECASE)
_EXP_RE = re.compile(
    r"\b(entry[- ]?level|mid[- ]?level|senior|lead|principal|staff"
    r"|junior|intern)\b", re.IGNORECASE)
_APPLY_MD = re.compile(r"\[(?:apply|submit)[^\]]*\]\(([^)]+)\)",
                       re.IGNORECASE)
_APPLY_HREF = re.compile(r'href="([^"]*(?:apply|submit|careers)[^"]*)"',
                         re.IGNORECASE)


def parse_job_detail(content: str, card: Dict[str, Any]) -> Dict[str, Any]:
    cleaned = strip_detail_noise(content)
    sections = split_sections(cleaned)

    em = _EMP_RE.search(cleaned)
    xm = _EXP_RE.search(cleaned)
    am = _APPLY_MD.search(cleaned) or _APPLY_HREF.search(cleaned)
    salary = card.get("salary") or find_salary(cleaned)

    out = dict(card)
    out.update({
        "salary": salary or card.get("salary"),
        "description": sections.get("description") or cleaned[:3000],
        "requirements": sections.get("requirements"),
        "responsibilities": sections.get("responsibilities"),
        "benefits": sections.get("benefits"),
        "applyUrl": am.group(1) if am else None,
        "employmentType": (re.sub(r"\s+", "-", em.group(1).lower())
                           if em else None),
        "experienceLevel": xm.group(1) if xm else None,
    })
    return out
