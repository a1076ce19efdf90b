"""Job-board parser suite (jobs.ts:76-609 port — no reference test
suite exists, so these fixtures pin the ported behavior)."""

from __future__ import annotations

import pytest

from webpeel_spark.pure.jobs import (
    build_search_url,
    clean,
    detect_source,
    find_date,
    find_salary,
    has_remote,
    parse_glassdoor,
    parse_indeed,
    parse_job_detail,
    parse_job_search,
    parse_linkedin,
    parse_total_from_heading,
    parse_upwork,
    split_sections,
    strip_detail_noise,
)


class TestHelpers:
    def test_detect_source(self):
        assert detect_source("https://www.linkedin.com/jobs/x") == "linkedin"
        assert detect_source("https://GLASSDOOR.com/Job/x") == "glassdoor"
        assert detect_source("https://www.indeed.com/jobs") == "indeed"
        assert detect_source("https://www.upwork.com/nx/search") == "upwork"
        assert detect_source("https://example.com/careers") == "generic"

    def test_build_search_url(self):
        assert build_search_url("linkedin", "ml engineer", "NYC") == (
            "https://www.linkedin.com/jobs/search/?keywords=ml%20engineer"
            "&location=NYC")
        assert "sc.keyword=dev" in build_search_url("glassdoor", "dev", "")
        assert build_search_url("indeed", "a b", "c") == \
            "https://www.indeed.com/jobs?q=a%20b&l=c"
        assert build_search_url("upwork", "x", "") .endswith("sort=recency")
        with pytest.raises(ValueError):
            build_search_url("generic", "x", "y")

    def test_clean_entities_and_whitespace(self):
        assert clean("A &amp; B&nbsp;&#x27;C&#x27;  \n D&hellip;") == \
            "A & B 'C' D…"
        assert clean("&quot;q&quot;") == '"q"'

    def test_find_salary(self):
        assert find_salary("pays $120,000 a year now") == "$120,000 a year"
        assert find_salary("range $90 - $110 per hour") == \
            "$90 - $110 per hour"
        assert find_salary("about $85K total") == "$85K"
        assert find_salary("no numbers here") is None

    def test_find_date(self):
        assert find_date("posted 3d ago") == "3d"
        assert find_date("2 weeks ago") == "2 weeks ago"
        assert find_date("nothing") is None

    def test_remote_and_total(self):
        assert has_remote("fully Remote role")
        assert not has_remote("remotely related")  # \bremote\b only
        assert parse_total_from_heading("# 1,234 jobs in NYC") == 1234
        assert parse_total_from_heading("no heading") == 0


_LINKEDIN_MD = """# 2,450 jobs

- [Senior Data Engineer](https://www.linkedin.com/jobs/view/123456)
  ### Senior Data Engineer
  #### [Acme Corp](https://www.linkedin.com/company/acme)
  Actively Hiring
  San Francisco, CA 2 weeks ago
  $150,000 a year
- [Not a job](https://www.linkedin.com/feed/update/999)
- [ML Engineer](https://www.linkedin.com/jobs/view/789)
  ### ML Engineer
  #### Beta Labs
  Promoted
  Remote role based in Austin
  Austin, TX
  3d
"""


class TestLinkedIn:
    def test_cards(self):
        r = parse_linkedin(_LINKEDIN_MD,
                           "https://www.linkedin.com/jobs/search/", 25)
        assert r["totalFound"] == 2450
        assert len(r["jobs"]) == 2  # feed link filtered out
        j0, j1 = r["jobs"]
        assert j0["title"] == "Senior Data Engineer"
        assert j0["company"] == "Acme Corp"
        assert j0["location"] == "San Francisco, CA"
        assert j0["postedAt"] == "2 weeks ago"
        assert j0["salary"] == "$150,000 a year"
        assert j1["company"] == "Beta Labs"
        assert j1["location"] == "Austin, TX"
        assert j1["postedAt"] == "3d"
        assert j1["remote"] is True

    def test_limit(self):
        r = parse_linkedin(_LINKEDIN_MD, "https://x", 1)
        assert len(r["jobs"]) == 1


_GLASSDOOR_MD = """# 980 jobs

- Acme Analytics
  4.2
  [Data Scientist](https://www.glassdoor.com/job-listing/data-sci-1)
  Denver, CO
  $140K (Employer est.)
  Build models and dashboards for enterprise analytics customers.
  **Skills:** Python, SQL, Tableau
  5d
- NoRating Inc
  [Analyst](https://www.glassdoor.com/job-listing/analyst-2)
  Miami, FL
"""


class TestGlassdoor:
    def test_cards(self):
        r = parse_glassdoor(_GLASSDOOR_MD, "https://x", 25)
        assert r["totalFound"] == 980
        j0, j1 = r["jobs"]
        assert j0["company"] == "Acme Analytics"
        assert j0["rating"] == 4.2
        assert j0["title"] == "Data Scientist"
        assert j0["location"] == "Denver, CO"
        assert j0["salary"] == "$140K"
        assert j0["skills"] == ["Python", "SQL", "Tableau"]
        assert j0["postedAt"] == "5d"
        assert "enterprise analytics" in j0["snippet"]
        assert j1["rating"] is None
        assert j1["company"] == "NoRating Inc"


_INDEED_HTML = (
    '<td id="job_ab12cd"><span title="Backend Engineer">x</span></td>'
    '<span data-testid="company-name">Gamma Inc</span>'
    '<div data-testid="text-location">Seattle, WA</div>'
    "pays $130,000 a year "
    '<td id="job_ef34"><span title="SRE">y</span></td>'
    '<span data-testid="company-name">Delta LLC</span>'
    '<div data-testid="text-location">Portland, OR</div>'
)

_INDEED_MD = """Results 1 of about 5,200 jobs

- [Platform Engineer](https://www.indeed.com/rc/clk?jk=a1b2c3&from=serp)
  Epsilon Co
  Chicago, IL
  $125,000 a year
- [No link block without match]
"""


class TestIndeed:
    def test_html_mode(self):
        r = parse_indeed(_INDEED_HTML, "https://www.indeed.com/jobs", 25)
        assert len(r["jobs"]) == 2
        j0, j1 = r["jobs"]
        assert j0["title"] == "Backend Engineer"
        assert j0["company"] == "Gamma Inc"
        assert j0["location"] == "Seattle, WA"
        assert j0["detailUrl"] == "https://www.indeed.com/viewjob?jk=ab12cd"
        assert j0["salary"] == "$130,000 a year"
        assert j1["detailUrl"] == "https://www.indeed.com/viewjob?jk=ef34"

    def test_markdown_mode_and_jk_rewrite(self):
        r = parse_indeed(_INDEED_MD, "https://www.indeed.com/jobs", 25)
        assert r["totalFound"] == 5200
        assert len(r["jobs"]) == 1
        j = r["jobs"][0]
        assert j["detailUrl"] == "https://www.indeed.com/viewjob?jk=a1b2c3"
        assert j["company"] == "Epsilon Co"
        assert j["location"] == "Chicago, IL"
        assert j["salary"] == "$125,000 a year"


_UPWORK_MD = """123 jobs found

[Build an ETL pipeline](https://www.upwork.com/jobs/build-etl-123)
$40/hr
Hourly job, Expert level
4.8 of 5 stars
$20K+ total spent
We need a data engineer to design and maintain a robust nightly batch pipeline.
Skills: Python, Airflow; dbt
Posted 2d ago

[Fix my website](https://www.upwork.com/jobs/fix-site-456)
Budget: $500
Fixed-price — Beginner welcome
"""


class TestUpwork:
    def test_cards(self):
        r = parse_upwork(_UPWORK_MD,
                         "https://www.upwork.com/nx/search/jobs/", 25)
        assert r["totalFound"] == 123
        j0, j1 = r["jobs"]
        assert j0["title"] == "Build an ETL pipeline"
        assert j0["budget"] == "$40/hr"
        assert j0["jobType"] == "hourly"
        assert j0["experienceLevel"] == "Expert"
        assert j0["clientRating"] == 4.8
        assert j0["clientSpend"] == "$20K+"
        assert j0["skills"] == ["Python", "Airflow", "dbt"]
        assert j0["postedAt"] == "2d"
        assert "nightly batch pipeline" in j0["snippet"]
        assert j0["remote"] is True and j0["location"] == "Remote"
        assert j1["jobType"] == "fixed-price"
        assert j1["experienceLevel"] == "Beginner"
        assert j1["budget"] == "$500"

    def test_rating_bounds(self):
        r = parse_upwork("[T](https://www.upwork.com/jobs/t-1)\n"
                         "9.5 stars\n", "https://x", 25)
        assert r["jobs"][0]["clientRating"] is None

    def test_no_links(self):
        r = parse_upwork("nothing to see", "https://x", 25)
        assert r["jobs"] == [] and r["totalFound"] == 0


class TestDispatch:
    def test_parse_job_search_routes_by_host(self):
        r = parse_job_search(_UPWORK_MD,
                             "https://www.upwork.com/nx/search/jobs/")
        assert r["source"] == "upwork" and len(r["jobs"]) == 2
        r = parse_job_search("x", "https://example.com/careers")
        assert r == {"jobs": [], "totalFound": 0, "source": "generic"}


_DETAIL_MD = """# Senior Data Engineer at Acme

## About the role
We build planet-scale pipelines for fun and profit.

## Requirements
- 5+ years with distributed systems
- Spark or Flink in production
- tiny

## What you'll do
- Design ingestion topologies
- Own the lakehouse roadmap

## Benefits
- Unlimited PTO
- $2,000 learning budget

Full time, Senior position. [Apply now](https://acme.example/apply)

## Similar jobs
- [Other role](https://x)
"""


class TestDetail:
    def test_split_sections(self):
        s = split_sections(_DETAIL_MD)
        assert "planet-scale pipelines" in s["description"]
        assert s["requirements"] == ["5+ years with distributed systems",
                                     "Spark or Flink in production"]
        assert s["responsibilities"] == ["Design ingestion topologies",
                                         "Own the lakehouse roadmap"]
        # the trailing prose line joins the open benefits buffer —
        # extractBullets keeps any line > 5 chars (jobs.ts:512-519)
        assert s["benefits"] == [
            "Unlimited PTO", "$2,000 learning budget",
            "Full time, Senior position. "
            "[Apply now](https://acme.example/apply)"]

    def test_split_sections_bold_markers(self):
        # NB the reference regex expects the colon AFTER the closing
        # stars ('**Overview**:'), so '**Overview:**' is NOT a section
        # marker — pinned here to match jobs.ts:521-524 exactly
        s = split_sections("**Overview**\nIntro text.\n"
                           "**Requirements**:\n- A solid skill\n")
        assert s["description"] == "Intro text."
        assert s["requirements"] == ["A solid skill"]
        t = split_sections("**Overview:**\nIntro text.")
        assert t["description"].startswith("**Overview:**")

    def test_default_description(self):
        s = split_sections("No headings at all, just prose.")
        assert s["description"] == "No headings at all, just prose."

    def test_strip_noise_thirty_percent_rule(self):
        noisy = ("intro\n" * 50) + "## Similar jobs\ntail"
        assert "Similar jobs" not in strip_detail_noise(noisy)
        early = "## Similar jobs\n" + ("body\n" * 50)
        assert strip_detail_noise(early) == early  # cut point before 30%

    def test_parse_job_detail(self):
        card = {"title": "Senior Data Engineer", "salary": None,
                "detailUrl": "https://x", "source": "linkedin"}
        d = parse_job_detail(_DETAIL_MD, card)
        assert d["employmentType"] == "full-time"
        assert d["experienceLevel"] == "Senior"
        assert d["applyUrl"] == "https://acme.example/apply"
        assert d["salary"] == "$2,000"  # first $ match in cleaned text
        assert "Similar jobs" not in d["description"]

    def test_detail_href_fallback(self):
        d = parse_job_detail('x <a href="https://y/apply-here">go</a>',
                             {"title": "T"})
        assert d["applyUrl"] == "https://y/apply-here"


class TestSparkOperator:
    def test_parse_job_pages(self):
        pytest.importorskip("pyspark")
        from webpeel_spark.session import get_spark

        spark = get_spark(cores=2)
        df = spark.createDataFrame(
            [("https://www.linkedin.com/jobs/search/?k=x", _LINKEDIN_MD),
             ("https://www.upwork.com/nx/search/jobs/?q=y", _UPWORK_MD)],
            "url string, content string")
        from webpeel_spark.operators.jobs import parse_job_pages

        rows = parse_job_pages(df, num_partitions=2) \
            .orderBy("url", "position").collect()
        assert len(rows) == 4
        by_src = {}
        for r in rows:
            by_src.setdefault(r.source, []).append(r)
        assert [r.title for r in by_src["linkedin"]] == \
            ["Senior Data Engineer", "ML Engineer"]
        assert by_src["upwork"][0].skills == "Python,Airflow,dbt"
        assert by_src["upwork"][0].total_found == 123
