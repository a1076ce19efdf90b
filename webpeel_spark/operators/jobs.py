"""Job-board parsing as a batch operator (jobs.ts search phase).

The reference fetches one search page at a time and parses job cards
out of its markdown; at corpus scale this is a narrow mapInPandas
stage over (url, content) rows — same UDTF shape as serp_parse_pages
— exploding one output row per job card.  Skills lists are
comma-joined strings (the contract boundary carries no ArrayType).

100 TB plan shape: stateless per-row parse, no shuffle beyond the
input repartition; the parser is pure Python over markdown that
already went through the extraction stage, so it composes with
extract_pages as a second mapInPandas without re-reading the corpus.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, DoubleType, IntegerType,
                               StringType, StructField, StructType)

JOB_CARD_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("source", StringType(), False),
    StructField("position", IntegerType(), False),
    StructField("title", StringType(), False),
    StructField("company", StringType(), True),
    StructField("location", StringType(), True),
    StructField("salary", StringType(), True),
    StructField("remote", BooleanType(), False),
    StructField("posted_at", StringType(), True),
    StructField("detail_url", StringType(), False),
    StructField("snippet", StringType(), True),
    StructField("skills", StringType(), True),
    StructField("rating", DoubleType(), True),
    StructField("job_type", StringType(), True),
    StructField("experience_level", StringType(), True),
    StructField("client_spend", StringType(), True),
    StructField("total_found", IntegerType(), False),
])


def parse_job_pages(df: DataFrame,
                    num_partitions: Optional[int] = None,
                    limit: int = 25) -> DataFrame:
    """``df``: (url string, content string markdown) search pages →
    one row per parsed job card, with the page's totalFound carried on
    every card row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from webpeel_spark.pure.jobs import parse_job_search

        cols = [f.name for f in JOB_CARD_SCHEMA.fields]
        for pdf in it:
            out = []
            for url, content in zip(pdf["url"], pdf["content"]):
                if content is None:
                    continue
                try:
                    r = parse_job_search(content, url, limit)
                except Exception:
                    continue
                for pos, j in enumerate(r["jobs"]):
                    rating = j.get("rating")
                    if rating is None:
                        rating = j.get("clientRating")
                    skills = j.get("skills")
                    out.append((
                        url, j["source"], pos, j["title"],
                        j.get("company"), j.get("location"),
                        j.get("salary"), bool(j.get("remote")),
                        j.get("postedAt"), j["detailUrl"],
                        j.get("snippet"),
                        ",".join(skills) if skills else None,
                        float(rating) if rating is not None else None,
                        j.get("jobType"), j.get("experienceLevel"),
                        j.get("clientSpend"), int(r["totalFound"]),
                    ))
            yield pd.DataFrame(out, columns=cols)

    pruned = df.select("url", "content")
    if num_partitions:
        pruned = pruned.repartition(num_partitions, F.xxhash64("url"))
    return pruned.mapInPandas(batches, JOB_CARD_SCHEMA)


def parse_job_details(cards: DataFrame, detail_pages: DataFrame,
                      num_partitions: Optional[int] = None) -> DataFrame:
    """Phase B (jobs.ts detail fetch → parseJobDetail) as a join +
    parse stage: join cards to fetched detail-page markdown on
    detail_url, then run the section splitter per row.  Requirements /
    responsibilities / benefits arrive newline-joined (no ArrayType)."""
    schema = StructType([
        StructField("detail_url", StringType(), False),
        StructField("title", StringType(), False),
        StructField("description", StringType(), False),
        StructField("requirements", StringType(), True),
        StructField("responsibilities", StringType(), True),
        StructField("benefits", StringType(), True),
        StructField("apply_url", StringType(), True),
        StructField("employment_type", StringType(), True),
        StructField("experience_level", StringType(), True),
        StructField("salary", StringType(), True),
    ])

    joined = cards.select("detail_url", "title", "salary").join(
        detail_pages.select(F.col("url").alias("detail_url"), "content"),
        "detail_url", "inner")
    if num_partitions:
        joined = joined.repartition(num_partitions,
                                    F.xxhash64("detail_url"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from webpeel_spark.pure.jobs import parse_job_detail

        cols = [f.name for f in schema.fields]
        for pdf in it:
            out = []
            for durl, title, salary, content in zip(
                    pdf["detail_url"], pdf["title"], pdf["salary"],
                    pdf["content"]):
                if content is None:
                    continue
                try:
                    d = parse_job_detail(
                        content, {"title": title, "salary": salary,
                                  "detailUrl": durl})
                except Exception:
                    continue
                out.append((
                    durl, title, d["description"],
                    "\n".join(d["requirements"])
                    if d.get("requirements") else None,
                    "\n".join(d["responsibilities"])
                    if d.get("responsibilities") else None,
                    "\n".join(d["benefits"])
                    if d.get("benefits") else None,
                    d.get("applyUrl"), d.get("employmentType"),
                    d.get("experienceLevel"), d.get("salary"),
                ))
            yield pd.DataFrame(out, columns=cols)

    return joined.mapInPandas(batches, schema)
