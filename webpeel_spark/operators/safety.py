"""Corpus URL-safety gate (safe-browsing.ts / threat-feeds.ts batch
face).

``url_safety`` stamps every row with the local heuristic blocklist
verdict (vectorized pandas UDF over the pure port — pure string
logic, no network), then optionally overlays a THREAT-FEED TABLE —
(url, threat, source) rows built from the published feeds (OpenPhish
feed.txt, URLhaus bulk CSV) — via a broadcast left join on the
lowercased url.  Feed tables are a few hundred thousand rows —
always the broadcast side against a 10^12-row corpus; the corpus
never shuffles.

A training pipeline runs this ahead of extraction to drop phishing /
malware-distribution urls from the crawl frontier — the corpus-
hygiene use the reference's per-fetch check becomes at batch scale.

``ssrf_gate`` is the same batch face for the server's SSRF middleware
(server/middleware/url-validator.ts via pure/url_validator.py):
localhost / cloud-metadata / private-and-reserved-IP targets — incl.
hex/octal/decimal IPv4 spellings — stamped per row before any fetch
is scheduled.  Both gates are stateless codegen-adjacent projections:
one vectorized Arrow UDF, no shuffle, no network.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("struct<safe:boolean,threats:array<string>>")
def _local_verdict(urls: pd.Series) -> pd.DataFrame:
    from webpeel_spark.pure.safe_browsing import check_local_blocklist

    out = urls.map(lambda u: check_local_blocklist(u or ""))
    return pd.DataFrame({"safe": out.map(lambda r: r["safe"]),
                         "threats": out.map(lambda r: r["threats"])})


@pandas_udf("struct<allowed:boolean,reason:string>")
def _ssrf_verdict(urls: pd.Series) -> pd.DataFrame:
    from webpeel_spark.pure.url_validator import ssrf_verdict

    out = urls.map(lambda u: ssrf_verdict(u or ""))
    return pd.DataFrame({"allowed": out.map(lambda r: r["allowed"]),
                         "reason": out.map(lambda r: r["reason"])})


def ssrf_gate(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds (fetch_allowed, ssrf_reason): reason is 'ok', 'ssrf'
    (localhost/private/metadata/non-HTTP target) or 'invalid' (the
    URL would not parse — unfetchable either way, but frontier stats
    want the distinction)."""
    return (df.withColumn("__s", _ssrf_verdict(F.col(url_col)))
            .withColumn("fetch_allowed", F.col("__s.allowed"))
            .withColumn("ssrf_reason", F.col("__s.reason"))
            .drop("__s"))


def url_safety(df: DataFrame, url_col: str = "url",
               feeds: Optional[DataFrame] = None) -> DataFrame:
    """Adds (safe, threats, threat_source).  ``feeds``: optional
    (url, threat, source) table; a feed hit overrides safe=false and
    appends its threat, mirroring checkThreatFeeds' merge order
    (local verdict first, feed threats appended)."""
    out = df.withColumn("__v", _local_verdict(F.col(url_col))) \
        .withColumn("safe", F.col("__v.safe")) \
        .withColumn("threats", F.col("__v.threats")) \
        .withColumn("threat_source",
                    F.when(F.col("__v.safe"), F.lit("none"))
                    .otherwise(F.lit("local-blocklist"))) \
        .drop("__v")
    if feeds is None:
        return out
    feed = (feeds.groupBy(F.lower(F.col("url")).alias("__feed_url"))
            .agg(F.collect_list("threat").alias("__feed_threats"),
                 F.min("source").alias("__feed_source")))
    return (out.join(F.broadcast(feed),
                     F.lower(F.col(url_col)) == F.col("__feed_url"),
                     "left")
            .withColumn("safe", F.col("safe")
                        & F.col("__feed_threats").isNull())
            .withColumn("threats", F.when(
                F.col("__feed_threats").isNotNull(),
                F.concat("threats", F.col("__feed_threats")))
                .otherwise(F.col("threats")))
            .withColumn("threat_source", F.when(
                F.col("__feed_threats").isNotNull(),
                F.col("__feed_source")).otherwise(F.col("threat_source")))
            .drop("__feed_url", "__feed_threats", "__feed_source"))
