"""Per-URL extraction-engine recommendation (engine-ranker.ts batch face).

The reference builds a quality-ranked fallback chain per URL at fetch
time (engine-ranker.ts:415 buildFallbackChain); in this engine the
batch face is a crawl-planner projection: given a frontier table of
URLs, emit each URL's recommended engine chain so a scheduler can
partition the frontier by strategy (cheap simple-fetch pool vs the
expensive browser/stealth pools).

Scale shape: the chain depends only on the URL's hostname and the
global options, DOMAIN_RULES is ~22 entries, and the pure function is
microseconds — so this is a NARROW stage (no shuffle, no join): an
Arrow-batched pandas UDF with a per-batch hostname memo.  Distinct
hosts per batch are far fewer than rows, so the memo makes the per-row
cost a dict hit; at 10^12 rows the operator stays embarrassingly
parallel and adds no stage boundary to the plan it is projected into.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, IntegerType, StringType, StructField,
    StructType,
)

_CHAIN_SCHEMA = StructType([
    StructField("chain", ArrayType(StringType())),
    StructField("engine", StringType()),
    StructField("quality", IntegerType()),
    StructField("speed", IntegerType()),
    StructField("max_timeout_ms", IntegerType()),
    StructField("forced_mode", StringType()),
    StructField("residential_proxy", BooleanType()),
    StructField("spa_likely", BooleanType()),
])


def recommend_engines(
    df: DataFrame,
    url_col: str = "url",
    render: Optional[bool] = None,
    stealth: Optional[bool] = None,
    no_domain_api: Optional[bool] = None,
) -> DataFrame:
    """Append engine-recommendation columns to a frontier table.

    Adds ``chain`` (engine names, best first), ``engine`` /
    ``quality`` / ``speed`` / ``max_timeout_ms`` (the chain head; all
    NULL when the option filter empties the chain, e.g.
    ``render=False, no_domain_api=True`` leaves only simple +
    search-fallback — never empty — but an empty chain stays
    representable), plus the strategies.ts decision tables:
    ``forced_mode`` ('browser'/'stealth'/NULL, shouldForceBrowser),
    ``residential_proxy`` (requiresResidentialProxy), and
    ``spa_likely`` (the pipeline.ts:361-398 URL-keyed SPA auto-render
    table: exact-hostname set, then URL-substring patterns — the
    content-based half is ``has_spa_indicators`` post-fetch).  Option
    semantics match the reference: ``render`` filters only when
    explicitly ``False``.
    """

    @F.pandas_udf(_CHAIN_SCHEMA)
    def _rank(urls: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        from webpeel_spark.pure.engine_ranker import (
            SPA_DOMAINS, SPA_URL_PATTERNS, _whatwg_hostname,
            build_fallback_chain, is_spa_url,
            requires_residential_proxy, should_force_browser,
        )

        # everything except the raw-string '#!' check depends only on
        # the hostname, so one memo entry serves every URL on a host
        memo: dict = {}
        for batch in urls:
            rows = []
            for url in batch:
                url = url or ""
                host = _whatwg_hostname(url)
                hit = memo.get(host)
                if hit is None:
                    chain = build_fallback_chain(
                        url, render=render, stealth=stealth,
                        no_domain_api=no_domain_api)
                    names = [e["engine"] for e in chain]
                    base = f"https://{host}/" if host else ""
                    if chain:
                        top = chain[0]["config"]
                        hit = (names, names[0], top["quality"],
                               top["speed"], top["max_timeout_ms"],
                               should_force_browser(base),
                               requires_residential_proxy(base),
                               host in SPA_DOMAINS)
                    else:
                        hit = (names, None, None, None, None,
                               should_force_browser(base),
                               requires_residential_proxy(base),
                               host in SPA_DOMAINS)
                    memo[host] = hit
                forced = "browser" if "#!" in url else hit[5]
                # SPA: the domain half is host-memoized; the pattern
                # half tests the RAW url (path-dependent) so it runs
                # per row — plain substring checks.  host=='' is the
                # one ambiguous case (unparseable vs authority-less):
                # defer to is_spa_url, which re-checks parseability
                # exactly like the reference's try/catch.
                if hit[7]:
                    spa = True
                elif any(p in url for p in SPA_URL_PATTERNS):
                    spa = True if host else is_spa_url(url)
                else:
                    spa = False
                rows.append(hit[:5] + (forced, hit[6], spa))
            yield pd.DataFrame(rows, columns=[
                "chain", "engine", "quality", "speed", "max_timeout_ms",
                "forced_mode", "residential_proxy", "spa_likely"])

    rec = F.col("__rec")
    return (
        df.withColumn("__rec", _rank(F.col(url_col)))
        .withColumn("chain", rec["chain"])
        .withColumn("engine", rec["engine"])
        .withColumn("quality", rec["quality"])
        .withColumn("speed", rec["speed"])
        .withColumn("max_timeout_ms", rec["max_timeout_ms"])
        .withColumn("forced_mode", rec["forced_mode"])
        .withColumn("residential_proxy", rec["residential_proxy"])
        .withColumn("spa_likely", rec["spa_likely"])
        .drop("__rec")
    )
