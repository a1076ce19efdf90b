"""Source-scoring ranker as a pure Catalyst plan (source-scoring.ts).

The reference ranks /v1/ask search results in JS per query; over a
corpus this is a narrow projection + one window per registered domain:

    scan(url,title,snippet,bm25,published)
      → host/domain/path regexes, tier when-chain, age buckets
      → final = bm25*w1 + authority*w2 + freshness*w3 + primary*w4
      → row_number() over (partition by registered_domain
                           order by final desc)  ≤ max_per_domain

No Python in the plan, no shuffle except the single window hash
partition on registered_domain — scales linearly.  Query-dependent
inputs (entity list, factual flag) fold to literals via the pure port
(pure/source_scoring.py), and ``source_rank_oracle_sql`` generates the
DuckDB twin from the SAME tier table, so the driver's value-hash
comparison is exact on every branch.

The reference scores freshness against wall-clock ``Date.now()``; both
the operator and the oracle take an explicit ``now`` timestamp instead
(deterministic, and what a batch pipeline wants anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..pure.source_scoring import (
    AUTHORITY_DEFAULT,
    AUTHORITY_TIERS,
    extract_entity_candidates,
    is_factual_query,
)

_HOST_RE = r"^https?://([^/?#:]+)"
_PATH_RE = r"^https?://[^/?#]+(/[^?#]*)?"
_MULTI_TLD_RE = r"\.(co|com|net|org|gov|edu)\.[a-z]{2}$"
_REG3_RE = r"([^.]+\.[^.]+\.[^.]+)$"
_REG2_RE = r"([^.]+\.[^.]+)$"
_OFFICIAL_PATH_RE = (
    r"(?i)/(docs|api|pricing|help|support|documentation|reference|guide"
    r"|faq|changelog|release|releases|download|downloads|getting-started"
    r"|quickstart)\b")


def _weights(factual: bool):
    return (0.35, 0.15, 0.35, 0.15) if factual else (0.40, 0.25, 0.20, 0.15)


def _authority_expr(host: Column) -> Column:
    """Tier when-chain in declaration order (first match wins)."""
    expr = None
    for kind, pattern, score in AUTHORITY_TIERS:
        if kind == "domain":
            cond = (host == pattern) | host.endswith("." + pattern)
        elif kind == "prefix":
            cond = host.startswith(pattern)
        else:  # tld
            cond = host.endswith(pattern)
        expr = F.when(cond, F.lit(score)) if expr is None \
            else expr.when(cond, F.lit(score))
    return expr.otherwise(F.lit(AUTHORITY_DEFAULT))


def score_sources(df: DataFrame, query: str, now: str,
                  max_per_domain: int = 2) -> DataFrame:
    """Rank a sources table for one query (source-scoring.ts:524).

    ``df`` columns: url, title, snippet, bm25 (double), published
    (nullable 'YYYY-MM-DD HH:MM:SS' string).  ``now`` is the scoring
    instant in the same format.
    """
    entities = extract_entity_candidates(query)
    factual = is_factual_query(query)
    w_bm25, w_auth, w_fresh, w_prim = _weights(factual)

    host = F.lower(F.regexp_extract("url", _HOST_RE, 1))
    domain = (
        F.when(host.rlike(_MULTI_TLD_RE),
               F.regexp_extract(host, _REG3_RE, 1))
        .when(host.contains("."), F.regexp_extract(host, _REG2_RE, 1))
        .otherwise(host)
    )

    authority = _authority_expr(host)

    now_ts = F.to_timestamp(F.lit(now))
    ts = F.try_to_timestamp(F.col("published"))
    valid_date = (ts.isNotNull() & (F.year(ts) > 1990)
                  & (F.year(ts) <= F.year(now_ts) + 1))
    age_days = (F.unix_timestamp(now_ts) - F.unix_timestamp(ts)) / 86400.0
    freshness = (
        F.when(~valid_date, F.lit(0.5))
        .when(age_days <= 7, F.lit(1.0))
        .when(age_days <= 30, F.lit(0.9))
        .when(age_days <= 90, F.lit(0.8))
        .when(age_days <= 365, F.lit(0.6))
        .otherwise(F.lit(0.4))
    )

    segments = F.split(host, r"[.\-_]")
    domain_match = F.arrays_overlap(
        segments, F.array(*[F.lit(e) for e in entities])) \
        if entities else F.lit(False)
    path = F.regexp_extract("url", _PATH_RE, 1)
    path_match = path.rlike(_OFFICIAL_PATH_RE)
    primary = F.least(
        F.lit(1.0),
        F.when(domain_match, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(path_match, F.lit(0.2)).otherwise(F.lit(0.0)))

    final = F.round(
        F.col("bm25") * w_bm25 + authority * w_auth
        + freshness * w_fresh + primary * w_prim, 6)

    scored = df.select(
        "url", "title",
        F.round(F.col("bm25"), 6).alias("confidence"),
        F.when(authority >= 0.9, "official")
         .when(authority >= 0.8, "institutional")
         .when(authority >= 0.7, "major")
         .otherwise("general").alias("authority"),
        F.when(freshness >= 0.85, "recent")
         .when(freshness >= 0.75, "this-month")
         .when(freshness >= 0.45, "this-year")
         .otherwise("older").alias("freshness"),
        (primary > 0).alias("is_primary"),
        final.alias("final_score"),
        domain.alias("registered_domain"),
    )

    win = Window.partitionBy("registered_domain") \
        .orderBy(F.desc("final_score"), F.asc("url"))
    return (scored
            .withColumn("domain_rank", F.row_number().over(win))
            .filter(F.col("domain_rank") <= max_per_domain)
            .drop("domain_rank", "registered_domain"))


def source_rank_oracle_sql(parquet_path: str, query: str, now: str,
                           max_per_domain: int = 2) -> str:
    """DuckDB twin of ``score_sources`` over the same parquet."""
    entities = extract_entity_candidates(query)
    factual = is_factual_query(query)
    w_bm25, w_auth, w_fresh, w_prim = _weights(factual)

    tier_cases = []
    for kind, pattern, score in AUTHORITY_TIERS:
        if kind == "domain":
            cond = (f"(host = '{pattern}' OR host LIKE '%.{pattern}')")
        elif kind == "prefix":
            cond = f"host LIKE '{pattern}%'"
        else:
            cond = f"host LIKE '%{pattern}'"
        tier_cases.append(f"WHEN {cond} THEN {score}")
    authority_case = ("CASE " + " ".join(tier_cases)
                      + f" ELSE {AUTHORITY_DEFAULT} END")

    ent_list = ", ".join(f"'{e}'" for e in entities) or "''"
    domain_match = (f"list_has_any(string_split_regex(host, '[.\\-_]'), "
                    f"[{ent_list}])") if entities else "FALSE"

    return f"""
WITH base AS (
  SELECT url, title, bm25,
         lower(regexp_extract(url, '{_HOST_RE}', 1)) AS host,
         TRY_CAST(published AS TIMESTAMP) AS ts,
         TIMESTAMP '{now}' AS now_ts,
         regexp_extract(url, '{_PATH_RE}', 1) AS path
  FROM read_parquet('{parquet_path}')
), feat AS (
  SELECT url, title, bm25,
    CASE WHEN regexp_matches(host, '{_MULTI_TLD_RE}')
           THEN regexp_extract(host, '{_REG3_RE}', 1)
         WHEN host LIKE '%.%'
           THEN regexp_extract(host, '{_REG2_RE}', 1)
         ELSE host END AS registered_domain,
    {authority_case} AS authority_score,
    CASE WHEN ts IS NULL OR year(ts) <= 1990
              OR year(ts) > year(now_ts) + 1 THEN 0.5
         WHEN epoch(now_ts - ts) / 86400.0 <= 7 THEN 1.0
         WHEN epoch(now_ts - ts) / 86400.0 <= 30 THEN 0.9
         WHEN epoch(now_ts - ts) / 86400.0 <= 90 THEN 0.8
         WHEN epoch(now_ts - ts) / 86400.0 <= 365 THEN 0.6
         ELSE 0.4 END AS freshness_score,
    least(1.0,
          (CASE WHEN {domain_match} THEN 0.3 ELSE 0.0 END)
          + (CASE WHEN regexp_matches(path, '{_OFFICIAL_PATH_RE}')
                  THEN 0.2 ELSE 0.0 END)) AS primary_score
  FROM base
), scored AS (
  SELECT url, title,
    round(bm25, 6) AS confidence,
    CASE WHEN authority_score >= 0.9 THEN 'official'
         WHEN authority_score >= 0.8 THEN 'institutional'
         WHEN authority_score >= 0.7 THEN 'major'
         ELSE 'general' END AS authority,
    CASE WHEN freshness_score >= 0.85 THEN 'recent'
         WHEN freshness_score >= 0.75 THEN 'this-month'
         WHEN freshness_score >= 0.45 THEN 'this-year'
         ELSE 'older' END AS freshness,
    primary_score > 0 AS is_primary,
    round(bm25 * {w_bm25} + authority_score * {w_auth}
          + freshness_score * {w_fresh} + primary_score * {w_prim}, 6)
      AS final_score,
    registered_domain
  FROM feat
)
SELECT url, title, confidence, authority, freshness, is_primary,
       final_score
FROM (
  SELECT *, row_number() OVER (PARTITION BY registered_domain
                               ORDER BY final_score DESC, url ASC)
            AS domain_rank
  FROM scored
)
WHERE domain_rank <= {max_per_domain}
ORDER BY final_score DESC, url ASC
"""
