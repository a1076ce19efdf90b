"""Source-credibility scoring as a pure Catalyst projection.

The reference computes its trust envelope per result in JS
(source-credibility.ts:449-609, used by pipeline.ts ``buildResult``).
At corpus scale this is a narrow, shuffle-free column transform — so
it is re-expressed here as builtin expressions only (regexp host
parse, literal-map lookups, when-chains): no Python in the hot path,
whole-stage-codegen friendly, scales to any row count.

``credibility_oracle_sql`` builds the DuckDB twin from the SAME
constant tables in ``pure/source_credibility.py`` — the exact oracle
the driver checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..pure.source_credibility import (
    COMMUNITY_PLATFORMS,
    DOMAIN_CATEGORY,
    ESTABLISHED_DOMAINS,
    OFFICIAL_DOMAINS,
    OFFICIAL_TLDS,
    PHISHING_KEYWORDS,
    SUSPICIOUS_TLDS,
    TLD_TRUST,
)

_PROTO_RE = r"^([A-Za-z][A-Za-z0-9+.-]*):"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)"
_INVALID_LABEL = "Invalid URL — Cannot Assess"

_OFFICIAL_TLD_LABELS = {".gov": "Official Government Source",
                        ".edu": "Official Educational Institution",
                        ".mil": "Official Military Source",
                        ".int": "International Organization"}
_EST_TLD_LABELS = {".org": "Established Organization",
                   ".net": "Established Network Service",
                   ".io": "Established Tech Service"}


def _map_lit(d: dict) -> Column:
    return F.create_map(*[F.lit(x) for kv in d.items() for x in kv])


def _with_credibility_layers(df: DataFrame, url_col: str):
    """Append ``__cred_tier/__cred_score/__cred_label`` via LAYERED
    projections (each layer's expressions reference the previous
    layer's columns).

    A single flat expression triple re-derived the whole score chain —
    the 647-domain InSets, the 24-keyword phishing chain, the map
    lookups — once per output column and once more per conditional
    branch; whole-stage codegen can't split or share subexpressions
    across ``CASE`` branches, so the fused projection's
    ``processNext()`` crossed janino's 64 KB method limit and the
    entire stage fell back to interpreted execution.  Layering works
    because ``CollapseProject`` only inlines an alias referenced more
    than once when it is CHEAP (attribute/literal), so each expensive
    sub-tree below stays materialized exactly once in the generated
    code.  Caller drops the ``__cred_*`` temporaries."""
    u = F.col(url_col)

    # L1: host parse
    raw_host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = F.regexp_replace(raw_host, r"^www\.", "")
    parts = F.split(host, r"\.")
    nparts = F.size(parts)
    l1 = df.select(
        "*",
        F.lower(F.regexp_extract(u, _PROTO_RE, 1)).alias("__cred_protocol"),
        raw_host.alias("__cred_raw_host"),
        host.alias("__cred_host"),
        F.when(nparts >= 2,
               F.concat(F.lit("."), F.element_at(parts, -1)))
        .otherwise(F.lit("")).alias("__cred_tld"),
        F.when(nparts >= 2, F.concat_ws(".", F.slice(parts, -2, 2)))
        .otherwise(host).alias("__cred_sld"),
        F.greatest(F.lit(0), F.size(parts) - F.lit(2)).alias("__cred_subs"),
    )

    protocol = F.col("__cred_protocol")
    raw_host = F.col("__cred_raw_host")
    host = F.col("__cred_host")
    tld = F.col("__cred_tld")
    sld = F.col("__cred_sld")
    subs = F.col("__cred_subs")

    tld_map = _map_lit(TLD_TRUST)
    cat_map = _map_lit(DOMAIN_CATEGORY)
    comm_map = _map_lit(COMMUNITY_PLATFORMS)

    # L2: per-signal scores and flags
    https_pts = F.when(protocol == "https", F.lit(10)).otherwise(F.lit(0))
    tld_pts = F.coalesce(F.try_element_at(tld_map, tld), F.lit(5))
    phishy = F.lit(False)
    for kw in PHISHING_KEYWORDS:
        phishy = phishy | host.contains(kw)
    l2 = l1.select(
        "*",
        (https_pts + tld_pts).alias("__cred_base"),
        (tld.isin(*OFFICIAL_TLDS) | host.isin(*OFFICIAL_DOMAINS)
         | sld.isin(*OFFICIAL_DOMAINS)).alias("__cred_official"),
        F.coalesce(F.try_element_at(cat_map, host),
                   F.try_element_at(cat_map, sld)).alias("__cred_category"),
        F.coalesce(F.try_element_at(comm_map, host),
                   F.try_element_at(comm_map, sld)).alias("__cred_comm"),
        (host.isin(*ESTABLISHED_DOMAINS)
         | sld.isin(*ESTABLISHED_DOMAINS)).alias("__cred_est"),
        phishy.alias("__cred_phishy"),
        (F.when(subs == 0, F.lit(15)).when(subs == 1, F.lit(10))
         .when(subs == 2, F.lit(5)).otherwise(F.lit(0)))
        .alias("__cred_structure_pts"),
        ((protocol == "") | (raw_host == "")).alias("__cred_invalid"),
    )

    base = F.col("__cred_base")
    official = F.col("__cred_official")
    category = F.col("__cred_category")
    comm = F.col("__cred_comm")
    est = F.col("__cred_est")
    invalid = F.col("__cred_invalid")

    # L3: composed score
    bonus = (F.when(comm.isNotNull(), F.lit(15))
             .when(est, F.lit(40)).otherwise(F.lit(0)))
    s1 = base + F.col("__cred_structure_pts") + bonus
    s2 = F.when(tld.isin(*SUSPICIOUS_TLDS), F.least(s1, F.lit(15))) \
        .otherwise(s1)
    s3 = F.when(F.col("__cred_phishy") & ~est & comm.isNull(),
                F.least(s2, F.lit(19))).otherwise(s2)
    l3 = l2.select(
        "*",
        F.greatest(F.lit(0), F.least(F.lit(100), s3)).alias("__cred_raw_score"),
    )

    score = F.col("__cred_raw_score")

    # L4: tier from score
    l4 = l3.select(
        "*",
        (F.when(score >= 90, F.lit("official"))
         .when(score >= 60, F.lit("established"))
         .when(score >= 40, F.lit("community"))
         .when(score >= 20, F.lit("new")).otherwise(F.lit("suspicious")))
        .alias("__cred_base_tier"),
    )

    tier = F.col("__cred_base_tier")

    # L5: final triple (everything below references computed columns,
    # so each branch duplicates only small when-chains)
    tier_label = (
        F.when(tier == "official", F.lit("Official Source"))
        .when(tier == "established",
              F.coalesce(F.try_element_at(_map_lit(_EST_TLD_LABELS), tld),
                         F.lit("Established Website")))
        .when(tier == "community",
              F.lit("Community or Independent Website"))
        .when(tier == "new",
              F.lit("Small or Recently Established Website"))
        .otherwise(
            F.when(tld.isin(*SUSPICIOUS_TLDS),
                   F.concat(F.lit("Free Domain TLD ("), tld,
                            F.lit(") — Exercise Caution")))
            .otherwise(F.lit("Unrecognized Domain — Exercise Caution"))))
    label = (F.when(comm.isNotNull(), comm)
             .when(est, F.coalesce(category, tier_label))
             .otherwise(tier_label))
    official_label = F.coalesce(
        F.try_element_at(_map_lit(_OFFICIAL_TLD_LABELS), tld),
        category, F.lit("Official Source"))
    official_score = F.least(F.lit(100), base + F.lit(55))

    return l4.select(
        "*",
        (F.when(invalid, F.lit("suspicious"))
         .when(official, F.lit("official")).otherwise(tier))
        .alias("__cred_tier"),
        (F.when(invalid, F.lit(0))
         .when(official, official_score).otherwise(score)
         .cast("bigint")).alias("__cred_score"),
        (F.when(invalid, F.lit(_INVALID_LABEL))
         .when(official, official_label).otherwise(label))
        .alias("__cred_label"),
    )


_CRED_TMP = ["__cred_protocol", "__cred_raw_host", "__cred_host",
             "__cred_tld", "__cred_sld", "__cred_subs", "__cred_base",
             "__cred_official", "__cred_category", "__cred_comm",
             "__cred_est", "__cred_phishy", "__cred_structure_pts",
             "__cred_invalid", "__cred_raw_score", "__cred_base_tier"]


def credibility_scores(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, tier, score, label) per row — builtin expressions only."""
    out = _with_credibility_layers(df, url_col)
    return out.select(F.col(url_col).alias("url"),
                      F.col("__cred_tier").alias("tier"),
                      F.col("__cred_score").alias("score"),
                      F.col("__cred_label").alias("label"))


def with_credibility(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append the trust-envelope columns (credibility_tier/score/label)
    to any DataFrame with a URL column — inline expressions, no join,
    no shuffle (the reference attaches the same envelope per result in
    ``buildResult``, pipeline.ts:1645+)."""
    out = _with_credibility_layers(df, url_col)
    return (out.withColumnsRenamed({"__cred_tier": "credibility_tier",
                                    "__cred_score": "credibility_score",
                                    "__cred_label": "credibility_label"})
            .drop(*_CRED_TMP))


# ── DuckDB oracle twin ──────────────────────────────────────────────────

def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _in_list(col: str, values) -> str:
    return f"{col} IN ({', '.join(_sq(v) for v in sorted(values))})"


def _case_lookup(col: str, mapping: dict) -> str:
    whens = " ".join(f"WHEN {_sq(k)} THEN {_sq(v)}"
                     for k, v in mapping.items())
    return f"CASE {col} {whens} ELSE NULL END"


def _case_int_lookup(col: str, mapping: dict, default: int) -> str:
    whens = " ".join(f"WHEN {_sq(k)} THEN {v}" for k, v in mapping.items())
    return f"CASE {col} {whens} ELSE {default} END"


def credibility_oracle_sql(urls_path: str) -> str:
    """Exact DuckDB twin of credibility_scores over a url parquet —
    generated from the same constant tables."""
    phishing = " OR ".join(
        f"host LIKE {_sq('%' + kw + '%')}" for kw in PHISHING_KEYWORDS)
    official_tld_label = _case_lookup("tld", _OFFICIAL_TLD_LABELS)
    est_tld_label = _case_lookup("tld", _EST_TLD_LABELS)
    return f"""
    WITH parsed AS (
      SELECT url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*):', 1))
          AS protocol,
        lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)',
                             1)) AS raw_host
      FROM '{urls_path}'
    ), h AS (
      SELECT *, regexp_replace(raw_host, '^www\\.', '') AS host FROM parsed
    ), g AS (
      SELECT url, protocol, raw_host, host,
        CASE WHEN len(string_split(host, '.')) >= 2
             THEN '.' || string_split(host, '.')[-1] ELSE '' END AS tld,
        CASE WHEN len(string_split(host, '.')) >= 2
             THEN string_split(host, '.')[-2] || '.'
                  || string_split(host, '.')[-1]
             ELSE host END AS sld,
        greatest(0, len(string_split(
            regexp_replace(raw_host, '^www\\.', ''), '.')) - 2) AS subs
      FROM h
    ), scored AS (
      SELECT url, protocol, raw_host, host, tld, sld, subs,
        (CASE WHEN protocol = 'https' THEN 10 ELSE 0 END)
          + ({_case_int_lookup('tld', TLD_TRUST, 5)}) AS base,
        ({_in_list('tld', OFFICIAL_TLDS)}
         OR {_in_list('host', OFFICIAL_DOMAINS)}
         OR {_in_list('sld', OFFICIAL_DOMAINS)}) AS official,
        coalesce({_case_lookup('host', DOMAIN_CATEGORY)},
                 {_case_lookup('sld', DOMAIN_CATEGORY)}) AS category,
        coalesce({_case_lookup('host', COMMUNITY_PLATFORMS)},
                 {_case_lookup('sld', COMMUNITY_PLATFORMS)}) AS comm,
        ({_in_list('host', ESTABLISHED_DOMAINS)}
         OR {_in_list('sld', ESTABLISHED_DOMAINS)}) AS est,
        ({phishing}) AS phishy
      FROM g
    ), s2 AS (
      SELECT *,
        base + (CASE subs WHEN 0 THEN 15 WHEN 1 THEN 10 WHEN 2 THEN 5
                ELSE 0 END)
             + (CASE WHEN comm IS NOT NULL THEN 15
                     WHEN est THEN 40 ELSE 0 END) AS s_raw
      FROM scored
    ), s3 AS (
      SELECT *,
        CASE WHEN {_in_list('tld', SUSPICIOUS_TLDS)}
             THEN least(s_raw, 15) ELSE s_raw END AS s_capped1
      FROM s2
    ), s4 AS (
      SELECT *,
        greatest(0, least(100,
          CASE WHEN phishy AND NOT est AND comm IS NULL
               THEN least(s_capped1, 19) ELSE s_capped1 END)) AS score_ne
      FROM s3
    ), tiered AS (
      SELECT *,
        CASE WHEN score_ne >= 90 THEN 'official'
             WHEN score_ne >= 60 THEN 'established'
             WHEN score_ne >= 40 THEN 'community'
             WHEN score_ne >= 20 THEN 'new'
             ELSE 'suspicious' END AS tier_ne
      FROM s4
    ), labeled AS (
      SELECT *,
        CASE tier_ne
          WHEN 'official' THEN 'Official Source'
          WHEN 'established' THEN
            coalesce({est_tld_label}, 'Established Website')
          WHEN 'community' THEN 'Community or Independent Website'
          WHEN 'new' THEN 'Small or Recently Established Website'
          ELSE CASE WHEN {_in_list('tld', SUSPICIOUS_TLDS)}
                    THEN 'Free Domain TLD (' || tld
                         || ') — Exercise Caution'
                    ELSE 'Unrecognized Domain — Exercise Caution' END
        END AS tier_label
      FROM tiered
    )
    SELECT url,
      CASE WHEN protocol = '' OR raw_host = '' THEN 'suspicious'
           WHEN official THEN 'official' ELSE tier_ne END AS tier,
      CAST(CASE WHEN protocol = '' OR raw_host = '' THEN 0
           WHEN official THEN least(100, base + 55)
           ELSE score_ne END AS BIGINT) AS score,
      CASE WHEN protocol = '' OR raw_host = ''
             THEN {_sq(_INVALID_LABEL)}
           WHEN official THEN
             coalesce({official_tld_label}, category, 'Official Source')
           WHEN comm IS NOT NULL THEN comm
           WHEN est THEN coalesce(category, tier_label)
           ELSE tier_label END AS label
    FROM labeled
    ORDER BY url
    """
