"""Cross-engine consensus as a grouped aggregation (cross-verify.ts).

The reference's per-query consensus loop becomes, at corpus scale, one
hash aggregation over (engine, position, url, title) result rows:

    scan → normalize-url projection (regex, codegen)
      → groupBy(normalized_url):
          ordered collect of (engine_idx, position) appearances,
          min_by title (first engine, then best rank — the
          reference's first-seen-title rule),
      → agreement / average-position arithmetic → sort

The active-engine count folds to a literal (the bm25 corpus-stats
precedent) — one tiny driver-side countDistinct before the plan is
built.  ``consensus_oracle_sql`` is the DuckDB twin over the same
parquet with the same regex normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"


def _normalized_url_expr(url_col):
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url_col, _HOST_RE, 1)), r"^www\.", "")
    path = F.regexp_extract(url_col, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(host, F.regexp_replace(path, r"/$", ""))


def consensus_results(df: DataFrame) -> DataFrame:
    """``df``: (engine string, engine_idx int, position int [1-based],
    url string, title string) → consensus rows sorted by agreement
    desc, average position asc (url as the deterministic tiebreak)."""
    n_active = df.select("engine").distinct().count()

    key = F.col("engine_idx") * 100000 + F.col("position")
    normalized = df.withColumn("norm_url",
                               _normalized_url_expr(F.col("url"))) \
                   .withColumn("__k", key)

    grouped = normalized.groupBy("norm_url").agg(
        F.min_by("title", F.col("__k")).alias("title"),
        F.transform(
            F.sort_array(F.collect_list(
                F.struct(F.col("engine_idx"), F.col("position"),
                         F.col("engine")))),
            lambda s: s.engine).alias("appears_in"),
        F.count("*").alias("n_appearances"),
        F.avg("position").alias("avg_position"),
    )
    return (
        grouped.select(
            F.col("norm_url").alias("url"),
            "title",
            "appears_in",
            F.round(F.col("n_appearances") / F.lit(max(n_active, 1)), 6)
            .alias("agreement_score"),
            F.round("avg_position", 6).alias("average_position"),
        )
        .orderBy(F.desc("agreement_score"), F.asc("average_position"),
                 F.asc("url"))
    )


def consensus_oracle_sql(parquet_path: str) -> str:
    return f"""
WITH t AS (
  SELECT engine, engine_idx, position, title,
         regexp_replace(lower(regexp_extract(url, '{_HOST_RE}', 1)),
                        '^www\\.', '')
         || regexp_replace(
              CASE WHEN regexp_extract(url, '{_PATH_RE}', 1) = ''
                   THEN '/' ELSE regexp_extract(url, '{_PATH_RE}', 1) END,
              '/$', '') AS norm_url,
         engine_idx * 100000 + position AS k
  FROM read_parquet('{parquet_path}')
), active AS (SELECT count(DISTINCT engine) AS n FROM t)
SELECT norm_url AS url,
       arg_min(title, k) AS title,
       array_to_string(list(engine ORDER BY engine_idx, position),
                       ',') AS appears_in,
       round(count(*) * 1.0 / greatest((SELECT n FROM active), 1), 6)
         AS agreement_score,
       round(avg(position), 6) AS average_position
FROM t
GROUP BY norm_url
ORDER BY agreement_score DESC, average_position ASC, url ASC
"""
