"""The extraction operator — one Arrow-batched ``mapInPandas`` stage.

North-rule core (BASELINE.json): a single vectorized pandas/Arrow UDF
stage that takes ``(url, html:binary)`` rows and emits the full
extraction envelope (cleaned main-content markdown, metadata chains,
links, quality, spans).  The per-row logic is the pure layer
(webpeel_spark.pure.pipeline.extract_page — reference parity cited
there); this module is only Spark wiring:

* column pruning — only ``url`` and ``html`` feed the UDF; Catalyst
  prunes the parquet scan to those columns (check ``ReadSchema`` in
  ``.explain``).
* explicit ``repartition(n, xxhash64(url))`` — uniform spread of
  documents over executors regardless of host skew (URL hash is
  uniform even when hosts are Zipf-heavy).
* per-row error isolation — a bad document yields a ``status='error'``
  row, never a task failure (peelBatch semantics, index.ts:277-313).
"""

from __future__ import annotations

from typing import Iterator, Optional, Union

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

CHUNK_SCHEMA = StructType([
    StructField("index", IntegerType()),
    StructField("text", StringType()),
    StructField("token_count", IntegerType()),
    StructField("word_count", IntegerType()),
    StructField("section", StringType()),
    StructField("section_depth", IntegerType()),
    StructField("start_offset", LongType()),
    StructField("end_offset", LongType()),
])

EXTRACT_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("status", StringType(), False),
    StructField("error", StringType(), True),
    StructField("branch", StringType(), False),
    StructField("extractor", StringType(), False),
    StructField("method", StringType(), False),
    StructField("title", StringType(), True),
    StructField("content", StringType(), True),
    StructField("description", StringType(), True),
    StructField("author", StringType(), True),
    StructField("published", StringType(), True),
    StructField("language", StringType(), True),
    StructField("canonical", StringType(), True),
    StructField("image", StringType(), True),
    StructField("word_count", IntegerType(), False),
    StructField("token_estimate", IntegerType(), False),
    StructField("quality", DoubleType(), False),
    StructField("links", ArrayType(StringType()), False),
    StructField("link_count", IntegerType(), False),
    # links.ts {url, text} pairs — anchor text alongside the url list
    StructField("link_pairs", ArrayType(StructType([
        StructField("url", StringType(), False),
        StructField("text", StringType(), True),
    ])), False),
    StructField("chunks", ArrayType(CHUNK_SCHEMA), False),
    StructField("fingerprint", StringType(), False),
    StructField("content_len", LongType(), False),
    StructField("html_len", LongType(), False),
    StructField("pruned_percent", IntegerType(), False),
    StructField("auth_required", BooleanType(), False),
    StructField("injection_detected", BooleanType(), False),
])

_COLUMNS = [f.name for f in EXTRACT_SCHEMA.fields]


def _make_extract_fn(options_tuple):
    """Build the batch function with options captured in the closure.

    Imports happen inside so executors resolve webpeel_spark from
    --py-files; module state (compiled regexes, selector cache) is
    initialized once per worker and amortized over all Arrow batches
    (the Spark analog of the reference's singleton TurndownService,
    markdown.ts:538-578).
    """

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from webpeel_spark.pure.pipeline import ExtractOptions, extract_page

        options = ExtractOptions(*options_tuple)
        for pdf in batches:
            urls = pdf["url"].tolist()
            payloads = pdf["html"].tolist()
            rows = []
            for url, payload in zip(urls, payloads):
                if payload is None:
                    payload = b""
                elif isinstance(payload, memoryview):
                    payload = payload.tobytes()
                r = extract_page(url, payload, options)
                rows.append(tuple(r[c] for c in _COLUMNS))
            yield pd.DataFrame(rows, columns=_COLUMNS)

    return extract_batches


def extract_pages(df: DataFrame, options=None,
                  num_partitions: Optional[int] = None) -> DataFrame:
    """Run the extraction UDF stage over a pages DataFrame.

    ``df`` must have ``url:string`` and ``html:binary`` columns; all
    others are pruned before the UDF (keeps Arrow transfer minimal).
    """
    from webpeel_spark.pure.pipeline import DEFAULT_OPTIONS

    if options is None:
        options = DEFAULT_OPTIONS
    pruned = df.select("url", "html")
    if num_partitions:
        pruned = pruned.repartition(num_partitions, F.xxhash64("url"))
    return pruned.mapInPandas(_make_extract_fn(tuple(options)), EXTRACT_SCHEMA)


LISTING_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("item_index", IntegerType(), False),
    StructField("title", StringType(), True),
    StructField("price", StringType(), True),
    StructField("image", StringType(), True),
    StructField("link", StringType(), True),
    StructField("rating", StringType(), True),
    StructField("description", StringType(), True),
])


def _per_page_udtf(df: DataFrame, schema: StructType, rows_factory,
                   num_partitions: Optional[int] = None) -> DataFrame:
    """Shared shape of the UDTF-style per-page operators: the
    ``(url, html)`` projection, optional explicit url-hash
    repartition, Arrow-batched decode, and FULL per-row isolation —
    the parse AND the row-explosion both run inside the try, so one
    malformed item dict drops that page's rows instead of failing the
    whole task (the module contract at the top of this file; the
    previous per-operator copies guarded only the parse call).

    ``rows_factory`` runs once per python worker and returns
    ``rows(url, html) -> iterable of output tuples`` — pure-layer
    imports belong inside it so executors resolve them locally.
    Row building is all-or-nothing per page (the iterable is
    materialized before extending the batch)."""
    cols = [f.name for f in schema.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows_fn = rows_factory()
        for pdf in it:
            out = []
            for url, payload in zip(pdf["url"], pdf["html"]):
                if payload is None:
                    continue
                if isinstance(payload, memoryview):
                    payload = payload.tobytes()
                try:
                    html = payload.decode("utf-8", errors="replace")
                    page_rows = list(rows_fn(url, html))
                except Exception:
                    continue  # per-row isolation: bad page → no rows
                out.extend(page_rows)
            yield pd.DataFrame(out, columns=cols)

    pruned = df.select("url", "html")
    if num_partitions:
        pruned = pruned.repartition(num_partitions, F.xxhash64("url"))
    return pruned.mapInPandas(batches, schema)


def extract_listings_pages(df: DataFrame,
                           num_partitions: Optional[int] = None) -> DataFrame:
    """UDTF-shaped listing auto-extraction: one input page row → N output
    item rows (extract-listings.ts:483-500 semantics via the pure port).
    Pages with no detectable listing pattern produce zero rows."""

    def factory():
        from webpeel_spark.pure.listings import extract_listings

        def rows(url, html):
            return [
                (url, i, item.get("title"), item.get("price"),
                 item.get("image"), item.get("link"),
                 item.get("rating"), item.get("description"))
                for i, item in enumerate(extract_listings(html, url))
            ]
        return rows

    return _per_page_udtf(df, LISTING_SCHEMA, factory, num_partitions)


AUTO_EXTRACT_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("page_type", StringType(), False),
    StructField("n_items", IntegerType(), False),
    StructField("headline", StringType(), True),
    StructField("is_spa", BooleanType(), False),
    StructField("payload", StringType(), False),
])

_AUTO_COUNT_KEY = {"pricing": "plans", "products": "items",
                   "contact": "emails", "article": "sections",
                   "api_docs": "endpoints"}


def auto_extract_pages(df: DataFrame,
                       num_partitions: Optional[int] = None) -> DataFrame:
    """Heuristic structured extraction per page (auto-extract.ts:708-749
    via the pure port): page-type detection + type-specific fields,
    flattened to (url, page_type, n_items, headline, is_spa, payload)
    with the full typed result as a JSON string.  One narrow
    mapInPandas stage, same shape as extract_pages."""

    def factory():
        import json

        from webpeel_spark.pure.auto_extract import (auto_extract,
                                                     has_spa_indicators)

        def rows(url, html):
            result = auto_extract(html, url)
            is_spa = has_spa_indicators(html)
            ptype = result["type"]
            items = result.get(_AUTO_COUNT_KEY.get(ptype, ""), [])
            if ptype == "pricing":
                headline = items[0]["name"] if items else None
            elif ptype == "products":
                headline = items[0]["name"] if items else None
            elif ptype == "contact":
                headline = items[0] if items else None
            elif ptype == "article":
                headline = result.get("title")
            elif ptype == "api_docs":
                headline = result.get("baseUrl")
            else:
                headline = None
            return [(url, ptype, len(items), headline, is_spa,
                     json.dumps(result, sort_keys=True))]
        return rows

    return _per_page_udtf(df, AUTO_EXTRACT_SCHEMA, factory, num_partitions)


OBSERVE_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("category", StringType(), False),
    StructField("ref", StringType(), False),
    StructField("tag", StringType(), False),
    StructField("selector", StringType(), False),
    StructField("text", StringType(), True),
    StructField("role", StringType(), False),
    StructField("attributes", StringType(), False),
])


def observe_pages(df: DataFrame,
                  num_partitions: Optional[int] = None) -> DataFrame:
    """Interactive-element inventory per page (observe.ts in-page
    extraction via the pure port), exploded to one row per element —
    UDTF-shaped like extract_images_pages."""

    def factory():
        import json

        from webpeel_spark.pure.observe import observe_html

        def rows(url, html):
            result = observe_html(html, url)
            return [
                (url, category, item["ref"], item["tag"],
                 item["selector"], item["text"], item["role"],
                 json.dumps(item["attributes"], sort_keys=True))
                for category, items in result["elements"].items()
                for item in items
            ]
        return rows

    return _per_page_udtf(df, OBSERVE_SCHEMA, factory, num_partitions)


LINK_PAIR_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("link_url", StringType(), False),
    StructField("link_text", StringType(), True),
])


def extract_link_pairs_pages(df: DataFrame,
                             num_partitions: Optional[int] = None
                             ) -> DataFrame:
    """{url, text} link pairs per page (links.ts port), exploded."""

    def factory():
        from webpeel_spark.pure.links import extract_link_pairs

        def rows(url, html):
            return [(url, p["url"], p["text"])
                    for p in extract_link_pairs(html, url)]
        return rows

    return _per_page_udtf(df, LINK_PAIR_SCHEMA, factory, num_partitions)


IMAGE_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("src", StringType(), False),
    StructField("alt", StringType(), True),
    StructField("title", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])


def extract_images_pages(df: DataFrame,
                         num_partitions: Optional[int] = None) -> DataFrame:
    """Image inventory per page (metadata.ts:292-402 semantics via the
    pure port): img[src] + picture>source[srcset] + CSS background
    url(), absolutized, deduped by src — exploded to one row per image."""

    def factory():
        from webpeel_spark.pure.metadata import extract_images

        def rows(url, html):
            return [(url, im.src, im.alt, im.title, im.width, im.height)
                    for im in extract_images(html, url)]
        return rows

    return _per_page_udtf(df, IMAGE_SCHEMA, factory, num_partitions)


def _change_status() -> Column:
    """THE added/removed/changed/unchanged rule (change-tracking.ts
    fingerprint diff) over ``__fp_old``/``__fp_new`` — one definition
    shared by change_detection and change_detection_with_diff so the
    two can never drift."""
    return (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )


def change_detection(old: DataFrame, new: DataFrame) -> DataFrame:
    """Batch change tracking — the engine-scale analog of watch.ts +
    change-tracking.ts (sha256 fingerprint diff, pipeline.ts:1608-1616):
    full-outer join of two extraction snapshots on url, classifying
    each url as added / removed / changed / unchanged.  One shuffle on
    url (both sides usually already hash-partitioned by url)."""
    o = old.select(F.col("url"), F.col("fingerprint").alias("__fp_old"))
    n = new.select(F.col("url"), F.col("fingerprint").alias("__fp_new"))
    joined = o.join(n, "url", "full_outer")
    status = _change_status()
    return joined.select(
        "url", status.alias("change"),
        F.col("__fp_old").alias("fingerprint_old"),
        F.col("__fp_new").alias("fingerprint_new"),
    )


def change_detection_with_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """change_detection plus line-diff statistics for changed urls
    (the watch-mode enrichment, change-tracking.ts:93-176): additions /
    deletions from the LCS line diff of the two extracted contents.

    Plan shape: the fingerprint classify join carries both content
    columns; the O(lines²) LCS runs in an Arrow-batched UDF ONLY on
    rows classified 'changed' (added/removed/unchanged rows keep null
    stats without invoking Python)."""
    import pandas as pd

    o = old.select(F.col("url"), F.col("fingerprint").alias("__fp_old"),
                   F.col("content").alias("__c_old"))
    n = new.select(F.col("url"), F.col("fingerprint").alias("__fp_new"),
                   F.col("content").alias("__c_new"))
    joined = o.join(n, "url", "full_outer")
    classified = joined.withColumn("change", _change_status())

    def diff_batches(batches):
        from webpeel_spark.pure.diffs import compute_diff

        for pdf in batches:
            rows = []
            for url, c_old, c_new in zip(pdf["url"], pdf["__c_old"],
                                         pdf["__c_new"]):
                d = compute_diff(c_old or "", c_new or "")
                rows.append((url, d.additions, d.deletions))
            yield pd.DataFrame(rows,
                               columns=["url", "additions", "deletions"])

    changed = classified.filter(F.col("change") == "changed")
    diffs = changed.select("url", "__c_old", "__c_new").mapInPandas(
        diff_batches, "url string, additions int, deletions int")
    return (
        classified.select(
            "url", "change",
            F.col("__fp_old").alias("fingerprint_old"),
            F.col("__fp_new").alias("fingerprint_new"))
        .join(diffs, "url", "left")
    )


SITEMAP_SCHEMA = StructType([
    StructField("sitemap_url", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("entry", StringType(), False),
    StructField("lastmod", StringType(), True),
    StructField("changefreq", StringType(), True),
    StructField("priority", DoubleType(), True),
])


def sitemap_parse_pages(df: DataFrame,
                        num_partitions: Optional[int] = None,
                        max_urls: int = 10000) -> DataFrame:
    """Stored sitemap XML → one row per entry (sitemap.ts parse core).
    Index files yield kind='index' rows whose entry is the child
    sitemap url — the reference's recursive fetch becomes a self-join
    against the stored corpus when the child is present."""

    def factory():
        from webpeel_spark.pure.sitemap import parse_sitemap_xml

        def rows(url, xml):
            parsed = parse_sitemap_xml(xml, max_urls=max_urls)
            out = [(url, "index", child, None, None, None)
                   for child in parsed["sitemaps"]]
            out.extend((url, "urlset", e["url"], e.get("lastmod"),
                        e.get("changefreq"), e.get("priority"))
                       for e in parsed["urls"])
            return out
        return rows

    return _per_page_udtf(df, SITEMAP_SCHEMA, factory, num_partitions)


SERP_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("position", IntegerType(), False),
    StructField("title", StringType(), False),
    StructField("result_url", StringType(), False),
    StructField("snippet", StringType(), False),
    StructField("n_paa", IntegerType(), False),
    StructField("n_related", IntegerType(), False),
    StructField("has_knowledge_panel", BooleanType(), False),
    StructField("total_results", StringType(), True),
])


def serp_parse_pages(df: DataFrame,
                     num_partitions: Optional[int] = None) -> DataFrame:
    """Stored Google SERP pages → one row per organic result, with
    page-level block counts (google-serp-parser.ts via the pure port)."""

    def factory():
        from webpeel_spark.pure.serp import parse_google_serp

        def rows(url, html):
            serp = parse_google_serp(html)
            n_paa = len(serp.get("people_also_ask", []))
            n_rel = len(serp.get("related_searches", []))
            has_kp = "knowledge_panel" in serp
            total = serp.get("total_results")
            return [(url, o["position"], o["title"], o["url"],
                     o["snippet"], n_paa, n_rel, has_kp, total)
                    for o in serp["organic_results"]]
        return rows

    return _per_page_udtf(df, SERP_SCHEMA, factory, num_partitions)


BUSINESS_INTEL_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("name", StringType(), True),
    StructField("industry", StringType(), True),
    StructField("tech_stack", ArrayType(StringType()), False),
    StructField("social_platforms", ArrayType(StringType()), False),
    StructField("pricing_plans", IntegerType(), False),
    StructField("founded", StringType(), True),
])


def business_intel_pages(df: DataFrame,
                         num_partitions: Optional[int] = None) -> DataFrame:
    """Per-page business-intelligence signals (business-intel.ts pure
    analyzers): schema.org/OG company facts, tech-stack fingerprints,
    social links, pricing plans, industry vote."""

    def factory():
        from webpeel_spark.pure.business_intel import business_intel

        def rows(url, html):
            intel = business_intel(html)
            return [(url, intel.get("name"), intel.get("industry"),
                     intel["tech_stack"],
                     [s["platform"] for s in intel["social_media"]],
                     len(intel["pricing"]), intel.get("founded"))]
        return rows

    return _per_page_udtf(df, BUSINESS_INTEL_SCHEMA, factory,
                          num_partitions)


def semantic_diff_snapshots(old: DataFrame, new: DataFrame) -> DataFrame:
    """Structured semantic diff between two extraction snapshots — the
    /diff endpoint's compute core (diff.ts) at corpus scale: JSON
    content gets a dot-notation field diff, text/markdown an
    LCS-sectioned diff keyed by the nearest heading.  Same plan shape
    as change_detection_with_diff: fingerprint classify join, the
    O(lines²) diff UDF only ever sees rows classified 'changed'."""
    import pandas as pd

    o = old.select(F.col("url"), F.col("fingerprint").alias("__fp_old"),
                   F.col("content").alias("__c_old"))
    n = new.select(F.col("url"), F.col("fingerprint").alias("__fp_new"),
                   F.col("content").alias("__c_new"))
    joined = o.join(n, "url", "inner")
    classified = joined.withColumn(
        "changed", F.col("__fp_old") != F.col("__fp_new"))

    def diff_batches(batches):
        from webpeel_spark.pure.semantic_diff import semantic_diff

        for pdf in batches:
            rows = []
            for url, c_old, c_new in zip(pdf["url"], pdf["__c_old"],
                                         pdf["__c_new"]):
                d = semantic_diff(c_old or "", c_new or "")
                rows.append((url, d["mode"], len(d["changes"]),
                             d["summary"], d["lines_added"],
                             d["lines_removed"]))
            yield pd.DataFrame(rows, columns=[
                "url", "mode", "n_changes", "summary",
                "lines_added", "lines_removed"])

    diffs = (classified.filter("changed")
             .select("url", "__c_old", "__c_new")
             .mapInPandas(diff_batches,
                          "url string, mode string, n_changes int, "
                          "summary string, lines_added int, "
                          "lines_removed int"))
    return (
        classified.select("url", "changed")
        .join(diffs, "url", "left")
        .select("url", "changed", "mode",
                F.coalesce("n_changes", F.lit(0)).alias("n_changes"),
                F.coalesce("summary", F.lit("No changes detected."))
                .alias("summary"),
                F.coalesce("lines_added", F.lit(0)).alias("lines_added"),
                F.coalesce("lines_removed", F.lit(0)).alias("lines_removed"))
    )


def deterministic_avg(col: Union[str, Column], scale: int = 100) -> Column:
    """Partition-order-invariant 4-decimal average of a fixed-point
    column (aggregate expression; use inside ``.agg(...)``).

    ``avg(double)`` sums doubles in whatever order the partial
    aggregates arrive, so at a 4-dp rounding boundary the result flips
    between runs / core counts (observed: the round-4 driver at 32
    cores vs local[8]).  Instead sum the EXACT integer representation
    (``quality`` is 2-decimal by construction → ``round(q*100)`` is an
    integer; ``pruned_percent`` is already an int → scale=1), derive
    basis points with one correctly-rounded IEEE division + one
    round-to-integer, and divide by 10^4.  Every step is
    order-independent and reproducible bit-for-bit by the DuckDB
    oracles (same formula, same IEEE ops, same operand order).
    """
    if 10000 % scale:
        # the DuckDB twin (_det_avg_sql) computes the factor with
        # integer division; a non-divisor scale would make the two
        # "bit-identical" formulas silently diverge (10000.0/3 vs 3333)
        raise ValueError(f"scale must divide 10000: {scale}")
    c = F.col(col) if isinstance(col, str) else col
    int_sum = F.sum(F.round(c * scale, 0).cast("long"))
    bp = F.round(int_sum * F.lit(float(10000 // scale))
                 / F.count(F.lit(1)), 0)
    return bp / F.lit(10000.0)


# (deterministic_avg_bp was deleted in round 8: lineage tables now
# store quality_bp_sum — a plain BIGINT SUM of round(quality*100) —
# instead of a half-up `div` average, removing integer division from
# the oracle/hash boundary entirely; the mean stays derivable as
# quality_bp_sum/row_count.)


def extraction_metrics(result: DataFrame) -> DataFrame:
    """Job-level rollup (cleaning-stats analog, markdown.ts:59-157):
    hash-agg with partial+final combine — all built-in Catalyst.
    Averages use :func:`deterministic_avg` so the rollup is invariant
    to partitioning (contract queries put these at the oracle
    boundary)."""
    return result.groupBy("branch", "status").agg(
        F.count("*").alias("docs"),
        F.sum("token_estimate").alias("tokens"),
        deterministic_avg("quality", 100).alias("avg_quality"),
        F.sum("content_len").alias("content_bytes"),
        F.sum("html_len").alias("input_bytes"),
        deterministic_avg("pruned_percent", 1).alias("avg_pruned_pct"),
    )
