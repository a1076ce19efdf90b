"""Corpus-scale transcript formatting — all-Catalyst twin of
pure/transcript_export.py (transcript-export.ts).

Transcripts are a first-class training-data modality (audio/video →
aligned text segments); formatting millions of them is a grouped
string aggregation, not per-row Python:

    scan(video_id, seg_index, start, duration, text, title, channel)
      → groupBy(video_id): ordered segment collect
      → transform() index lambdas build SRT blocks / markdown lines
      → array_join — everything whole-stage-codegen, one shuffle.

``transcripts_oracle_sql`` renders the identical strings in DuckDB
(list aggregation ordered by seg_index + list_transform over a range)
so the driver check is byte-exact.
"""

from __future__ import annotations

# module-level on purpose: with `from __future__ import annotations`
# the pandas_udf type hints are STRINGS, and pyspark resolves them in
# this module's globals — a function-local import leaves 'pd'
# unresolvable and pandas_udf rejects the signature
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pad2(c: Column) -> Column:
    return F.lpad(c.cast("string"), 2, "0")


def _srt_ts(sec: Column) -> Column:
    total_ms = F.round(F.greatest(sec, F.lit(0.0)) * 1000).cast("long")
    return F.concat(
        _pad2(F.floor(total_ms / 3600000)), F.lit(":"),
        _pad2(F.floor(total_ms / 60000) % 60), F.lit(":"),
        _pad2(F.floor(total_ms / 1000) % 60), F.lit(","),
        F.lpad((total_ms % 1000).cast("string"), 3, "0"))


def _readable_ts(sec: Column) -> Column:
    total_sec = F.floor(F.greatest(sec, F.lit(0.0))).cast("long")
    h = F.floor(total_sec / 3600)
    m = F.floor(total_sec / 60) % 60
    s = total_sec % 60
    return F.when(h > 0, F.concat(h.cast("string"), F.lit(":"),
                                  _pad2(m), F.lit(":"), _pad2(s))) \
            .otherwise(F.concat(m.cast("string"), F.lit(":"), _pad2(s)))


def transcript_exports(df: DataFrame) -> DataFrame:
    """(video_id, title, channel, seg_index, start, duration, text) →
    one row per video with srt / txt / markdown renderings."""
    segs = F.sort_array(F.collect_list(
        F.struct("seg_index", "start", "duration", "text")))

    def srt_block(s: Column, i: Column) -> Column:
        return F.concat(
            (i + 1).cast("string"), F.lit("\n"),
            _srt_ts(s.start), F.lit(" --> "),
            _srt_ts(s.start + F.greatest(s.duration, F.lit(0.0))),
            F.lit("\n"), s.text)

    def md_line(s: Column) -> Column:
        return F.concat(F.lit("**["), _readable_ts(s.start),
                        F.lit("]** "), s.text)

    grouped = df.groupBy("video_id").agg(
        F.first("title").alias("title"),
        F.first("channel").alias("channel"),
        segs.alias("__segs"),
    )
    title = F.when(F.col("title") == "", "Transcript") \
        .otherwise(F.col("title"))
    header = F.concat(
        F.lit("# "), title, F.lit("\n\n"),
        F.when(F.col("channel") != "",
               F.concat(F.lit("**Channel:** "), F.col("channel"),
                        F.lit("\n\n"))).otherwise(F.lit("")),
        F.lit("## Transcript\n\n"))
    return grouped.select(
        "video_id",
        F.array_join(F.transform(F.col("__segs"), srt_block), "\n\n")
        .alias("srt"),
        F.array_join(F.transform(F.col("__segs"), lambda s: s.text), "\n")
        .alias("txt"),
        F.concat(header,
                 F.array_join(F.transform(F.col("__segs"), md_line), "\n"))
        .alias("markdown"),
    )


def _sql_srt_ts(ms: str) -> str:
    return (f"lpad(CAST(({ms}) // 3600000 AS VARCHAR), 2, '0') || ':' || "
            f"lpad(CAST(({ms}) // 60000 % 60 AS VARCHAR), 2, '0') || ':' || "
            f"lpad(CAST(({ms}) // 1000 % 60 AS VARCHAR), 2, '0') || ',' || "
            f"lpad(CAST(({ms}) % 1000 AS VARCHAR), 3, '0')")


def transcripts_oracle_sql(parquet_path: str) -> str:
    start_ms = "CAST(round(greatest(segs[i].start, 0) * 1000) AS BIGINT)"
    end_ms = ("CAST(round((segs[i].start + greatest(segs[i].duration, 0)) "
              "* 1000) AS BIGINT)")
    tsec = "CAST(floor(greatest(s.start, 0)) AS BIGINT)"
    readable = (
        f"CASE WHEN {tsec} >= 3600 THEN CAST({tsec} // 3600 AS VARCHAR)"
        f" || ':' || lpad(CAST({tsec} // 60 % 60 AS VARCHAR), 2, '0')"
        f" || ':' || lpad(CAST({tsec} % 60 AS VARCHAR), 2, '0')"
        f" ELSE CAST({tsec} // 60 AS VARCHAR)"
        f" || ':' || lpad(CAST({tsec} % 60 AS VARCHAR), 2, '0') END")
    return f"""
WITH g AS (
  SELECT video_id,
         any_value(title) AS title,
         any_value(channel) AS channel,
         list(struct_pack(seg_index := seg_index, start := start,
                          duration := duration, text := text)
              ORDER BY seg_index) AS segs
  FROM read_parquet('{parquet_path}')
  GROUP BY video_id
)
SELECT video_id,
  array_to_string(list_transform(range(1, len(segs) + 1), i ->
    CAST(i AS VARCHAR) || chr(10) ||
    {_sql_srt_ts(start_ms)} || ' --> ' || {_sql_srt_ts(end_ms)} ||
    chr(10) || segs[i].text
  ), chr(10) || chr(10)) AS srt,
  array_to_string(list_transform(segs, s -> s.text), chr(10)) AS txt,
  '# ' || CASE WHEN title = '' THEN 'Transcript' ELSE title END
    || chr(10) || chr(10)
    || CASE WHEN channel <> ''
            THEN '**Channel:** ' || channel || chr(10) || chr(10)
            ELSE '' END
    || '## Transcript' || chr(10) || chr(10)
    || array_to_string(list_transform(segs, s ->
         '**[' || {readable} || ']** ' || s.text), chr(10)) AS markdown
FROM g
ORDER BY video_id
"""


def parse_youtube_pages(df: DataFrame, url_col: str = "url",
                        html_col: str = "html") -> DataFrame:
    """youtube.ts pure-parser batch face (round 6): corpus rows whose
    url is a YouTube watch/shorts/embed page parse into structured
    video-info rows — the ytInitialPlayerResponse JSON embedded in the
    page html, with the reference's videoDetails → microformat →
    og-meta fallback chains (extract_video_info) plus the
    caption-track inventory.  One Arrow UDF, rows without a valid
    video id or parseable player response are dropped (the
    reference's null-return)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    schema = ("video_id string, title string, channel string, "
              "description string, duration string, publish_date string, "
              "view_count string, thumbnail string, n_caption_tracks int, "
              "caption_langs array<string>")

    @pandas_udf(f"struct<{schema}>")
    def parse(urls: "pd.Series", htmls: "pd.Series") -> "pd.DataFrame":
        from webpeel_spark.pure.youtube import (
            extract_caption_tracks, extract_player_response,
            extract_video_info, parse_youtube_url,
        )

        rows = []
        for url, payload in zip(urls, htmls):
            vid = parse_youtube_url(url or "")
            text = None
            if vid:
                if isinstance(payload, (bytes, bytearray, memoryview)):
                    text = bytes(payload).decode("utf-8", "replace")
                else:
                    text = payload or ""
            # parse the embedded player JSON ONCE per row (real watch
            # pages are ~1 MB; info and caption tracks share it)
            pr = extract_player_response(text) if text else None
            info = extract_video_info(text, pr) if text else None
            if not vid or info is None or not info["videoId"]:
                rows.append((None,) * 8 + (None, None))
                continue
            tracks = extract_caption_tracks(pr or {})
            rows.append((info["videoId"], info["title"], info["channel"],
                         info["description"], info["duration"],
                         info["publishDate"], info["viewCount"],
                         info["thumbnail"], len(tracks),
                         [t["languageCode"] for t in tracks]))
        return pd.DataFrame(rows, columns=[
            "video_id", "title", "channel", "description", "duration",
            "publish_date", "view_count", "thumbnail",
            "n_caption_tracks", "caption_langs"])

    out = df.withColumn("__yt", parse(F.col(url_col), F.col(html_col)))
    return (out.filter(F.col("__yt.video_id").isNotNull())
            .select(url_col, "__yt.*"))
