"""Corpus challenge-page gate (challenge-detection.ts batch face).

A Common-Crawl-style corpus is full of 200-status bot-challenge
interstitials ("Just a moment…", "Press & Hold", DataDome iframes,
SPA shells) that pass length gates and look like pages.  The
reference runs detectChallenge per fetch and escalates to a browser
challenge-solver (pipeline.ts:1389-1440 — the solver is N/A here);
at batch scale the detection IS the operator: stamp every row so the
training pipeline drops challenge pages before extraction — the same
corpus-hygiene position as the safe-browsing and SSRF gates
(operators/safety.py).

One vectorized Arrow UDF over (html, status), no shuffle; pure
scoring in pure/challenge_detection.py (both reference suites ported,
tests/test_challenge_detection_ref.py).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_RESULT = ("struct<is_challenge:boolean,challenge_type:string,"
           "challenge_confidence:double>")


def challenge_signals(df: DataFrame, html_col: str = "html",
                      status_col: Optional[str] = None) -> DataFrame:
    """Adds (is_challenge, challenge_type, challenge_confidence).

    ``html_col`` may be binary (decoded as UTF-8 with replacement —
    the detector is substring-based, so lossy decode of binary
    payloads is harmless) or string.  ``status_col`` optionally feeds
    the HTTP status into the scorers (403/503/429 signals)."""

    @pandas_udf(_RESULT)
    def run(htmls: pd.Series, statuses: pd.Series) -> pd.DataFrame:
        from webpeel_spark.pure.challenge_detection import detect_challenge

        rows = []
        for payload, status in zip(htmls, statuses):
            if payload is None:
                text = ""
            elif isinstance(payload, (bytes, bytearray, memoryview)):
                text = bytes(payload).decode("utf-8", "replace")
            else:
                text = payload
            st = int(status) if status is not None and not pd.isna(status) \
                else None
            r = detect_challenge(text, st)
            rows.append((r["is_challenge"], r["type"], r["confidence"]))
        return pd.DataFrame(rows, columns=[
            "is_challenge", "challenge_type", "challenge_confidence"])

    status = (F.col(status_col).cast("int") if status_col
              else F.lit(None).cast("int"))
    return (df.withColumn("__c", run(F.col(html_col), status))
            .withColumn("is_challenge", F.col("__c.is_challenge"))
            .withColumn("challenge_type", F.col("__c.challenge_type"))
            .withColumn("challenge_confidence",
                        F.col("__c.challenge_confidence"))
            .drop("__c"))
