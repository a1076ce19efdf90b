"""PII detection / redaction — training-corpus scrubbing signals.

Engine addition for the training-data tier (public method: the
C4/RefinedWeb-style regex pass): count and redact emails, US-style
phone numbers, and IPv4 addresses per document.  All patterns are
deliberately RE2-safe AND Java-regex-safe (no lookaround, no
backreferences) with identical semantics in both engines, so the
DuckDB oracle is exact.

Scale: a narrow stateless projection — regexp_extract_all +
regexp_replace inside whole-stage codegen, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{0,2}[ .-]?\(?[0-9]{3}\)?[ .-][0-9]{3}[ .-][0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

_REPLACEMENTS = [(EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>"),
                 (IPV4_RE, "<IP>")]


def pii_signals(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, n_emails, n_phones, n_ips, has_pii, redacted)."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
    n_ips = F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0)))
    redacted = t
    for pattern, token in _REPLACEMENTS:
        redacted = F.regexp_replace(redacted, pattern, token)
    return df.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        ((n_emails + n_phones + n_ips) > 0).alias("has_pii"),
        redacted.alias("redacted"),
    )


def pii_oracle_sql(parquet_path: str) -> str:
    """DuckDB twin (regexp_replace needs the 'g' flag to match Spark's
    replace-all default; ordering of the three passes matters — emails
    first so user@host IPs-in-hostnames don't pre-redact)."""
    return f"""
SELECT doc_id,
  len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
  len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
  len(regexp_extract_all(text, '{IPV4_RE}')) AS n_ips,
  (len(regexp_extract_all(text, '{EMAIL_RE}'))
   + len(regexp_extract_all(text, '{PHONE_RE}'))
   + len(regexp_extract_all(text, '{IPV4_RE}'))) > 0 AS has_pii,
  regexp_replace(regexp_replace(regexp_replace(text,
    '{EMAIL_RE}', '<EMAIL>', 'g'),
    '{PHONE_RE}', '<PHONE>', 'g'),
    '{IPV4_RE}', '<IP>', 'g') AS redacted
FROM read_parquet('{parquet_path}')
ORDER BY doc_id
"""
