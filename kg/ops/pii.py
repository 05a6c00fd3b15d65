"""PII scrubbing for training corpora: redact emails, IPv4 addresses and
phone-like digit runs, with per-class counts (the standard pre-training
hygiene pass; cf. public corpus pipelines like C4/RefinedWeb).

Sequential, deterministic pipeline (order matters and is part of the spec —
emails are redacted before phones so an address's digits are never
double-counted as a phone):

    t1 = text  with emails  -> <EMAIL>     (n_emails  counted on text)
    t2 = t1    with IPv4s   -> <IP>        (n_ips     counted on t1)
    t3 = t2    with phones  -> <PHONE>     (n_phones  counted on t2)

Patterns are dialect-neutral (no lookaround, no backrefs) so the identical
regexes run under Java regex (Spark, codegen) and RE2 (DuckDB oracle).
All built-in column expressions — pure map, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["EMAIL_RE", "IPV4_RE", "PHONE_RE", "redact_pii"]

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
#: international-ish digit runs: optional +, 9+ total chars of digits,
#: spaces, dashes or parens, starting and ending on a digit
PHONE_RE = r"\+?\d[\d ()-]{7,}\d"


def redact_pii(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, text_redacted, n_emails, n_ips, n_phones) per document."""
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return docs.select(
        id_col,
        t3.alias("text_redacted"),
        F.regexp_count(t0, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t1, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(t2, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
    )
