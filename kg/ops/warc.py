"""WARC (ISO 28500) segment assembly and parsing — the Common-Crawl-native
ingest format, as a pair of exact inverses.

The reference service receives documents one at a time over HTTP
(/root/reference/src/hu_entity/server.py — an aiohttp ``/ner`` endpoint);
a crawl-scale pipeline instead reads WARC: multi-record files where each
record is a block of ``Header: value`` lines, a blank line, then exactly
``Content-Length`` payload octets. This module provides

- :func:`build_warc_records` / :func:`build_warc_segments`: pages →
  per-record WARC bytes → multi-record segment blobs, entirely JVM-side
  (``format_string`` + binary ``concat``; the segment fold is an
  ``aggregate`` over a sorted ``collect_list``, so segment bytes are
  deterministic under any input partitioning);
- :func:`parse_warc_segments`: segment blobs → page rows via one
  Arrow-batched ``mapInPandas`` pass. Records are sliced by
  ``Content-Length`` (never by scanning for delimiters), so payloads
  containing ``\\r\\n\\r\\n`` or even a literal ``WARC/1.0`` parse
  correctly — the property the roundtrip tests pin.

Roundtrip invariant: ``parse_warc_segments(build_warc_segments(pages))``
returns exactly ``pages``'s (url, warc_ts, lang, html) rows (timestamps
at microsecond grain, the parquet/WARC-Date precision floor). The
contract query drives build→parse end-to-end and the DuckDB oracle is
the identity projection of the fixture — the same inverse-pair
discipline as kg/ops/export.py's N-Triples writer/parser.

Scale shape: building is a pure map then one shuffle keyed by segment id
(the fold state is one growing binary buffer per segment — size segments
to the usual ~1 GiB WARC target so a buffer fits comfortably in an
executor); parsing is embarrassingly parallel over segment rows with
bounded per-batch memory (Arrow ships the blobs; Python slices them).
Neither path ever collects to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "build_warc_records",
    "build_warc_segments",
    "parse_warc_segments",
    "WARC_DATE_FMT_SPARK",
]

# WARC-Date with microsecond fraction: the parquet timestamp grain, so
# the roundtrip is lossless.
WARC_DATE_FMT_SPARK = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
_DATE_FMT_PY = "%Y-%m-%dT%H:%M:%S.%fZ"
_CRLF = "\r\n"

_PARSED_SCHEMA = (
    "segment_id int, url string, warc_ts timestamp, lang string,"
    " record_type string, html binary"
)


def build_warc_records(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    lang_col: str = "lang",
    payload_col: str = "html",
    record_type: str = "response",
) -> DataFrame:
    """One WARC/1.0 record per page row: (url, record binary).

    Header block + CRLF CRLF + payload + CRLF CRLF, with Content-Length =
    exact payload octet count (``length`` of a binary column counts
    bytes). WARC-Record-ID is an md5 URN of (url, date) — deterministic,
    collision-safe at corpus scale, and spec-shaped. All JVM expressions;
    no shuffle.
    """
    date = F.date_format(F.col(ts_col), WARC_DATE_FMT_SPARK)
    header = F.format_string(
        "WARC/1.0" + _CRLF
        + "WARC-Type: %s" + _CRLF
        + "WARC-Record-ID: <urn:md5:%s>" + _CRLF
        + "WARC-Date: %s" + _CRLF
        + "WARC-Target-URI: %s" + _CRLF
        + "WARC-Identified-Content-Language: %s" + _CRLF
        + "Content-Type: text/html" + _CRLF
        + "Content-Length: %s" + _CRLF
        + _CRLF,
        F.lit(record_type),
        F.md5(F.concat_ws("|", F.col(url_col), date)),
        date,
        F.col(url_col),
        F.col(lang_col),
        F.length(F.col(payload_col)).cast("string"),
    )
    return pages.select(
        F.col(url_col).alias("url"),
        F.concat(
            F.encode(header, "UTF-8"),
            F.col(payload_col),
            F.encode(F.lit(_CRLF + _CRLF), "UTF-8"),
        ).alias("record"),
    )


def build_warc_segments(
    pages: DataFrame,
    n_segments: int = 8,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    lang_col: str = "lang",
    payload_col: str = "html",
) -> DataFrame:
    """Pages → (segment_id, warc binary, n_records) segment blobs.

    Segment assignment is a uniform url hash (pmod of xxhash64) so no
    segment is skewed by host; within a segment records are concatenated
    in url order (array_sort before the fold) so the blob bytes are
    deterministic under any partitioning. One shuffle total (the
    groupBy); the fold itself is a JVM ``aggregate`` lambda — no Python.
    """
    recs = build_warc_records(
        pages, url_col=url_col, ts_col=ts_col,
        lang_col=lang_col, payload_col=payload_col,
    ).withColumn(
        "segment_id",
        F.pmod(F.xxhash64("url"), F.lit(n_segments)).cast("int"),
    )
    return (
        recs.groupBy("segment_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("url", "record"))
            ).alias("recs")
        )
        .select(
            "segment_id",
            F.aggregate(
                "recs",
                F.lit(b""),
                lambda acc, x: F.concat(acc, x["record"]),
            ).alias("warc"),
            F.size("recs").alias("n_records"),
        )
    )


def _parse_blob(blob: bytes, strict: bool) -> list[tuple]:
    out = []
    i, n = 0, len(blob)
    while i < n:
        he = blob.find(b"\r\n\r\n", i)
        if he < 0:
            if strict and blob[i:].strip():
                raise ValueError("truncated WARC header block")
            break
        lines = blob[i:he].decode("utf-8", "replace").split(_CRLF)
        if not lines or not lines[0].startswith("WARC/"):
            if strict:
                raise ValueError(f"bad WARC version line: {lines[:1]!r}")
            i = he + 4
            continue
        hdr: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            hdr[k.strip().lower()] = v.strip()
        try:
            clen = int(hdr["content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError("missing/invalid Content-Length") from None
            i = he + 4
            continue
        payload = blob[he + 4 : he + 4 + clen]
        if len(payload) < clen:
            if strict:
                raise ValueError("truncated WARC payload")
            break
        ts = hdr.get("warc-date", "")
        out.append(
            (
                hdr.get("warc-target-uri"),
                ts,
                hdr.get("warc-identified-content-language"),
                hdr.get("warc-type"),
                payload,
            )
        )
        i = he + 4 + clen + 4  # payload + trailing CRLF CRLF
    return out


def parse_warc_segments(
    segments: DataFrame,
    warc_col: str = "warc",
    segment_col: str = "segment_id",
    strict: bool = True,
) -> DataFrame:
    """Segment blobs → one row per WARC record: (segment_id, url,
    warc_ts, lang, record_type, html).

    One Arrow-batched mapInPandas pass; records are sliced strictly by
    Content-Length. With ``strict=False`` malformed records are skipped
    (crawl-reality mode); with ``strict=True`` they raise, for use with
    the error-capture stage machinery (kg/errors.py).
    """
    seg_name, blob_name = segment_col, warc_col

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            segs: list[int] = []
            rows: list[tuple] = []
            for seg, blob in zip(pdf[seg_name], pdf[blob_name]):
                parsed = _parse_blob(bytes(blob), strict)
                segs.extend([seg] * len(parsed))
                rows.extend(parsed)
            urls = [r[0] for r in rows]
            ts = pd.to_datetime(
                pd.Series([r[1] for r in rows], dtype="object"),
                format=_DATE_FMT_PY,
                errors="coerce",
            )
            yield pd.DataFrame(
                {
                    "segment_id": pd.Series(segs, dtype="int32"),
                    "url": urls,
                    "warc_ts": ts,
                    "lang": [r[2] for r in rows],
                    "record_type": [r[3] for r in rows],
                    "html": [r[4] for r in rows],
                }
            )

    return segments.select(
        F.col(segment_col).cast("int").alias(seg_name), warc_col
    ).mapInPandas(gen, _PARSED_SCHEMA)
