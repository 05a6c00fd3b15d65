"""WARC segment build/parse (kg/ops/warc.py): exact-inverse roundtrip,
Content-Length slicing robustness, malformed-record handling, plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kg.ops.warc import (
    build_warc_records,
    build_warc_segments,
    parse_warc_segments,
)

PAGES_SCHEMA = "url string, warc_ts timestamp, lang string, html binary"
TS = dt.datetime(2026, 1, 2, 3, 4, 5, 123456)


def _pages(spark, rows, parts=3):
    return spark.createDataFrame(rows, PAGES_SCHEMA).repartition(parts)


def _roundtrip(spark, pages, n_segments=3, **kw):
    seg = build_warc_segments(pages, n_segments=n_segments)
    out = parse_warc_segments(seg, **kw)
    key = lambda df: sorted(  # noqa: E731
        (r.url, r.warc_ts, r.lang, bytes(r.html)) for r in df.collect()
    )
    return key(pages.select("url", "warc_ts", "lang", "html")), key(out)


class TestRoundtrip:
    def test_fixture_roundtrip_exact(self, spark):
        pages = spark.read.parquet("fixtures/pages_tiny.parquet")
        a, b = _roundtrip(spark, pages, n_segments=7)
        assert len(a) == 100 and a == b

    def test_hostile_payloads_sliced_by_content_length(self, spark):
        # payloads containing CRLFCRLF, a fake WARC version line, a fake
        # Content-Length header, and empty/binary bytes must all survive:
        # the parser slices by Content-Length, never by delimiter scan
        rows = [
            ("u://1", TS, "en", b"before\r\n\r\nafter"),
            ("u://2", TS, "de", b"WARC/1.0\r\nContent-Length: 0\r\n\r\n"),
            ("u://3", TS, "fr", b""),
            ("u://4", TS, "it", bytes(range(256))),
            ("u://5", TS, "es", "caf\u00e9 \u2603".encode()),
        ]
        a, b = _roundtrip(spark, _pages(spark, rows))
        assert a == b

    def test_microsecond_timestamps_survive(self, spark):
        rows = [("u://1", TS, "en", b"x")]
        _, b = _roundtrip(spark, _pages(spark, rows, 1))
        assert b[0][1] == TS

    def test_segment_bytes_partition_invariant(self, spark):
        pages = spark.read.parquet("fixtures/pages_tiny.parquet")
        segs = lambda p: sorted(  # noqa: E731
            (r.segment_id, bytes(r.warc))
            for r in build_warc_segments(
                pages.repartition(p), n_segments=4
            ).collect()
        )
        assert segs(1) == segs(13)


class TestMalformed:
    def _segments(self, spark, blob):
        return spark.createDataFrame(
            [(0, bytearray(blob))], "segment_id int, warc binary"
        )

    def test_strict_raises_on_truncated_payload(self, spark):
        good = (
            b"WARC/1.0\r\nWARC-Target-URI: u://1\r\n"
            b"WARC-Date: 2026-01-02T03:04:05.000000Z\r\n"
            b"Content-Length: 99\r\n\r\nshort"
        )
        with pytest.raises(Exception, match="truncated WARC payload"):
            parse_warc_segments(self._segments(spark, good)).collect()

    def test_lenient_skips_bad_records_keeps_good(self, spark):
        rec = (
            b"WARC/1.0\r\nWARC-Target-URI: u://ok\r\n"
            b"WARC-Date: 2026-01-02T03:04:05.000000Z\r\n"
            b"WARC-Identified-Content-Language: en\r\n"
            b"WARC-Type: response\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
        )
        junk = b"NOTWARC\r\nX: y\r\n\r\n"
        noclen = b"WARC/1.0\r\nWARC-Target-URI: u://no\r\n\r\n"
        out = parse_warc_segments(
            self._segments(spark, junk + noclen + rec), strict=False
        ).collect()
        assert [r.url for r in out] == ["u://ok"]
        assert bytes(out[0].html) == b"hi"
        assert out[0].record_type == "response"


class TestPlans:
    def test_record_build_is_pure_jvm_map(self, spark):
        pages = spark.read.parquet("fixtures/pages_tiny.parquet")
        p = (
            build_warc_records(pages)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in p
        assert "InPandas" not in p and "BatchEvalPython" not in p

    def test_segment_build_single_shuffle_no_python(self, spark):
        pages = spark.read.parquet("fixtures/pages_tiny.parquet")
        p = (
            build_warc_segments(pages, n_segments=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert p.count("Exchange") == 1  # the segment groupBy only
        assert "InPandas" not in p and "BatchEvalPython" not in p

    def test_parse_is_one_arrow_pass(self, spark):
        seg = build_warc_segments(
            spark.read.parquet("fixtures/pages_tiny.parquet"), n_segments=4
        )
        p = (
            parse_warc_segments(seg)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert p.count("MapInPandas") == 1
