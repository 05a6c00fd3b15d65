"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.01 and compare against oracle_sql() via DuckDB (row count + sorted
value equality). Queries without an oracle get a rows-structure check."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                v = round(v, 6) if not math.isnan(v) else "nan"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if name not in ORACLES:
        # rows-only contract: non-SQL-expressible op; assert it runs and has
        # a stable, non-degenerate shape
        assert len(spark_pdf.columns) >= 2
        assert len(spark_pdf) >= 0
        return
    oracle_pdf = ddb.execute(ORACLES[name]).df()
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: rows {len(spark_pdf)} vs oracle {len(oracle_pdf)}"
    )
    assert sorted(c.lower() for c in spark_pdf.columns) == sorted(
        c.lower() for c in oracle_pdf.columns
    ), f"{name}: column names differ"
    got = _normalize(spark_pdf.to_dict("records"), spark_pdf.columns)
    want = _normalize(oracle_pdf.to_dict("records"), oracle_pdf.columns)
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"entity_name", "detector", "n_mentions", "n_docs"}
