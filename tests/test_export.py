"""N-Triples export (kg/ops/export.py): escaping semantics, sink
round-trip, plan shape. Oracle parity for the serialization is covered
by the entry contract (kg_export_ntriples / kg_export_labels)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from kg.ops.export import ntriples, write_ntriples

_NT_LINE = re.compile(r"^<([^>]*)> <([^>]*)> (<[^>]*>|\"(?:[^\"\\]|\\.)*\") \.$")


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        (1, "works_for", 2),
        (2, "located_in", 3),
    ]
    return spark.createDataFrame(rows, "subj_id long, pred string, obj_id long")


def test_resource_lines_shape(facts):
    out = ntriples(facts, base_iri="http://x/").collect()
    lines = {r.line for r in out}
    assert "<http://x/e/1> <http://x/p/works_for> <http://x/e/2> ." in lines
    assert all(_NT_LINE.match(r.line) for r in out)


def test_iri_and_literal_escaping(spark):
    # hostile terms: spaces, angle brackets, quotes, backslashes, newlines
    rows = [
        ('a b<c>"d\\e', "p|q`r", 'line1\nline2\t"quoted" \\slash'),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    r = ntriples(
        df, base_iri="http://x/", subj_col="s", pred_col="p",
        obj_col="o", obj_is_literal=True,
    ).first()
    assert (
        r.line
        == '<http://x/e/a%20b%3Cc%3E%22d%5Ce> <http://x/p/p%7Cq%60r> '
        '"line1\\nline2\\t\\"quoted\\" \\\\slash" .'
    )
    # every line still parses as a single N-Triples statement
    assert _NT_LINE.match(r.line)
    assert "\n" not in r.line


def test_nulls_dropped(spark):
    df = spark.createDataFrame(
        [(1, "p", None), (None, "p", 2), (3, "p", 4)],
        "subj_id long, pred string, obj_id long",
    )
    out = ntriples(df).collect()
    assert len(out) == 1 and out[0].subj_id == 3


def test_sink_roundtrip(tmp_path, facts, spark):
    path = str(tmp_path / "nt")
    write_ntriples(ntriples(facts, base_iri="http://x/"), path)
    back = spark.read.text(path)
    assert back.count() == 2
    assert all(_NT_LINE.match(r.value) for r in back.collect())


def test_plan_pure_projection(facts):
    p = (
        ntriples(facts)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for node in ("Exchange", "BatchEvalPython", "ArrowEvalPython",
                 "MapInPandas"):
        assert node not in p, node


def test_escape_tables_backslash_first():
    """The oracle SQL is generated from the same tables; the chains are
    only correct if backslash is escaped before anything that introduces
    one."""
    from kg.ops.export import _IRI_ENC, _LIT_ENC

    assert _IRI_ENC[0][0] == "\\" and _LIT_ENC[0][0] == "\\"
