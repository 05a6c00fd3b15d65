"""North-rule P/R gate: Spark triples vs the single-node oracle goldens on
the committed 10k-page fixture corpus — precision AND recall must be >= 0.95
(they are 1.0 by construction unless pipeline wiring drifts)."""

from __future__ import annotations

import pytest

FIX = "/root/repo/fixtures"


@pytest.fixture(scope="module")
def spark_triples(spark):
    from kg.stages.triples import extract_triples_from_pages

    pages = spark.read.parquet(f"{FIX}/pages_small.parquet")
    got = extract_triples_from_pages(pages).select("url", "subj", "pred", "obj")
    return {tuple(r) for r in got.collect()}


def test_triple_precision_recall(spark, spark_triples):
    import duckdb

    want = {
        tuple(r)
        for r in duckdb.sql(
            f"select url, subj, pred, obj from '{FIX}/expected_triples_small.parquet'"
        ).fetchall()
    }
    assert want, "golden triples empty"
    tp = len(spark_triples & want)
    precision = tp / max(len(spark_triples), 1)
    recall = tp / len(want)
    assert precision >= 0.95, f"precision {precision:.4f}"
    assert recall >= 0.95, f"recall {recall:.4f}"


def test_mentions_precision_recall(spark):
    import duckdb

    from kg import synth
    from kg.stages.extract import extract_docs
    from kg.stages.mentions import detect_mentions, gazetteer_dim, regex_dim

    pages = spark.read.parquet(f"{FIX}/pages_small.parquet")
    docs = extract_docs(pages).select("url", "text")
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    rx = regex_dim(spark, synth.REGEX_DATA)
    got = {
        tuple(r)
        for r in detect_mentions(docs, gaz, rx)
        .select("url", "matched_word", "entity_name")
        .collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"select url, matched_word, entity_name from '{FIX}/expected_mentions_small.parquet'"
        ).fetchall()
    }
    tp = len(got & want)
    assert tp / max(len(got), 1) >= 0.95
    assert tp / len(want) >= 0.95
