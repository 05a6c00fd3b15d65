"""Spark relational pipeline vs single-node oracle: exact row equality.

The oracle is validated against the reference's ported test cases
(tests/test_finder_semantics.py); here the distributed DataFrame plan must
reproduce the oracle row-for-row on the synthetic corpus, which is the gate
for the mentions stage (SURVEY.md §7 M1-M2).
"""

from __future__ import annotations

import pandas as pd
import pytest

from kg import synth
from kg.oracle import BadRegexError
from kg.stages.extract import extract_docs, verify_extraction
from kg.stages.mentions import detect_mentions, gazetteer_dim, regex_dim
from kg.stages.triples import extract_svo_triples, tokenize_docs

N_DOCS = 150


@pytest.fixture(scope="module")
def pages_pdf():
    return synth.gen_pages(N_DOCS, seed=42)


@pytest.fixture(scope="module")
def pages_sdf(spark, pages_pdf):
    return spark.createDataFrame(pages_pdf)


def test_extract_docs_byte_identical(spark, pages_sdf):
    assert verify_extraction(pages_sdf).count() == 0


def test_extract_docs_schema(spark, pages_sdf):
    docs = extract_docs(pages_sdf)
    row = docs.orderBy("url").first()
    assert row["n_chars"] == len(row["text"])
    assert len(row["extract_sha1"]) == 40


def _mention_rows(df: pd.DataFrame) -> list[tuple]:
    return sorted(map(tuple, df[["url", "matched_word", "entity_name", "detector"]].values))


def test_mentions_match_oracle_exactly(spark, pages_sdf, pages_pdf):
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    rx = regex_dim(spark, synth.REGEX_DATA)
    docs = pages_sdf.select("url", "text")  # golden text == extracted text
    got = detect_mentions(docs, gaz, rx).toPandas()
    want = synth.expected_mentions(pages_pdf)
    assert _mention_rows(got) == _mention_rows(want)


def test_mentions_gazetteer_only(spark, pages_sdf, pages_pdf):
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    docs = pages_sdf.select("url", "text")
    got = detect_mentions(docs, gaz, None).toPandas()
    want = synth.expected_mentions(pages_pdf)
    want = want[want["detector"] == "gazetteer"]
    assert _mention_rows(got) == _mention_rows(want)


def test_bad_regex_fails_fast(spark):
    with pytest.raises(BadRegexError):
        regex_dim(spark, {"bad": r"[a\d{3}$"})


def test_triples_match_oracle_exactly(spark, pages_sdf, pages_pdf):
    got = extract_svo_triples(pages_sdf.select("url", "text")).toPandas()
    want = synth.expected_triples(pages_pdf)
    got_rows = sorted(map(tuple, got[["url", "subj", "pred", "obj"]].values))
    want_rows = sorted(map(tuple, want[["url", "subj", "pred", "obj"]].values))
    assert got_rows == want_rows
    assert (got["conf"] == 1.0).all()


def test_tokenize_docs_matches_oracle(spark, pages_sdf, pages_pdf):
    from kg.tokenize import tokenize

    got = tokenize_docs(pages_sdf, filter_ents=True, sw_size="large").toPandas()
    got_map = dict(zip(got["url"], [list(t) for t in got["tokens"]]))
    for _, row in pages_pdf.head(40).iterrows():
        assert got_map[row["url"]] == tokenize(
            row["text"], True, "large", row["lang"]
        ), row["url"]


def test_mentions_plan_is_broadcast_and_pruned(spark, pages_sdf):
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    rx = regex_dim(spark, synth.REGEX_DATA)
    # share_scan=False: the localCheckpoint boundary would hide the join
    plan = detect_mentions(
        pages_sdf.select("url", "text"), gaz, rx, share_scan=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # no row-wise Python UDF anywhere in the relational mentions plan
    assert "BatchEvalPython" not in plan


def test_dim_planning_inputs_bounded(spark):
    from kg.stages.mentions import _GATE_LIMIT, _dim_planning_inputs

    small = gazetteer_dim(spark, {"A": ["hash join", "scan"], "B": ["big scan op"]})
    mw, fw, overflowed = _dim_planning_inputs(small)
    assert mw == 3
    assert fw == ["big", "hash", "scan"]
    assert not overflowed


def test_mentions_large_dim_skips_gate_without_driver_collect(spark):
    """Scale-regime guard (VERDICT r01 finding 5): a 1M-row dim must not
    round-trip its values to the driver — planning inputs come from one
    bounded aggregation, the start-word gate is skipped, and matching still
    works through the broadcast join alone."""
    from pyspark.sql import functions as F

    from kg.stages.mentions import (
        _GATE_LIMIT,
        _dim_planning_inputs,
        detect_gazetteer_mentions,
    )

    dim = spark.range(1_000_000).selectExpr(
        "concat('E', id % 1000) as entity_name",
        "concat('w', id) as value",
        "concat('w', id) as value_norm",
        "CAST(1 AS int) as n_words",
    )
    mw, fw, overflowed = _dim_planning_inputs(dim)
    assert mw == 1
    assert overflowed and len(fw) <= _GATE_LIMIT  # bounded driver transfer
    docs = spark.createDataFrame(
        [("d1", "w42 and w999999 appear here"), ("d2", "nothing matches")],
        "doc_id string, text string",
    )
    winners, _ = detect_gazetteer_mentions(
        docs, dim, id_col="doc_id", share_scan=False
    )
    got = {(r["doc_id"], r["matched_word"]) for r in winners.collect()}
    assert got == {("d1", "w42"), ("d1", "w999999")}


def test_cache_handles_releases_persisted_share(spark, pages_sdf):
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    handles: list = []
    df = detect_mentions(
        pages_sdf.select("url", "text"), gaz, None, cache_handles=handles
    )
    df.count()
    assert len(handles) == 1
    assert handles[0].storageLevel.useMemory  # persisted while in use
    for h in handles:
        h.unpersist()
    assert not handles[0].storageLevel.useMemory


def test_mentions_nonbroadcast_dim_regime_matches(spark, pages_sdf):
    """broadcast_dim=False (huge-dictionary regime: AQE-planned shuffle
    join) must produce the identical mention set."""
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    rx = regex_dim(spark, synth.REGEX_DATA)
    docs = pages_sdf.select("url", "text").limit(60)
    a = {tuple(r) for r in detect_mentions(docs, gaz, rx, share_scan=False).collect()}
    b = {
        tuple(r)
        for r in detect_mentions(
            docs, gaz, rx, share_scan=False, broadcast_dim=False
        ).collect()
    }
    assert a == b


def test_precomputed_plan_matches_per_call_planning(spark, pages_sdf, pages_pdf):
    """VERDICT r3 item 1a: a GazetteerPlan computed once per dim must yield
    byte-identical mentions to the per-call planning path."""
    from kg.stages.mentions import plan_gazetteer

    docs = extract_docs(pages_sdf).select("url", "text")
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    rx = regex_dim(spark, synth.REGEX_DATA)
    plan = plan_gazetteer(gaz)
    assert plan.max_words >= 2 and plan.first_words and not plan.overflowed
    per_call = {tuple(r) for r in detect_mentions(docs, gaz, rx).collect()}
    planned = {
        tuple(r) for r in detect_mentions(docs, gaz, rx, plan=plan).collect()
    }
    assert planned == per_call


def test_co_partition_single_corpus_shuffle(spark, pages_sdf):
    """VERDICT r3 item 3: with co_partition=True the only hash exchanges in
    the whole mentions tree are the docs repartition itself (one per
    branch, identical subtrees — AQE reuses the shuffle at runtime); every
    aggregation, the distinct, and the anti-join are exchange-free because
    HashPartitioning(url) satisfies their clustering."""
    from kg.stages.mentions import plan_gazetteer

    docs = extract_docs(pages_sdf).select("url", "text")
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    rx = regex_dim(spark, synth.REGEX_DATA)
    plan = plan_gazetteer(gaz)
    df = detect_mentions(
        docs, gaz, rx, plan=plan, co_partition=True, share_scan=False
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    import re as _re

    exchanges = _re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p)
    assert exchanges, "expected the docs repartition exchange"
    for args in exchanges:
        # every exchange is the REPARTITION_BY_COL on the id column alone —
        # no ENSURE_REQUIREMENTS match-sized shuffles remain
        assert args.split(",")[0].strip().startswith("url"), args
        assert len(args.split(",")) == 2, f"non-id exchange: {args}"
    # and the results are identical to the default plan
    base = {tuple(r) for r in detect_mentions(docs, gaz, rx).collect()}
    got = {tuple(r) for r in df.collect()}
    assert got == base


def test_bucketed_docs_table_zero_shuffle_mentions(spark, tmp_path):
    """The at-rest variant of co-partitioning (PLANS.md): docs written
    bucketBy(id) are scanned ALREADY hash-partitioned, so the gazetteer
    winners tree plans with NO exchange at all — the 100-TB regime where
    even the one in-plan repartition disappears."""
    from pyspark.sql import functions as F

    from kg.stages.mentions import detect_gazetteer_mentions, plan_gazetteer

    docs = spark.createDataFrame(
        [(f"u{i}", "carrot cake with coffee and tea") for i in range(50)],
        "url string, text string",
    )
    name = "docs_bucketed_r3_test"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (docs.write.bucketBy(4, "url").sortBy("url").saveAsTable(name))
    try:
        at_rest = spark.table(name)
        gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
        winners, _ = detect_gazetteer_mentions(
            at_rest, gaz, plan=plan_gazetteer(gaz), share_scan=False
        )
        p = winners._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in p, p
        assert "SelectedBucketsCount" in p  # the scan is the partitioning
        got = {tuple(r) for r in winners.collect()}
        base = {
            tuple(r)
            for r in detect_gazetteer_mentions(
                docs, gaz, share_scan=False
            )[0].collect()
        }
        assert got == base and len(got) == 100  # 2 entities x 50 docs
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
