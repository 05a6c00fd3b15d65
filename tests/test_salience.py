"""Behavior + plan-shape tests for kg/ops/salience.py (oracle parity is
covered by the entry contract replica: doc_mention_salience /
doc_mention_contexts)."""

from __future__ import annotations

import pytest

from kg.ops.salience import (
    gazetteer_occurrences,
    mention_contexts,
    mention_salience,
)
from kg.stages.mentions import gazetteer_dim, plan_gazetteer


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # acme first word, mentioned twice; beta once, late
        (1, "acme ships widgets today and acme wins beta"),
        # mention at the very end (right-context clipped empty)
        (2, "the quarter closed strong for beta"),
        # multi-word alias + single-word alias of the same entity
        (3, "acme corp beat acme again"),
        # alias-dedup: two dictionary values normalize identically
        (4, "gamma! gamma"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def gaz(spark):
    return gazetteer_dim(
        spark,
        {
            "Acme": ["acme", "acme corp"],
            "Beta": ["beta"],
            # "gamma!" and "gamma" both normalize to "gamma"
            "Gamma": ["gamma", "gamma!"],
        },
    )


def test_occurrences_positions_and_alias_dedup(docs, gaz):
    occ = gazetteer_occurrences(docs, gaz, id_col="doc_id")
    rows = {
        (r.doc_id, r.entity_name, r.surface, r.start, r.end)
        for r in occ.collect()
    }
    # doc 1: acme at word 0 and word 5
    assert (1, "Acme", "acme", 0, 0) in rows
    assert (1, "Acme", "acme", 5, 5) in rows
    # doc 3: the two-word alias matches as a span, plus both single words
    assert (3, "Acme", "acme corp", 0, 1) in rows
    # doc 4: "gamma!" strips to "gamma"; deduped dim -> exactly 2
    # occurrences (one per position), not 4
    d4 = [r for r in rows if r[0] == 4]
    assert len(d4) == 2


def test_salience_orders_lead_entity_first(docs, gaz):
    sal = {
        (r.doc_id, r.entity_name): r
        for r in mention_salience(docs, gaz, id_col="doc_id").collect()
    }
    one_acme, one_beta = sal[(1, "Acme")], sal[(1, "Beta")]
    assert one_acme.n_mentions == 2 and one_acme.first_start == 0
    # twice-mentioned lead entity beats the single late mention
    assert one_acme.salience > one_beta.salience
    # bounds: share<=1 and earliness<=1 => salience <= w_share + w_early
    assert all(0.0 <= r.salience <= 1.0 for r in sal.values())
    # lead + sole entity in doc 2 has share 1 (w_share) + its earliness
    assert sal[(2, "Beta")].first_start == 5


def test_salience_accepts_precomputed_doc_words(docs, gaz, spark):
    from pyspark.sql import functions as F

    dw = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda x: x != F.lit("")))
        .alias("n_words"),
    )
    a = mention_salience(docs, gaz, id_col="doc_id").collect()
    b = mention_salience(docs, gaz, id_col="doc_id", doc_words=dw).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_contexts_clip_at_doc_edges(docs, gaz):
    ctx = {
        (r.doc_id, r.entity_name, r.surface): r
        for r in mention_contexts(docs, gaz, k=3, id_col="doc_id").collect()
    }
    lead = ctx[(1, "Acme", "acme")]  # first occurrence wins
    assert lead.start == 0 and lead.ctx_left == ""
    assert lead.ctx_right == "ships widgets today"
    tail = ctx[(2, "Beta", "beta")]  # mention is the last word
    assert tail.ctx_right == "" and tail.ctx_left == "closed strong for"
    two = ctx[(3, "Acme", "acme corp")]  # context after the span END
    assert two.ctx_right == "beat acme again"


def test_plan_broadcast_no_python_no_cartesian(spark, docs, gaz):
    plan = plan_gazetteer(gaz)
    p = (
        mention_salience(docs, gaz, id_col="doc_id", plan=plan)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in p
    for node in (
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
        "BatchEvalPython",
        "ArrowEvalPython",
        "MapInPandas",
    ):
        assert node not in p, node
