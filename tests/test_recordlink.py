"""Fellegi–Sunter linkage (kg/ops/recordlink.py): weight math, decision
bands, block capping, and ground-truth precision on the alias fixture."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kg.ops.recordlink import fs_link, fs_weights


def test_fs_weights_math():
    wa, wd = fs_weights(0.95, 0.01)
    assert wa == math.log2(0.95 / 0.01)
    assert wd == math.log2((1.0 - 0.95) / (1.0 - 0.01))
    assert wa > 0 > wd


def _ab(spark):
    a = spark.createDataFrame(
        [(1, "acme corporation"), (2, "globex"), (3, "initech"),
         (4, "acme co")],
        "entity_id long, a_name string",
    ).withColumn("a_blk", F.substring("a_name", 1, 1))
    b = spark.createDataFrame(
        [("r1", "acme corporation"), ("r2", "acme corp"),
         ("r3", "globex"), ("r4", "intech"), ("r5", "zeta"),
         ("r6", "acme cox")],
        "rid string, b_name string",
    ).withColumn("b_blk", F.substring("b_name", 1, 1))
    return a, b


SPECS = [
    ("a_name", "b_name", "exact", 0.95, 0.01),
    ("a_name", "b_name", "first_token", 0.9, 0.1),
    ("a_name", "b_name", "lev1", 0.85, 0.05),
]


def test_bands_and_blocking(spark):
    a, b = _ab(spark)
    out = fs_link(
        a, b, SPECS, a_key="entity_id", b_key="rid",
        block_a="a_blk", block_b="b_blk", upper=4.0, lower=-3.0,
    )
    got = {(r.entity_id, r.rid): r.label for r in out.collect()}
    # full agreement -> match (≈ 13.8)
    assert got[(1, "r1")] == "match" and got[(2, "r3")] == "match"
    # first_token + lev1 agree, exact disagrees -> ≈ 2.95 -> possible
    assert got[(4, "r6")] == "possible"
    # first_token only ('acme corporation'/'acme corp') -> ≈ -3.8;
    # lev1 only ('initech'/'intech') -> ≈ -3.4 -> both non_match
    assert got[(1, "r2")] == "non_match"
    assert got[(3, "r4")] == "non_match"
    # 'zeta' shares no block with any a-record -> no pair at all
    assert "r5" not in {k[1] for k in got}


def test_block_cap_drops_hot_block(spark):
    a = spark.createDataFrame(
        [(i, f"a{i}") for i in range(10)] + [(99, "zeta")],
        "entity_id long, a_name string",
    ).withColumn("a_blk", F.substring("a_name", 1, 1))
    b = a.select(
        F.col("entity_id").cast("string").alias("rid"),
        F.col("a_name").alias("b_name"), F.col("a_blk").alias("b_blk"),
    )
    out = fs_link(
        a, b, SPECS, a_key="entity_id", b_key="rid",
        block_a="a_blk", block_b="b_blk", upper=4.0, lower=-3.0,
        max_block=4,
    )
    # the 'a' block (10 records/side) is dropped; only 'z' survives
    assert [(r.entity_id, r.rid) for r in out.collect()] == [(99, "99")]


def test_fixture_match_precision(spark):
    """On the alias fixture, every pair labelled 'match' must be a true
    link (same entity_id as the alias's ground truth)."""
    d = spark.read.parquet("/root/repo/fixtures/alias_dict.parquet")
    a = (
        d.select("entity_id", F.lower("canonical").alias("a_name"))
        .distinct()
        .withColumn("a_blk", F.substring("a_name", 1, 1))
    )
    b = d.select(
        F.col("alias").alias("rid"),
        F.col("alias_norm").alias("b_name"),
        F.col("entity_id").alias("true_id"),
    ).distinct().withColumn("b_blk", F.substring("b_name", 1, 1))
    out = fs_link(
        a, b, SPECS, a_key="entity_id", b_key="rid",
        block_a="a_blk", block_b="b_blk", upper=4.0, lower=-3.0,
        keep_cols=("true_id",),
    )
    matches = out.where("label = 'match'").collect()
    assert len(matches) >= 5
    assert all(r.entity_id == r.true_id for r in matches)


def test_plan_equi_join_no_python(spark):
    a, b = _ab(spark)
    p = (
        fs_link(
            a, b, SPECS, a_key="entity_id", b_key="rid",
            block_a="a_blk", block_b="b_blk", upper=4.0, lower=-3.0,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "MapInPandas" not in p and "BatchEvalPython" not in p
    assert "Window" not in p


class TestFsEm:
    def test_em_recovers_planted_mixture(self, spark):
        """Plant a two-class mixture of agreement patterns (matches agree
        on both fields, non-matches mostly on neither): EM must recover
        m >> u per field and p near the planted match fraction."""
        from kg.ops.recordlink import fs_em

        rows = (
            [(True, True, 20)]      # matches: both agree
            + [(True, False, 2)]    # noise
            + [(False, False, 70)]  # non-matches: neither agrees
            + [(False, True, 8)]
        )
        pat = spark.createDataFrame(rows, "g0 boolean, g1 boolean, n long")
        m, u, p = fs_em(pat, 2, iters=20)
        assert m[0] > 0.8 and m[1] > 0.8
        assert u[0] < 0.2 and u[1] < 0.3
        assert 0.1 < p < 0.4

    def test_em_deterministic_and_clamped(self, spark):
        from kg.ops.recordlink import fs_em

        pat = spark.createDataFrame(
            [(True, 10), (False, 90)], "g0 boolean, n long"
        )
        r1 = fs_em(pat, 1, iters=50)
        r2 = fs_em(pat, 1, iters=50)
        assert r1 == r2
        for v in [*r1[0], *r1[1], r1[2]]:
            assert 1e-6 <= v <= 1 - 1e-6

    def test_agreement_patterns_histogram(self, spark):
        from kg.ops.recordlink import agreement_patterns

        pairs = spark.createDataFrame(
            [("acme", "acme"), ("acme", "acme"), ("acme", "acme x")],
            "a_name string, b_name string",
        )
        got = sorted(
            map(
                tuple,
                agreement_patterns(
                    pairs, [("a_name", "b_name", "exact"),
                            ("a_name", "b_name", "first_token")]
                ).collect(),
            )
        )
        assert got == [(False, True, 1), (True, True, 2)]
