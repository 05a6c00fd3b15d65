"""kg.session.materialize — the multi-consumer barrier is reliable
(fault-tolerant checkpoint) when the context has a checkpoint dir, and
falls back to localCheckpoint otherwise (ADVICE r2: executor loss on a
real cluster must not lose the barrier's partitions)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from kg.session import materialize


def _clear_checkpoint_dir(spark):
    # the public API has no unset; reset the Scala field so later tests run
    # in the default (localCheckpoint) regime again
    sc = spark.sparkContext
    getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())


def test_materialize_local_mode_without_dir(spark):
    assert spark.sparkContext.getCheckpointDir() is None
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    got = materialize(df)
    assert got.count() == 100
    assert {r["x"] for r in got.collect()} == {2 * i for i in range(100)}


def test_materialize_uses_reliable_checkpoint_when_dir_set(spark, tmp_path):
    ckpt = tmp_path / "reliable_ckpt"
    spark.sparkContext.setCheckpointDir(str(ckpt))
    try:
        df = spark.range(50).withColumn("x", F.col("id") + 1)
        got = materialize(df)
        assert got.count() == 50
        # the barrier's partitions are durably on disk, not executor-local
        files = [p for p in Path(ckpt).rglob("*") if p.is_file()]
        assert files, "reliable checkpoint wrote nothing"
        assert {r["x"] for r in got.collect()} == {i + 1 for i in range(50)}
    finally:
        _clear_checkpoint_dir(spark)


def test_near_dup_identical_under_both_barrier_modes(spark, tmp_path):
    """The barrier choice is an execution detail: minhash_near_dup results
    must be identical with and without a reliable checkpoint dir."""
    from kg.ops.dedup import minhash_near_dup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "alpha beta gamma delta zeta"),
            (4, "totally different words here now"),
        ],
        "doc_id long, text string",
    )
    local = {tuple(r) for r in minhash_near_dup(docs, min_jaccard=0.5).collect()}
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt2"))
    try:
        reliable = {
            tuple(r) for r in minhash_near_dup(docs, min_jaccard=0.5).collect()
        }
    finally:
        _clear_checkpoint_dir(spark)
    assert local == reliable
    assert len(local) == 4
