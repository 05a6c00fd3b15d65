"""Checkpoint/lineage/resume semantics: kill-and-resume must reproduce the
exact same output (north rule: resumable from per-partition checkpoints)."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from kg import synth
from kg.checkpoint import CheckpointedPipeline, add_bucket
from kg.stages.mentions import detect_mentions, gazetteer_dim


@pytest.fixture()
def pages_sdf(spark, tmp_path):
    pdf = synth.gen_pages(120, seed=42)
    p = str(tmp_path / "pages.parquet")
    pdf.to_parquet(p, index=False)
    return spark.read.parquet(p)


def _rows(df):
    return sorted(map(tuple, df.drop("url_hash_bucket").toPandas().values.tolist()))


def test_stage_runs_and_is_idempotent(spark, pages_sdf, tmp_path):
    base = str(tmp_path / "ckpt")
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    pipe = CheckpointedPipeline(spark, base, n_buckets=8)
    bucketed = add_bucket(pages_sdf.select("url", "text"), 8)

    fn = lambda df: detect_mentions(df, gaz, None).join(  # noqa: E731
        bucketed.select("url", "url_hash_bucket").distinct(), "url"
    )
    out1 = _rows(pipe.run_stage("mentions", bucketed, fn))
    assert pipe.completed_buckets("mentions") == set(range(8))

    # second run: nothing to do, identical output
    out2 = _rows(pipe.run_stage("mentions", bucketed, fn))
    assert out1 == out2


def test_kill_and_resume_reproduces_output(spark, pages_sdf, tmp_path):
    base_full = str(tmp_path / "full")
    base_killed = str(tmp_path / "killed")
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    bucketed = add_bucket(pages_sdf.select("url", "text"), 8)

    def fn(df):
        return detect_mentions(df, gaz, None).join(
            bucketed.select("url", "url_hash_bucket").distinct(), "url"
        )

    golden = _rows(
        CheckpointedPipeline(spark, base_full, n_buckets=8).run_stage(
            "mentions", bucketed, fn
        )
    )

    # simulate a killed run: only buckets 0-3 were processed and committed
    pipe1 = CheckpointedPipeline(spark, base_killed, n_buckets=8)
    half = bucketed.where(F.col("url_hash_bucket") < 4)
    pipe1.run_stage("mentions", half, fn)
    assert pipe1.completed_buckets("mentions") == {0, 1, 2, 3}

    # a NEW process resumes with the full input and the same config
    pipe2 = CheckpointedPipeline(spark, base_killed, n_buckets=8)
    resumed = _rows(pipe2.run_stage("mentions", bucketed, fn))
    assert resumed == golden
    assert pipe2.completed_buckets("mentions") == set(range(8))


def test_config_change_invalidates_checkpoints(spark, pages_sdf, tmp_path):
    base = str(tmp_path / "cfg")
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    bucketed = add_bucket(pages_sdf.select("url", "text"), 8)
    fn = lambda df: detect_mentions(df, gaz, None)  # noqa: E731

    pipe_a = CheckpointedPipeline(spark, base, n_buckets=8, run_config={"v": 1})
    pipe_a.run_stage("mentions", bucketed, fn)
    pipe_b = CheckpointedPipeline(spark, base, n_buckets=8, run_config={"v": 2})
    assert pipe_b.completed_buckets("mentions") == set()


def test_lineage_and_metrics_written(spark, pages_sdf, tmp_path):
    base = str(tmp_path / "lin")
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    bucketed = add_bucket(pages_sdf.select("url", "text"), 8)
    pipe = CheckpointedPipeline(spark, base, n_buckets=8)
    out = pipe.run_stage("mentions", bucketed, lambda df: detect_mentions(df, gaz, None))

    lineage = pipe.read_lineage().toPandas()
    assert len(lineage) == 8
    assert lineage["n_out"].sum() == out.count()
    assert (lineage["stage"] == "mentions").all()
    # wall time lives ONLY in metrics — per-bucket wall would be fiction
    assert "wall_ms" not in lineage.columns
    metrics = spark.read.parquet(str(Path(base) / "_metrics")).toPandas()
    assert metrics["n_rows_out"].iloc[0] == out.count()
    assert metrics["wall_ms"].iloc[0] > 0
    # O23: worker peak RSS captured and plausible (>10 MB for a JVM-fed
    # Python worker, nonzero proves the probe ran)
    assert metrics["peak_mem_mb"].iloc[0] > 10


def test_compact_stage_preserves_content_and_lineage(spark, pages_sdf,
                                                     tmp_path):
    """Compaction rewrites the stage at ~one file per bucket: identical
    rows, identical completed-bucket set, strictly fewer files, and a
    post-compaction resume is still a no-op."""
    from pathlib import Path

    base = str(tmp_path / "ckpt")
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    pipe = CheckpointedPipeline(spark, base, n_buckets=8)
    bucketed = add_bucket(pages_sdf.select("url", "text"), 8)

    fn = lambda df: detect_mentions(df, gaz, None).join(  # noqa: E731
        bucketed.select("url", "url_hash_bucket").distinct(), "url"
    )
    # run the stage at high shuffle parallelism so each bucket's rows land
    # in many tasks -> many small files per bucket (the layout compaction
    # exists to fix; a real stage at P=4096 is far worse)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    aqe = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "40")
    try:
        before = _rows(pipe.run_stage("mentions", bucketed, fn))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", aqe)
    stage_dir = Path(pipe.stage_output_path("mentions"))
    files_before = len(list(stage_dir.rglob("*.parquet")))

    files_after = pipe.compact_stage("mentions")
    assert files_after < files_before
    assert files_after <= 8  # ~one file per bucket at this size
    assert _rows(pipe.read_stage("mentions")) == before
    assert pipe.completed_buckets("mentions") == set(range(8))
    # resume after compaction: still a no-op with identical output
    assert _rows(pipe.run_stage("mentions", bucketed, fn)) == before
    # idempotent: compacting twice is safe
    assert pipe.compact_stage("mentions") == files_after
