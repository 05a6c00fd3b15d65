"""SparkSession factory with the engine's scale-oriented defaults.

Centralizes the config story so tests, bench, and spark-submit entry all run
the same plan-relevant settings:

- AQE on (runtime coalescing + skew-join splitting) — the north rule names
  skew handling explicitly.
- Arrow enabled for all pandas UDF exchange (the engine forbids row-wise
  Python UDFs; mapInPandas/pandas_udf only).
- shuffle partitions sized for the local harness; a real cluster run passes
  its own value (≈ 2-3x total cores) via spark-submit --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def materialize(df: DataFrame) -> DataFrame:
    """Eager materialization barrier for small multi-consumer intermediates
    (LSH bucket tables, CC iteration state, dedup membership maps).

    On a real cluster — where an executor loss mid-job must not fail the
    stage — callers set a RELIABLE checkpoint dir once per job
    (``spark.sparkContext.setCheckpointDir("hdfs://.../ckpt")``) and this
    helper uses ``df.checkpoint``: partitions are re-readable from durable
    storage after executor loss. Without a checkpoint dir (local/bench runs,
    where losing an executor means losing the driver too) it falls back to
    ``localCheckpoint``: executor-local blocks, no write barrier cost, same
    lineage truncation. Both paths are eager so the subtree is computed
    exactly once no matter how many consumers read it."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def get_spark(
    master: str | None = None,
    app_name: str = "kg-engine",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # allow joins to reuse a subset-key partitioning from upstream
        # (HashPartitioning(url) satisfies a join on (url, word) on both
        # sides): the mentions tree then shuffles the corpus ONCE and every
        # downstream agg/join stays exchange-free (co_partition=True).
        # Our join keys lead with high-cardinality ids, so the reduced-key
        # partitioning loses no parallelism.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_SUBMIT_DEPLOY_MODE"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
