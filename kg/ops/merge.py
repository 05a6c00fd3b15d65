"""Incremental snapshot merge (MERGE INTO / upsert semantics on plain
parquet): combine an existing table with a delta batch, keeping the latest
row per key.

This is the batch primitive behind incremental KG maintenance — a re-crawl
delta of (url, warc_ts, ...) pages or a fresh triple batch merges into the
standing table with latest-wins semantics, the same contract Iceberg's
``MERGE INTO`` provides (kg/checkpoint.py documents the 1:1 snapshot
mapping used in this jar-less sandbox).

Scale shape: one union (no shuffle) + one shuffle by key for the
row_number window. At 100 TB the existing side should be bucketed by the
merge key at rest so only the delta shuffles; with Iceberg available this
becomes a metadata-level MERGE. Ties on the timestamp are broken by
``seq_col`` (a monotonic ingest id) so the result is deterministic under
any partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["upsert_latest"]


def upsert_latest(
    existing: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    seq_col: str,
) -> DataFrame:
    """Latest-wins merge of ``delta`` into ``existing`` on ``keys``.

    Rows are ranked per key by (ts_col DESC, seq_col DESC) over the union
    of both inputs; rank 1 survives. A delta row older than the standing
    row does NOT clobber it (out-of-order re-deliveries are safe), and
    replaying the same delta is idempotent.
    """
    unioned = existing.unionByName(delta)
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), F.col(seq_col).desc()
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
