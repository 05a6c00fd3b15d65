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

__all__ = ["upsert_latest", "snapshot_diff", "history_intervals"]


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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Row-level diff between two snapshots of the same keyed table:
    (keys..., status) with status in added / removed / changed /
    unchanged.

    ``changed`` means any of ``compare_cols`` differs (null-safe), so a
    KG maintainer can compute triple adds/retractions between crawls
    without replaying either. One co-shuffle of both snapshots on the
    key (exchange-free when the snapshots are bucketed by key at rest,
    which the checkpointed stage outputs are).
    """
    keys = list(keys)
    o = old.select(
        *keys,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    joined = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, status.alias("status"))


def history_intervals(
    events: DataFrame,
    keys: Sequence[str],
    ts: str = "ts",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """SCD2-style validity intervals from a change-event stream: each
    event's attributes are valid from its own timestamp until the key's
    next event (``valid_to`` null for the open, current version;
    ``is_current`` flags it).

    This is how a KG tracks entity-attribute history across crawls: feed
    it the per-crawl snapshots' change rows and as-of join consumers
    against the intervals (or use kg.ops.temporal.asof_join directly on
    the raw events). One shuffle on the key; the lead() window reuses the
    groupBy partitioning. ``order_cols`` breaks timestamp ties
    deterministically (e.g. an event id).
    """
    keys = list(keys)
    order = [F.col(ts), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    out = events.withColumn("_valid_to", F.lead(ts).over(w))
    return out.select(
        *keys,
        *[c for c in events.columns if c not in keys and c != ts],
        F.col(ts).alias("valid_from"),
        F.col("_valid_to").alias("valid_to"),
        F.col("_valid_to").isNull().alias("is_current"),
    )
