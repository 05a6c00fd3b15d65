"""Event-stream operators over the events table (event_id, ts, user_id,
event_type, value, props).

Sessionization is the canonical stateful event operator: split each user's
ordered event stream wherever the inter-event gap exceeds a threshold, then
aggregate per session. Expressed as two window functions + one groupBy —
all JVM-side; the only shuffle is the partitionBy(user_id) exchange, which
the window and the aggregation share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["sessionize"]


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts at the first event
    and whenever the gap since the previous event exceeds ``gap_minutes``.

    Returns (user_id, session_seq, n_events, t_start_us, t_end_us,
    total_value_cents) with microsecond-epoch bounds (exact integers — immune
    to timezone/format drift between engines). total_value_cents sums
    per-event round(value*100) as int64: float groupBy-sums are
    order-dependent across engines (a rounded double can flip at the
    boundary), integer sums are associative and engine-exact.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # parquet timestamps may load as TIMESTAMP_NTZ; under a UTC session the
    # cast makes unix_micros the same wall-time epoch DuckDB's epoch_us uses
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    sessions = events.withColumn("_new", is_new).withColumn(
        "session_seq", F.sum("_new").over(run)
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min(us).alias("t_start_us"),
            F.max(us).alias("t_end_us"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "total_value_cents"
            ),
        )
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("session_seq").cast("long").alias("session_seq"),
            "n_events",
            "t_start_us",
            "t_end_us",
            "total_value_cents",
        )
    )
