"""Temporal joins and rollups: as-of join, bucketed range join, and
hypertable-style multi-granularity time rollup.

The reference is a stateless request service with no time axis
(/root/reference/src/hu_entity/server.py); a web-scale crawl corpus has
one everywhere (warc_ts on pages, event streams beside them), and these
are the three temporal operators Spark's DataFrame API does not ship
directly. All three are compositions of built-in operators — no Python
in the hot path — with shapes chosen so none of them degenerates into a
nested-loop/cartesian plan the way naive inequality joins do.

Scale shapes:
- ``asof_join``: the classic distributed merge-as-of. Both sides are
  tagged and UNIONed, then a single window per key carries the most
  recent right-side row forward onto each left row. ONE co-shuffle of
  both inputs on the key, one per-key sort — never a per-row range
  probe, never a join explosion. (A join-based formulation
  left ⋈ right ON key AND r.ts <= l.ts followed by max_by would
  replicate every right row onto every later left row — quadratic per
  key; the union-window form is linear.)
- ``range_join``: equi-join-able banding for interval containment.
  Windows are exploded onto fixed-width time buckets they cover, events
  hash to the single bucket containing their timestamp, and the match
  becomes (key, bucket) equi-join + residual BETWEEN filter. Catalyst
  plans a plain shuffled/broadcast hash join; without this, a pure
  inequality predicate forces BroadcastNestedLoopJoin (checked in
  tests/test_plans.py). Candidate blowup is bounded by
  ceil(window_len / bucket_width) + 1 copies per window.
- ``time_rollup``: the hypertable continuous-aggregate trick — scan the
  raw events ONCE at the finest grain, materialize that aggregate, and
  re-aggregate every coarser grain from the finer one (sums of sums,
  mins of mins). N grains cost one corpus shuffle plus N-1 shuffles of
  already-aggregated (tiny) tables, instead of N corpus scans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kg.session import materialize

__all__ = ["asof_join", "range_join", "time_rollup", "time_densify"]


def _epoch_sec(col) -> "F.Column":
    """Epoch seconds (fractional) from timestamp / timestamp_ntz /
    numeric columns. TIMESTAMP_NTZ has no direct DOUBLE cast in Spark 4;
    routing through TIMESTAMP applies the session zone (UTC everywhere
    in this engine) uniformly to both join sides, so bucket/containment
    arithmetic is unaffected."""
    return col.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    tolerance_sec: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row picks up ``right_cols`` from the
    closest right row for the same key — ``direction='backward'`` (the
    default): the latest right with ``right.ts <= left.ts``;
    ``direction='forward'``: the earliest right with ``right.ts >=
    left.ts``. Both inclusive; unmatched left rows keep nulls
    (left-join semantics; DuckDB ``ASOF LEFT JOIN`` equivalence is
    pinned by the contract oracles).

    ``tolerance_sec``: matches farther than this horizon are nulled out
    (pandas ``merge_asof(tolerance=...)`` semantics) — applied as a
    post-filter on the carried match timestamp, so it changes no join
    shape.

    Ties: multiple right rows on the same (key, ts) resolve to the one
    closest in window order — callers needing a total order should
    dedupe the right side first (``upsert_latest``); the contract query
    uses a right side unique per (key, ts).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    fwd = direction == "forward"
    keys = list(keys)
    right_cols = list(right_cols)
    # left_ts is re-emitted from _ts in the final select; carrying it in
    # lcols too would duplicate the column in the output schema
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    # tag ordering makes equal-ts matches inclusive: backward sorts right
    # BEFORE left (right at the same ts lands in the preceding frame);
    # forward sorts left before right (same ts lands in the following
    # frame, which is scanned with first() instead of last())
    tag_order = -F.col("_is_left") if fwd else F.col("_is_left")
    if fwd:
        frame = (Window.currentRow, Window.unboundedFollowing)
        carry = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    else:
        frame = (Window.unboundedPreceding, Window.currentRow)
        carry = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), tag_order)
        .rowsBetween(*frame)
    )
    carried = l_tag.unionByName(r_tag).select(
        *keys,
        "_ts",
        "_is_left",
        *lcols,
        *[
            carry(f"_r_{c}").over(w).alias(f"_r_{c}")
            for c in right_cols
        ],
        carry("_r_ts").over(w).alias("_r_ts"),
    )
    out = carried.where(F.col("_is_left") == 1)
    if tolerance_sec is not None:
        gap = _epoch_sec(F.col("_r_ts")) - _epoch_sec(F.col("_ts")) if fwd \
            else _epoch_sec(F.col("_ts")) - _epoch_sec(F.col("_r_ts"))
        in_tol = gap <= F.lit(float(tolerance_sec))
        out = out.select(
            *keys,
            "_ts",
            *lcols,
            *[
                F.when(in_tol, F.col(f"_r_{c}")).alias(f"_r_{c}")
                for c in right_cols
            ],
            F.when(in_tol, F.col("_r_ts")).alias("_r_ts"),
        )
    return out.select(
        *keys,
        F.col("_ts").alias(left_ts),
        *lcols,
        *[F.col(f"_r_{c}").alias(f"r_{c}") for c in right_cols],
        F.col("_r_ts").alias(f"r_{right_ts}"),
    )


def range_join(
    events: DataFrame,
    windows: DataFrame,
    keys: Sequence[str],
    ts: str = "ts",
    start: str = "win_start",
    end: str = "win_end",
    bucket_sec: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: event rows matched to every window row
    of the same key with ``start <= ts <= end`` (inclusive both ends),
    via fixed-width time-bucket banding so the plan is a hash equi-join.

    ``bucket_sec`` defaults to the max window length (one scalar agg
    over the windows side — assumed the small side). Each window is
    replicated onto the ceil(len/bucket)+1 buckets it covers; each
    event hashes to exactly ONE bucket, so no post-join dedup is needed.
    ``how='left_semi'`` returns just the events that fall in any window.
    """
    keys = list(keys)
    if bucket_sec is None:
        mx = windows.agg(
            F.max(_epoch_sec(F.col(end)) - _epoch_sec(F.col(start)))
        ).first()[0]
        bucket_sec = max(float(mx or 0.0), 1.0)
    b = float(bucket_sec)
    ev_b = events.withColumn(
        "_bucket", F.floor(_epoch_sec(F.col(ts)) / b)
    )
    win_b = windows.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(_epoch_sec(F.col(start)) / b),
                F.floor(_epoch_sec(F.col(end)) / b),
            )
        ),
    )
    if how == "left_semi":
        # the residual BETWEEN must ride inside the semi-join condition
        # (there is no post-filter on a semi join's right side)
        cond = F.lit(True)
        for k in keys:
            cond = cond & (F.col(f"e.{k}") == F.col(f"w.{k}"))
        cond = (
            cond
            & (F.col("e._bucket") == F.col("w._bucket"))
            & F.col(f"e.{ts}").between(F.col(f"w.{start}"), F.col(f"w.{end}"))
        )
        return (
            ev_b.alias("e")
            .join(win_b.alias("w"), on=cond, how="left_semi")
            .drop("_bucket")
        )
    joined = ev_b.join(win_b, on=[*keys, "_bucket"], how="inner").where(
        F.col(ts).between(F.col(start), F.col(end))
    )
    return joined.drop("_bucket")


# grain -> (truncate unit, seconds) — ordered finest to coarsest
_GRAINS = {
    "minute": 60.0,
    "hour": 3600.0,
    "day": 86400.0,
    "week": 604800.0,
}


def time_rollup(
    events: DataFrame,
    ts: str = "ts",
    value: str = "value",
    dims: Sequence[str] = (),
    grains: Sequence[str] = ("hour", "day"),
) -> DataFrame:
    """Multi-granularity time rollup (hypertable continuous-aggregate
    shape): per (grain, bucket_start, dims...) emit
    (n, sum_value, min_value, max_value), with every coarser grain
    re-aggregated from the next finer one — the raw table is scanned
    and shuffled exactly once.

    Returns the UNION over grains with a ``grain`` discriminator column.
    sum is rounded to 6 places at emission (after all re-aggregation, so
    coarse grains do not accumulate rounding error).
    """
    dims = list(dims)
    unknown = [g for g in grains if g not in _GRAINS]
    if unknown:
        raise ValueError(
            f"unknown grains {unknown}; supported: {sorted(_GRAINS)}"
        )
    order = sorted(set(grains), key=lambda g: _GRAINS[g])
    if list(grains) != order:
        raise ValueError(f"grains must be finest->coarsest: {order}")
    for fine, coarse in zip(order, order[1:]):
        if _GRAINS[coarse] % _GRAINS[fine] != 0:
            raise ValueError(f"{coarse} not a multiple of {fine}")

    finest = order[0]
    agg = materialize(
        events.groupBy(
            F.date_trunc(finest, F.col(ts)).alias("bucket_start"), *dims
        ).agg(
            F.count("*").alias("n"),
            F.sum(value).alias("sum_value"),
            F.min(value).alias("min_value"),
            F.max(value).alias("max_value"),
        )
    )
    out = []
    for grain in order:
        if grain != finest:
            agg = materialize(
                agg.groupBy(
                    F.date_trunc(grain, F.col("bucket_start")).alias(
                        "bucket_start"
                    ),
                    *dims,
                ).agg(
                    F.sum("n").alias("n"),
                    F.sum("sum_value").alias("sum_value"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
            )
        out.append(
            agg.select(
                F.lit(grain).alias("grain"),
                "bucket_start",
                *dims,
                F.col("n").cast("long").alias("n"),
                F.round("sum_value", 6).alias("sum_value"),
                "min_value",
                "max_value",
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def time_densify(
    buckets: DataFrame,
    grain: str = "hour",
    dims: Sequence[str] = (),
    fill_cols: Sequence[str] = ("n",),
) -> DataFrame:
    """Gap-fill a bucketed time series: for every dims-group, emit one
    row per ``grain`` step between that group\'s min and max
    bucket_start, with absent buckets carrying 0 in ``fill_cols`` and a
    ``filled`` flag — the densification step between a rollup and
    anything that assumes regular spacing (rate deltas, burst baselines,
    charting, seasonal diffs). Input shape = time_rollup\'s output for
    one grain: (bucket_start, dims..., measures...).

    Scale shape: the per-group span comes from ONE partial-aggregable
    groupBy over the BUCKET table (already aggregated — corpus-free);
    the dense spine is sequence()-exploded from the span row (one row
    per bucket, generated not shuffled) and left-joins the observed
    buckets back on the (dims, bucket) key."""
    if grain not in _GRAINS:
        raise ValueError(f"unknown grain {grain}")
    dims = list(dims)
    step = F.expr(f"INTERVAL 1 {grain}")
    spans = buckets.groupBy(*dims).agg(
        F.min("bucket_start").alias("_lo"), F.max("bucket_start").alias("_hi")
    )
    spine = spans.select(
        *dims,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias(
            "bucket_start"
        ),
    )
    joined = spine.join(buckets, [*dims, "bucket_start"], "left")
    fills = [
        F.coalesce(F.col(c), F.lit(0)).alias(c) for c in fill_cols
    ]
    others = [
        c
        for c in buckets.columns
        if c not in {*dims, "bucket_start", *fill_cols}
    ]
    return joined.select(
        *dims,
        "bucket_start",
        *fills,
        *others,
        F.col(fill_cols[0]).isNull().alias("filled"),
    )
