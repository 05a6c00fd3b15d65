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

__all__ = ["sessionize", "funnel_steps", "cohort_retention", "mean_shift_changepoint", "sequence_pattern_matches", "robust_outliers", "winsorize",
           "detect_bursts"]


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


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    ts: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel completion per user: how far each user progressed
    through ``steps`` as a strictly-increasing event-time chain (the
    windowFunnel-style sequential-pattern operator).

    Step i is satisfied by the user's EARLIEST step-i event strictly
    after the chosen step-(i-1) time — greedy-earliest is optimal for a
    strict chain (an earlier anchor only weakens later constraints), so
    the result is both deterministic and maximal. Returns
    (user, steps_completed >= 1, t_first, t_last); users who never hit
    step 1 are absent.

    Shape: one filtered min-aggregate + one join per step, every stage
    keyed on the user column so the shuffles co-partition; no window
    over full event streams and no per-row Python. |steps| is small and
    fixed — the plan is |steps| hash-joins of user-sized (not
    event-sized) frames after the first aggregate.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("etype"),
        F.col(ts).alias("t"),
    )
    reached = (
        ev.where(F.col("etype") == steps[0])
        .groupBy("user")
        .agg(F.min("t").alias("t_1"))
    )
    levels = [reached]
    for i, step in enumerate(steps[1:], start=2):
        prev = levels[-1].select("user", F.col(f"t_{i-1}").alias("_pt"))
        nxt = (
            ev.where(F.col("etype") == step)
            .join(prev, "user")
            .where(F.col("t") > F.col("_pt"))
            .groupBy("user")
            .agg(F.min("t").alias(f"t_{i}"))
        )
        levels.append(nxt)
    out = levels[0]
    for i, lvl in enumerate(levels[1:], start=2):
        out = out.join(lvl, "user", "left")
    t_cols = [F.col(f"t_{i}") for i in range(1, len(steps) + 1)]
    completed = sum(
        (c.isNotNull().cast("int") for c in t_cols),
        F.lit(0),
    )
    t_last = F.coalesce(*reversed(t_cols))
    return out.select(
        F.col("user").alias(user_col),
        completed.cast("long").alias("steps_completed"),
        F.col("t_1").alias("t_first"),
        t_last.alias("t_last"),
    )


def cohort_retention(
    events: DataFrame,
    ts: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly cohort-retention matrix: users are grouped into the cohort
    of their first-activity ISO week; for each later week the matrix
    reports how many and what fraction were active.

    Returns (cohort_week, week_n, n_active, n_cohort, retention) with
    week_n = whole weeks since the cohort week (0 = the cohort week
    itself, retention 1.0 by construction).

    Shape: one groupBy(user) for first-activity (corpus shuffle), one
    distinct over (user, week) — same keyed shuffle — then a user-keyed
    join and a cohort-sized aggregation; cohort sizes join back
    broadcast. No windows over full event streams.
    """
    wk = F.date_trunc("week", F.col(ts))
    first = events.groupBy(F.col(user_col).alias("user")).agg(
        F.min(wk).alias("cohort_week")
    )
    activity = events.select(
        F.col(user_col).alias("user"), wk.alias("week")
    ).distinct()
    joined = activity.join(first, "user").select(
        "user",
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("long")
        .alias("week_n"),
    )
    active = joined.groupBy("cohort_week", "week_n").agg(
        F.countDistinct("user").cast("long").alias("n_active")
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("n_cohort")
    )
    return active.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_n",
        "n_active",
        "n_cohort",
        F.round(F.col("n_active") / F.col("n_cohort"), 4).alias("retention"),
    )


def detect_bursts(
    events: DataFrame,
    trailing: int = 24,
    factor: float = 3.0,
    type_col: str = "event_type",
    ts_col: str = "ts",
    grain: str = "hour",
) -> DataFrame:
    """Burst detection over the event stream: per (type, time bucket),
    flag buckets whose count jumps ``factor``× above the trailing
    baseline — the crawl-ops incident signal (an error-type burst = a
    site went hostile; a per-host fetch burst = a crawler trap started
    minting urls, cf. kg/ops/webnorm.py url_templates).

    baseline = mean count of the previous ``trailing`` OBSERVED buckets
    of the same type (rows-based window: an empty bucket contributes no
    row — crawl-scale streams always have volume; for sparse streams
    densify with the temporal module's rollup first). The first bucket
    of a type has no baseline and is never flagged.

    Returns (event_type, window_start, n, baseline, ratio, is_burst).
    Scale shape: ONE partial-aggregable corpus groupBy down to
    (type, bucket) — after which everything is bucket-cardinality, not
    event-cardinality — then one window per type over that small table.
    """
    counts = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc(grain, F.col(ts_col)).alias("window_start"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("window_start")
        .rowsBetween(-int(trailing), -1)
    )
    baseline = F.avg("n").over(w)
    return counts.select(
        "event_type",
        "window_start",
        F.col("n").cast("long").alias("n"),
        F.round(baseline, 6).alias("baseline"),
        F.round(F.col("n") / baseline, 6).alias("ratio"),
        (
            baseline.isNotNull()
            & (F.col("n") >= F.lit(float(factor)) * baseline)
        ).alias("is_burst"),
    )


def mean_shift_changepoint(
    events: DataFrame,
    grain: str = "hour",
) -> DataFrame:
    """Single most-likely mean-shift changepoint per event type (the
    CUSUM argmax): bucket the series by ``grain``, accumulate value
    sums, and find the boundary i maximizing the deviation between the
    prefix mean and the global mean — where monitoring would split the
    series ("did click revenue shift regime mid-crawl"). Complements
    :func:`detect_bursts` (local rate spikes) with a global
    level-change detector.

    Returns (event_type, cp_bucket, n_buckets, dev_scaled, rel_dev):
    cp_bucket = the bucket AFTER which the split maximizes
    ``|n * prefix_cents_i − i * total_cents|`` (ties -> earliest
    bucket); dev_scaled is that integer statistic — value cents and
    counts only, so the argmax is EXACT and engine-bit-identical (the
    same cents discipline as sessionize); rel_dev = dev_scaled
    normalized by n * total |cents| as one float division, rounded 6.

    Scale shape: one partial-agged groupBy(type, bucket) collapses the
    corpus to series-length rows; the cumulative window and argmax run
    per event type over those bucket rows (bounded by the time range,
    not the corpus) — the same two-phase discipline as threshold_sweep's
    histogram window."""
    cents = F.round(F.col("value") * 100).cast("long")
    buck = events.groupBy(
        F.col("event_type"),
        F.date_trunc(grain, F.col("ts")).alias("bucket"),
    ).agg(F.sum(cents).alias("c"), F.count("*").alias("k"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cum = F.sum("c").over(w)
    idx = F.row_number().over(
        Window.partitionBy("event_type").orderBy("bucket")
    )
    tot = F.sum("c").over(wall)
    n = F.count("*").over(wall)
    dev = F.abs(n * cum - idx * tot)
    scored = buck.select(
        "event_type",
        "bucket",
        n.alias("_n"),
        tot.alias("_tot"),
        dev.alias("_dev"),
    )
    best = scored.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.col("_dev").alias("d"),
                (F.lit(0).cast("long")
                 - F.unix_micros(F.col("bucket"))).alias("nb"),
            )
        ).alias("b"),
        F.max("_n").alias("n_buckets"),
        F.max(F.abs("_tot")).alias("_atot"),
    )
    return best.select(
        "event_type",
        F.timestamp_micros(-F.col("b.nb")).alias("cp_bucket"),
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.col("b.d").cast("long").alias("dev_scaled"),
        F.round(
            F.when(
                (F.col("_atot") > 0),
                F.col("b.d")
                / (F.col("n_buckets").cast("double") * F.col("_atot")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("rel_dev"),
    )


def sequence_pattern_matches(
    events: DataFrame,
    pattern: str,
    codes: dict,
    max_events: int = 4096,
) -> DataFrame:
    """CEP-lite (MATCH_RECOGNIZE's useful core): regex matching over each
    user's time-ordered event-type sequence. ``codes`` maps event_type ->
    a single character; the per-user history compiles to a code string
    and ``pattern`` (a regex over those characters, e.g. ``'ee+'`` =
    runs of 2+ consecutive errors, ``'vp'`` = a view immediately
    followed by a purchase) matches non-overlapping left-to-right.

    Returns one row per user with >= 1 match:
    (user_id, n_events, n_matches, first_pos, matches) — first_pos is
    the 1-based position of the first match in the coded sequence,
    matches the array of matched substrings. Events whose type is not
    in ``codes`` are DROPPED from the sequence (they do not break
    adjacency) — filter upstream to change that. Ordering ties break on
    event_id, fully deterministic.

    Engine parity: both Spark (Java regex) and DuckDB (RE2) use
    leftmost non-overlapping matching; keep patterns in the
    lookaround-free common subset (the same RE2-safe discipline as the
    summarize sentence splitter). first_pos is computed as
    len(split(seq, pattern)[0]) + 1 in BOTH engines rather than
    regexp_instr, which DuckDB lacks.

    Scale shape: one filter + one partial-agged groupBy(user) building
    the sorted code array (bounded by ``max_events`` per user via a
    count-then-filter guard — a runaway bot session cannot blow up the
    sort buffer); the regex work is a pure map over user rows.
    """
    mapping = F.create_map(
        *[F.lit(x) for kv in codes.items() for x in kv]
    )
    coded = events.select(
        F.col("user_id"),
        F.col("ts"),
        F.col("event_id"),
        F.element_at(mapping, F.col("event_type")).alias("_c"),
    ).where(F.col("_c").isNotNull())
    per_user = coded.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "_c"))
                ),
                lambda s: s["_c"],
            ),
            "",
        ).alias("_seq"),
    ).where(F.col("n_events") <= int(max_events))
    matches = F.expr(f"regexp_extract_all(_seq, '{pattern}', 0)")
    first_pos = (
        F.length(F.split(F.col("_seq"), pattern).getItem(0)) + 1
    )
    return (
        per_user.select(
            "user_id",
            "n_events",
            F.size(matches).cast("long").alias("n_matches"),
            first_pos.cast("long").alias("first_pos"),
            F.array_join(matches, ",").alias("matches"),
        )
        .where(F.col("n_matches") > 0)
    )


def robust_outliers(
    events: DataFrame,
    k: float = 3.5,
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Median/MAD robust outlier report per event type: flag counts for
    values with ``|x - median| > k * MAD`` — the dispersion gauge that,
    unlike mean/stddev z-scores, a handful of corrupt values cannot
    drag (the breakdown-point argument; k=3.5 is the conventional
    consistency-scaled cutoff neighborhood). The value-stream QA row
    beside detect_bursts (rates) and mean_shift_changepoint (levels).

    Returns one row per type: (event_type, n, median, mad, n_outliers,
    outlier_frac). Exactness: both medians are Spark SQL ``percentile``
    (linear interpolation — DuckDB quantile_cont replays it, the
    grouped_quantiles contract precedent); the comparison threshold is
    one float expression; counts are integers. MAD = 0 (over half the
    values identical) flags only exact deviants per the strict >
    comparison with k*0 — degenerate series behave predictably.

    Scale shape: two grouped exact percentiles (each one shuffle keyed
    by the type column; the second runs over the deviation column after
    a broadcast join of the per-type medians) + one partial-agged count
    rollup. Exact percentiles buffer per-group values — fine for
    bounded type cardinality; at unbounded group counts swap
    approx_percentile (the grouped_quantiles scale path).
    """
    med = events.groupBy(F.col(type_col).alias("_t")).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    dev = events.join(
        F.broadcast(med), F.col(type_col) == F.col("_t")
    ).withColumn("_adev", F.abs(F.col(value_col) - F.col("_med")))
    mad = dev.groupBy(F.col(type_col).alias("_t2")).agg(
        F.expr("percentile(_adev, 0.5)").alias("_mad")
    )
    flagged = dev.join(
        F.broadcast(mad), F.col(type_col) == F.col("_t2")
    ).withColumn(
        "_out",
        (F.col("_adev") > F.lit(float(k)) * F.col("_mad")).cast("int"),
    )
    return flagged.groupBy(F.col(type_col).alias("event_type")).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.first("_med"), 6).alias("median"),
        F.round(F.first("_mad"), 6).alias("mad"),
        F.sum("_out").cast("long").alias("n_outliers"),
        F.round(F.sum("_out") / F.count("*").cast("double"), 6).alias(
            "outlier_frac"
        ),
    )


def winsorize(
    events: DataFrame,
    lo: float = 0.01,
    hi: float = 0.99,
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` to its group's
    [lo, hi] exact percentiles — the standard tail-taming transform
    before mean-based aggregation of heavy-tailed value streams (the
    fix applied where :func:`robust_outliers` reports the damage).
    Returns the input rows plus (v_lo, v_hi, value_w, clipped).

    Exactness: the percentile bounds are Spark SQL ``percentile``
    (linear interpolation == DuckDB quantile_cont); the clip is
    least/greatest — no arithmetic, so clipped rows carry EXACTLY the
    bound value. Scale shape: one grouped exact-percentile aggregate
    (bounded type cardinality; approx_percentile is the unbounded-group
    path) + one broadcast join back; the event stream never shuffles.
    """
    if not 0.0 <= float(lo) < float(hi) <= 1.0:
        raise ValueError("need 0 <= lo < hi <= 1")
    bounds = events.groupBy(F.col(type_col).alias("_t")).agg(
        F.expr(f"percentile({value_col}, {float(lo)})").alias("v_lo"),
        F.expr(f"percentile({value_col}, {float(hi)})").alias("v_hi"),
    )
    out = events.join(F.broadcast(bounds), F.col(type_col) == F.col("_t"))
    clipped = F.least(F.greatest(F.col(value_col), F.col("v_lo")), F.col("v_hi"))
    return out.drop("_t").select(
        *events.columns,
        F.round("v_lo", 6).alias("v_lo"),
        F.round("v_hi", 6).alias("v_hi"),
        F.round(clipped, 6).alias("value_w"),
        (clipped != F.col(value_col)).alias("clipped"),
    )
