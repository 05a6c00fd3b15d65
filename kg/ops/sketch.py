"""Cardinality and distribution sketches over the corpus.

Two needs a 100-TB curation pipeline hits constantly: "how many distinct
X per group" (vocabulary sizes, per-domain URL counts, dedup-ratio
monitoring) and "what does the distribution of X look like" (doc-length
/ score quantiles for filter thresholds). Exact answers shuffle every
distinct value; sketches bound the per-group state.

- ``kmv_distinct``: K-Minimum-Values cardinality estimator
  (Bar-Yossef et al. 2002 — the bottom-k sketch). Hash every value with
  md5 to a uniform 60-bit integer, keep only the K smallest per group;
  estimate = (K-1) / max_normalized_kth. Per-group state is K longs
  regardless of cardinality, and the groupBy partial-aggregates
  map-side. CRUCIALLY this sketch is **deterministic** (md5, no seed),
  so unlike HLL it has an exact cross-engine oracle: DuckDB recomputes
  the identical K minima and estimate, and the driver hash-compares —
  a sketch whose *implementation* is contract-checked, not just its
  error bound. Error: ~1/sqrt(K-2) relative (K=256 -> ~6%); pinned vs
  exact counts in tests.
- ``grouped_quantiles``: exact linear-interpolation quantiles per group
  (Spark SQL ``percentile``; oracle = DuckDB ``quantile_cont``). Exact
  per-group quantiles sort each group's values in one aggregation
  buffer — fine when groups are few and bounded (event types,
  languages); for unbounded groups the scale path is
  ``approx_percentile`` (KLL-style bounded state), exposed via
  ``approx=True`` and pinned against the exact op by a tolerance test
  (no oracle: Spark's sketch is engine-internal).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmv_distinct", "kmv_overlap", "grouped_quantiles",
           "cms_build", "cms_estimate", "cms_inner_product",
           "bloom_build", "bloom_probe",
           "hll_registers", "hll_estimate", "hll_distinct", "hll_merge"]

# 15 hex chars = 60 bits: fits a signed 64-bit long exactly, and both
# engines parse it identically (Spark conv(x,16,10); DuckDB '0x'||x cast)
_HEX_DIGITS = 15
_MAX_HASH = float(16 ** _HEX_DIGITS)


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 256,
    n_shards: int = 1,
) -> DataFrame:
    """Per-group KMV (bottom-k) distinct-count estimate.

    Returns (group_cols..., n_seen, kth_min, est_distinct):
    - ``n_seen``: number of distinct hashes retained (= min(K, true
      distinct) — for small groups the sketch IS exact and the estimate
      falls back to it);
    - ``kth_min``: the K-th smallest 60-bit hash (largest retained);
    - ``est_distinct``: (K-1)/(kth_min/2^60) when the sketch is full,
      else n_seen; rounded to 6 places.

    Shape: project to (group, hash) -> groupBy collecting
    ``array_sort(collect_set)`` truncated to K via slice. With
    ``n_shards=1`` the aggregation state grows with per-group distinct
    values before the slice; ``n_shards>1`` switches to the TWO-LEVEL
    min-k-of-min-k — a first groupBy on (group, hash mod n_shards)
    keeps each aggregation's input to ~distinct/n_shards values, then a
    second pass merges the per-shard bottom-k arrays. The result is
    IDENTICAL (any global bottom-k element is in its shard's bottom-k;
    shards partition distinct hashes disjointly), so the same oracle
    checks both; the contract query runs the two-level path.
    """
    groups = list(group_cols)
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, _HEX_DIGITS),
        16,
        10,
    ).cast("long")
    # explicit null semantics: null values are NOT a distinct value
    # (matches the oracle's WHERE value IS NOT NULL)
    base = df.where(F.col(value_col).isNotNull()).select(
        *groups, h.alias("_h")
    )
    if n_shards > 1:
        partial = base.groupBy(
            *groups, F.pmod("_h", F.lit(n_shards)).alias("_shard")
        ).agg(F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_pm"))
        sk = (
            partial.select(*groups, F.explode("_pm").alias("_h"))
            .groupBy(*groups)
            .agg(
                F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias(
                    "_mins"
                )
            )
        )
    else:
        sk = base.groupBy(*groups).agg(
            F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_mins")
        )
    n_seen = F.size("_mins")
    kth = F.element_at("_mins", n_seen)
    est = F.when(
        n_seen < k, n_seen.cast("double")
    ).otherwise(F.lit(float(k - 1)) / (kth / F.lit(_MAX_HASH)))
    return sk.select(
        *groups,
        n_seen.cast("long").alias("n_seen"),
        kth.cast("long").alias("kth_min"),
        F.round(est, 6).alias("est_distinct"),
    )


def kmv_oracle_sql(
    table_expr: str,
    group_cols: Sequence[str],
    value_expr: str,
    k: int = 256,
) -> str:
    """DuckDB SQL recomputing :func:`kmv_distinct` bit-for-bit (kept
    beside the op so the sketch and its oracle evolve together)."""
    groups = ", ".join(group_cols)
    return f"""
WITH hashed AS (
  SELECT DISTINCT {groups},
         ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1,
                         {_HEX_DIGITS}))::BIGINT AS h
  FROM {table_expr}
  WHERE {value_expr} IS NOT NULL
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY {groups} ORDER BY h) AS rn
  FROM hashed
),
sk AS (
  SELECT {groups}, count(*) AS n_seen, max(h) AS kth
  FROM ranked WHERE rn <= {k} GROUP BY {groups}
)
SELECT {groups}, CAST(n_seen AS BIGINT) AS n_seen,
       CAST(kth AS BIGINT) AS kth_min,
       round(CASE WHEN n_seen < {k} THEN CAST(n_seen AS DOUBLE)
                  ELSE {float(k - 1)} / (kth / {_MAX_HASH}) END,
             6) AS est_distinct
FROM sk
"""


def grouped_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float] = (0.1, 0.25, 0.5, 0.75, 0.9),
    approx: bool = False,
) -> DataFrame:
    """Per-group quantiles of ``value_col``, one row per (group, p).

    ``approx=False``: exact linear interpolation (matches DuckDB
    ``quantile_cont``); ``approx=True``: ``approx_percentile`` with
    bounded sketch state — the 100-TB path for high-cardinality groups,
    accuracy pinned vs exact in tests rather than by oracle.
    """
    groups = list(group_cols)
    ps = [float(p) for p in probs]
    fn = F.approx_percentile if approx else F.percentile
    qs = df.groupBy(*groups).agg(
        fn(F.col(value_col), F.array(*[F.lit(p) for p in ps])).alias("_qs")
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(p) for p in ps]).alias("p"),
        F.col("_qs").alias("q"),
    )
    return qs.select(*groups, F.explode(pairs).alias("_pq")).select(
        *groups,
        F.col("_pq.p").alias("p"),
        F.round(F.col("_pq.q").cast("double"), 6).alias("q"),
    )


def kmv_overlap(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    k: int = 256,
    n_shards: int = 1,
) -> DataFrame:
    """Cross-corpus overlap estimation from two KMV (theta) sketches —
    "how much does corpus B's vocabulary / url space / shingle set
    overlap corpus A's?" at sketch cost instead of a distinct-join. The
    theta-sketch set algebra (Dasgupta et al. 2016): with both sketches
    full, theta = min(kth_min_a, kth_min_b) scaled to (0,1]; every
    retained hash below theta is a uniform sample of the union, so
    |intersection sample| / theta estimates the true intersection, and
    the Jaccard estimate is the sample ratio. When a side's sketch is
    not full it IS its exact distinct set (theta = 1), so small inputs
    degrade to exact answers — same fallback as kmv_distinct.

    Deterministic (md5, no seeds): the contract oracle recomputes both
    sketches and the set algebra bit-for-bit. Returns one row:
    (n_a, n_b, est_distinct_a, est_distinct_b, est_intersect, est_union,
    est_jaccard), estimates rounded to 6 places.

    Shape: one groupBy-collect per side bounded to k values (use
    ``n_shards`` > 1 for the two-level bottom-k merge when per-side
    distinct counts are huge — identical result, see kmv_distinct), then
    a 1-row x 1-row join; all set algebra on <= k-element arrays.
    """

    def _sketch(df: DataFrame, name: str):
        h = F.conv(
            F.substring(
                F.md5(F.col(value_col).cast("string")), 1, _HEX_DIGITS
            ),
            16,
            10,
        ).cast("long")
        base = df.where(F.col(value_col).isNotNull()).select(h.alias("_h"))
        if n_shards > 1:
            partial = base.groupBy(
                F.pmod("_h", F.lit(n_shards)).alias("_shard")
            ).agg(F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_pm"))
            base = partial.select(F.explode("_pm").alias("_h"))
        return base.agg(
            F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias(name)
        )

    j = _sketch(a, "ha").crossJoin(_sketch(b, "hb"))
    max_h = F.lit(_MAX_HASH)

    def _theta(arr: str):
        return F.when(
            F.size(arr) >= k, F.element_at(arr, k).cast("double")
        ).otherwise(max_h)

    theta = F.least(_theta("ha"), _theta("hb"))
    j = j.withColumn("_t", theta)
    below = lambda arr: F.filter(  # noqa: E731
        F.col(arr), lambda x: x.cast("double") < F.col("_t")
    )
    j = (
        j.withColumn("_fa", below("ha"))
        .withColumn("_fb", below("hb"))
        .withColumn(
            "_inter", F.array_intersect(F.col("_fa"), F.col("_fb"))
        )
        .withColumn("_union", F.array_union(F.col("_fa"), F.col("_fb")))
    )
    tf = F.col("_t") / max_h

    def _est(size_col):
        return F.round(size_col / tf, 6)

    def _own_est(arr: str):
        # same estimator as kmv_distinct: (k-1)/(kth/2^60) when full,
        # exact count otherwise
        return F.when(
            F.size(arr) >= k,
            F.round(
                F.lit(float(k - 1))
                / (F.element_at(arr, k).cast("double") / max_h),
                6,
            ),
        ).otherwise(F.size(arr).cast("double"))

    return j.select(
        F.size("ha").cast("long").alias("n_a"),
        F.size("hb").cast("long").alias("n_b"),
        _own_est("ha").alias("est_distinct_a"),
        _own_est("hb").alias("est_distinct_b"),
        _est(F.size("_inter")).alias("est_intersect"),
        _est(F.size("_union")).alias("est_union"),
        F.round(
            F.when(
                F.size("_union") > 0,
                F.size("_inter") / F.size("_union").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("est_jaccard"),
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Sparse count-min sketch (Cormode & Muthukrishnan 2005) of a key
    column: returns the sketch AS A TABLE (row, col, n) with at most
    depth*width rows — the fixed-memory frequency summary a curation
    pipeline keeps per corpus snapshot to answer "how often does token/
    host/gram X occur" without re-scanning 100 TB.

    Determinism discipline of this module: the row hashes are md5 of
    "r:key" truncated to 60 bits mod width — no seeds, no engine
    internals — so the DuckDB oracle recomputes the sketch bit-for-bit
    (the implementation is contract-checked, not just its error bound).

    Scale shape: one projection exploding ``depth`` (row, col) cells per
    input row, then ONE partial-aggregable groupBy whose output is
    bounded by depth*width regardless of corpus size. Sketches of two
    corpora merge by cell-wise sum (the monoid property; same plan).
    """
    key = F.col(key_col).cast("string")
    cells = F.transform(
        F.sequence(F.lit(0), F.lit(int(depth) - 1)),
        lambda r: F.struct(
            r.alias("row"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(r.cast("string"), F.lit(":"), key)),
                        1,
                        _HEX_DIGITS,
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            ).alias("col"),
        ),
    )
    return (
        df.where(key.isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-estimate each probe key against a ``cms_build`` sketch:
    est = min over the depth rows of that key's cell count (0 when a
    cell is absent — sparse cells are zero cells). CMS never
    underestimates; overestimation is bounded by collisions per cell
    (~N/width per row, min over depth rows).

    Scale shape: probes explode to depth cells, ONE equi-join against
    the (≤ depth*width row) sketch — broadcast-sized by construction —
    then one groupBy min per probe."""
    key = F.col(key_col).cast("string")
    cells = F.transform(
        F.sequence(F.lit(0), F.lit(int(depth) - 1)),
        lambda r: F.struct(
            r.alias("row"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(r.cast("string"), F.lit(":"), key)),
                        1,
                        _HEX_DIGITS,
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            ).alias("col"),
        ),
    )
    probe_cells = probes.select(
        F.col(key_col), F.explode(cells).alias("c")
    ).select(key_col, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).cast("long").alias("est"))
    )


def _bloom_positions(value, m_bits: int, k_hashes: int):
    """ARRAY<LONG> of the k Bloom bit positions of ``value`` (a string
    Column), via Kirsch-Mitzenmacher double hashing: p_i = (h1 + i*h2)
    mod m with h1, h2 independent 60-bit md5 hashes reduced mod m and h2
    forced odd BEFORE the reduction (odd stride -> full cycle when m is
    a power of two). Everything stays below 2^61 so the arithmetic is
    exact in both engines; the DuckDB oracle replays it verbatim."""
    h1 = F.conv(
        F.substring(F.md5(F.concat(F.lit("b1:"), value)), 1, _HEX_DIGITS),
        16, 10,
    ).cast("long") % m_bits
    h2 = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("b2:"), value)), 1, _HEX_DIGITS),
            16, 10,
        ).cast("long") * 2 + 1
    ) % m_bits
    return F.transform(
        F.sequence(F.lit(0), F.lit(int(k_hashes) - 1)),
        lambda i: (h1 + i.cast("long") * h2) % m_bits,
    )


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Deterministic Bloom filter of a value column, AS A TABLE of
    packed words ``(word LONG, bits LONG)`` — the seen-set a crawler /
    decontamination pass keeps per corpus snapshot to answer "have I
    ingested url/gram X" without joining against 10^12 rows.

    Words hold 32 bits each (bit j of word w covers position 32*w+j):
    32-bit packing keeps every mask positive in a signed 64-bit long, so
    Spark and DuckDB agree bit-for-bit with no sign-extension edge.
    Same determinism discipline as kmv/cms: md5 double hashing, no
    seeds — the oracle recomputes the filter's words exactly, so the
    contract checks the implementation, not just the error bound.

    Scale shape: one projection exploding k positions per row, then ONE
    partial-aggregable ``bit_or`` groupBy whose output is bounded by
    m_bits/32 rows regardless of corpus size. Duplicate inserts are
    absorbed map-side (bit_or is idempotent); filters of two corpora
    merge by word-wise bit_or (the monoid property, pinned in tests).
    False-positive rate ~ (1 - e^(-k*n/m))^k; false negatives are
    impossible (pinned in tests)."""
    if m_bits % 32:
        raise ValueError("m_bits must be a multiple of 32")
    val = F.col(value_col).cast("string")
    pos = F.explode(_bloom_positions(val, m_bits, k_hashes)).alias("_p")
    return (
        df.where(val.isNotNull())
        .select(pos)
        .select(
            F.shiftright(F.col("_p"), 5).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 32 AS INT))")
            .alias("_mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_probe(
    probes: DataFrame,
    bloom: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Membership-test each distinct probe value against a
    :func:`bloom_build` filter (same m_bits/k_hashes): returns
    ``(value_col, maybe_present BOOLEAN)`` — false means CERTAINLY
    absent (the decontamination / frontier-dedup fast path: only
    maybe-present rows proceed to the exact check), true means present
    or a false positive at the (1-e^(-kn/m))^k rate.

    Scale shape: probes explode to k (word, mask) tests, ONE equi-join
    against the (<= m_bits/32 row) filter table — broadcast-sized by
    construction — then one bool_and groupBy per probe. The corpus-sized
    probe side never shuffles beyond its own groupBy key."""
    val = F.col(value_col).cast("string")
    cells = (
        probes.where(val.isNotNull())
        .select(val.alias(value_col))
        .distinct()
        .select(
            value_col,
            F.explode(_bloom_positions(F.col(value_col), m_bits, k_hashes))
            .alias("_p"),
        )
        .select(
            value_col,
            F.shiftright(F.col("_p"), 5).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 32 AS INT))")
            .alias("_mask"),
        )
    )
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_mask"))
        == F.col("_mask")
    )
    return (
        cells.join(F.broadcast(bloom), ["word"], "left")
        .select(value_col, hit.alias("_hit"))
        .groupBy(value_col)
        .agg(F.bool_and("_hit").alias("maybe_present"))
    )


def cms_inner_product(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    depth: int = 4,
) -> DataFrame:
    """Equi-join SIZE estimation from two count-min sketches of the join
    keys (the AMS/CMS inner-product estimate, Cormode & Muthukrishnan
    2005 §4.2): |A ⋈ B on k| = Σ_k cntA(k)·cntB(k), estimated per
    sketch row as the cell-wise product sum and then MIN over the depth
    rows. Never underestimates (every row's estimate adds only
    collision mass); the query-planning primitive — size a shuffle
    join, pick broadcast vs sort-merge, or flag a blowup — without
    touching either corpus again.

    Scale shape: both inputs are <= depth*width-row sketch tables; the
    estimate is one equi-join on (row, col) + a depth-row aggregate.
    Returns one row: (est_join_size LONG)."""
    prod = (
        sketch_a.alias("a")
        .join(
            sketch_b.alias("b"),
            (F.col("a.row") == F.col("b.row"))
            & (F.col("a.col") == F.col("b.col")),
        )
        .groupBy(F.col("a.row").alias("row"))
        .agg(F.sum(F.col("a.n") * F.col("b.n")).alias("_s"))
    )
    spark = sketch_a.sparkSession
    rows = spark.range(int(depth)).select(F.col("id").cast("int").alias("row"))
    return (
        rows.join(prod, "row", "left")
        .agg(
            F.min(F.coalesce("_s", F.lit(0)))
            .cast("long")
            .alias("est_join_size")
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007): register-max cardinality sketch
# ---------------------------------------------------------------------------

def _hll_alpha(m: int) -> float:
    """Standard HLL bias-correction constant for m registers."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog register table: (group_cols..., reg, mx).

    The 60-bit md5 hash splits into a ``p``-bit register index (top
    bits) and a ``w = 60-p``-bit remainder; ``mx`` is the max over the
    group's values of rho(remainder) = 1 + leading zeros in the w-bit
    field (so mx in [1, w+1]). Like :func:`kmv_distinct` the sketch is
    seedless-deterministic (md5), so the DuckDB oracle recomputes the
    registers bit-for-bit — the *implementation* is contract-checked.

    This is the MERGEABLE form: registers from disjoint corpus slices
    (or different corpora) combine by ``union -> groupBy max`` —
    :func:`hll_estimate` of the merged table equals the sketch of the
    union (max is associative/commutative/idempotent). At most
    ``m = 2^p`` rows per group regardless of cardinality, and the
    groupBy partial-aggregates map-side, so per-task state is bounded
    at m longs — unlike KMV's collect_set, whose pre-slice state grows
    with the slice's distinct count (that is why KMV needs the
    two-level shard trick and HLL does not).
    """
    w = 60 - int(p)
    groups = list(group_cols)
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, _HEX_DIGITS),
        16,
        10,
    ).cast("long")
    base = df.where(F.col(value_col).isNotNull()).select(
        *groups, h.alias("_h")
    )
    reg = F.shiftright(F.col("_h"), w).cast("int").alias("reg")
    rem = F.col("_h").bitwiseAND(F.lit((1 << w) - 1))
    # rho = 1 + leading zeros of the w-bit remainder. length(bin(rem))
    # is the highest set bit position (1-indexed); bin(0) = "0" has
    # length 1, so the all-zeros case is explicit.
    rho = (
        F.when(rem == 0, F.lit(w + 1))
        .otherwise(F.lit(w + 1) - F.length(F.bin(rem)))
        .cast("int")
        .alias("_rho")
    )
    return (
        base.select(*groups, reg, rho)
        .groupBy(*groups, "reg")
        .agg(F.max("_rho").cast("int").alias("mx"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: Sequence[str],
    p: int = 12,
) -> DataFrame:
    """Cardinality estimate from a :func:`hll_registers` table.

    Returns (group_cols..., n_registers_hit, sum_scaled, est_distinct):
    - ``sum_scaled``: the harmonic-mean denominator Σ 2^-M_j held in
      EXACT integer space, scaled by 2^S with S = w+1 (every term
      2^(S-M_j) is an integer; zero registers contribute 2^S each).
      Integer summation is order-insensitive, so the one float
      division at the end is bit-identical across engines — the same
      exactness trick as harmonic_centrality's lcm sum.
    - ``est_distinct``: alpha_m * m^2 / (sum_scaled / 2^S), with the
      standard small-range linear-counting correction (est <= 2.5m and
      empty registers present -> m * ln(m / V)); rounded to 6.

    The large-range (2^60-hash-collision) correction is omitted: it
    engages near 2^58 distinct values, beyond any per-group cardinality
    this engine meets.
    """
    m = 1 << int(p)
    w = 60 - int(p)
    s = w + 1
    groups = list(group_cols)
    alpha_num = _hll_alpha(m) * float(m) * float(m) * float(1 << s)
    sk = registers.groupBy(*groups).agg(
        F.count("*").cast("int").alias("n_registers_hit"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {s} - mx)"))
        .cast("long")
        .alias("_present"),
    )
    v = F.lit(m) - F.col("n_registers_hit")
    sum_scaled = (
        F.col("_present") + v.cast("long") * F.lit(1 << s).cast("long")
    )
    raw = F.lit(alpha_num) / sum_scaled.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return sk.select(
        *groups,
        "n_registers_hit",
        sum_scaled.cast("long").alias("sum_scaled"),
        F.round(est, 6).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate (registers +
    estimate in one call). Error ~1.04/sqrt(m) relative (p=12 -> ~1.6%).

    Versus :func:`kmv_distinct`: HLL state is m bytes-worth of register
    maxes with map-side bounded aggregation and trivial mergeability
    (:func:`hll_merge`); KMV gives the cross-engine-exact bottom-k AND
    supports set-algebra overlap (:func:`kmv_overlap`). The corpus
    monitors use both: HLL for always-on per-group counters, KMV when
    overlap/Jaccard between sketches is needed.
    """
    return hll_estimate(hll_registers(df, group_cols, value_col, p), group_cols, p)


def hll_merge(
    registers_a: DataFrame,
    registers_b: DataFrame,
    group_cols: Sequence[str],
) -> DataFrame:
    """Merge two register tables over the same group keys: union ->
    groupBy max. The defining mergeable-sketch property (estimate of
    the merge == sketch of the concatenated corpora) is pinned in
    tests; this is what makes HLL counters maintainable incrementally
    across crawl snapshots without re-scanning history."""
    groups = list(group_cols)
    return (
        registers_a.select(*groups, "reg", "mx")
        .unionByName(registers_b.select(*groups, "reg", "mx"))
        .groupBy(*groups, "reg")
        .agg(F.max("mx").cast("int").alias("mx"))
    )


def hll_oracle_sql(
    table_expr: str,
    group_cols: Sequence[str],
    value_expr: str,
    p: int = 12,
) -> str:
    """DuckDB SQL recomputing :func:`hll_distinct` bit-for-bit (same
    md5 hash, same register split, same exact-integer harmonic sum;
    the single division and the ln() of the linear-counting branch are
    one-operation floats rounded to 6, as everywhere in the contract)."""
    m = 1 << int(p)
    w = 60 - int(p)
    s = w + 1
    groups = ", ".join(group_cols)
    alpha_num = repr(_hll_alpha(m) * float(m) * float(m) * float(1 << s))
    return f"""
WITH hashed AS (
  SELECT {groups},
         ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1,
                         {_HEX_DIGITS}))::BIGINT AS h
  FROM {table_expr}
  WHERE {value_expr} IS NOT NULL
),
regs AS (
  SELECT {groups}, CAST(h >> {w} AS INTEGER) AS reg,
         CAST(max(CASE WHEN (h & {(1 << w) - 1}) = 0 THEN {w + 1}
                  ELSE {w + 1} - length(bin(h & {(1 << w) - 1})) END)
              AS INTEGER) AS mx
  FROM hashed GROUP BY {groups}, reg
),
sk AS (
  SELECT {groups}, CAST(count(*) AS INTEGER) AS n_registers_hit,
         CAST(sum((1::BIGINT << ({s} - mx))) +
              ({m} - count(*)) * (1::BIGINT << {s}) AS BIGINT) AS sum_scaled
  FROM regs GROUP BY {groups}
)
SELECT {groups}, n_registers_hit, sum_scaled,
       round(CASE WHEN {alpha_num} / CAST(sum_scaled AS DOUBLE) <= {2.5 * m}
                   AND {m} - n_registers_hit > 0
                  THEN {float(m)!r} * ln({float(m)!r} /
                       CAST({m} - n_registers_hit AS DOUBLE))
                  ELSE {alpha_num} / CAST(sum_scaled AS DOUBLE) END,
             6) AS est_distinct
FROM sk
"""
