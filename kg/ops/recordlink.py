"""Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969):
blocked candidate pairs → per-field agreement comparisons → log2(m/u)
evidence weights → match / possible / non_match decision bands.

This is the record-level arm of the canonicalization ladder: alias CC
(kg/stages/canon.py) merges surfaces that normalize identically, FastSS
handles character typos, MinHash handles near-duplicate documents — FS
handles STRUCTURED records whose fields each carry separate, imperfect
evidence, with per-field error rates (m = P(agree | match),
u = P(agree | non-match)) turning agreements into additive log-evidence.

Scale shape:
- Blocking is a count-then-filter capped equi-join — the same bucket-cap
  discipline as every blocking op in this repo (dedup.py, similarity.py):
  oversized blocks (stopword-ish first tokens, empty fields) are dropped
  BEFORE the join, bounding candidates at blocks × cap².
- Scoring is pure column arithmetic over the pair table: each comparator
  is a JVM expression, each weight a literal double — no UDF, no extra
  shuffle beyond the one blocked join.
- Weights are FIXED parameters here (the textbook supervised setting);
  EM estimation of m/u would be a small driver-side loop over the same
  agreement-vector aggregation and can reuse this scoring path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "COMPARATORS", "fs_weights", "blocked_pairs", "fs_link",
    "agreement_patterns", "fs_em",
]


def _exact(a: Column, b: Column) -> Column:
    return a == b


def _first_token(a: Column, b: Column) -> Column:
    return F.split(a, " ").getItem(0) == F.split(b, " ").getItem(0)


def _lev1(a: Column, b: Column) -> Column:
    return F.levenshtein(a, b) <= 1


COMPARATORS = {
    "exact": _exact,
    "first_token": _first_token,
    "lev1": _lev1,
}


def fs_weights(m: float, u: float) -> tuple[float, float]:
    """(agreement, disagreement) log2 evidence weights for a field with
    P(agree|match)=m, P(agree|non-match)=u."""
    return math.log2(m / u), math.log2((1.0 - m) / (1.0 - u))


def _capped(df: DataFrame, block_col: str, max_block: int) -> DataFrame:
    # same count-then-filter idiom as minhash_band_candidates: the keep
    # set is distinct block keys (no broadcast hint — AQE sizes it)
    counts = df.groupBy(block_col).agg(F.count(F.lit(1)).alias("_bc"))
    keep = counts.where(F.col("_bc") <= max_block).select(block_col)
    return df.join(keep, block_col)


def blocked_pairs(
    a: DataFrame,
    b: DataFrame,
    specs: list[tuple],
    a_key: str,
    b_key: str,
    block_a: str,
    block_b: str,
    max_block: int = 256,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Capped blocked candidate pairs: equal blocking keys become pairs;
    blocks larger than ``max_block`` on EITHER side are dropped
    (count-then-filter) before the join. Shared by fs_link (scoring) and
    agreement_patterns (EM fitting)."""
    ca = _capped(
        a.select(
            a_key, F.col(block_a).alias("_blk"),
            *dict.fromkeys(
                [s[0] for s in specs] + [c for c in keep_cols if c in a.columns]
            ),
        ),
        "_blk",
        max_block,
    )
    cb = _capped(
        b.select(
            b_key, F.col(block_b).alias("_blk"),
            *dict.fromkeys(
                [s[1] for s in specs] + [c for c in keep_cols if c in b.columns]
            ),
        ),
        "_blk",
        max_block,
    )
    return ca.join(cb, "_blk")


def fs_link(
    a: DataFrame,
    b: DataFrame,
    specs: list[tuple[str, str, str, float, float]],
    a_key: str,
    b_key: str,
    block_a: str,
    block_b: str,
    upper: float,
    lower: float,
    max_block: int = 256,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Blocked FS linkage of ``a`` against ``b``.

    ``specs``: one (a_col, b_col, comparator, m, u) per field;
    comparator ∈ COMPARATORS. ``block_a``/``block_b``: blocking-key
    columns (equal keys become candidate pairs; blocks larger than
    ``max_block`` on either side are dropped, count-then-filter, BEFORE
    the join). ``upper``/``lower``: score bands — ≥ upper → 'match',
    > lower → 'possible', else 'non_match'.

    Returns (a_key, b_key, [keep_cols from a then b], score, label).
    Column collisions are avoided by prefixing: a's columns stay bare,
    b's compared/kept columns must not collide with a's (callers rename
    first — explicit beats silent suffixing).
    """
    pairs = blocked_pairs(
        a, b, specs, a_key, b_key, block_a, block_b, max_block, keep_cols
    )
    score = None
    for a_col, b_col, kind, m, u in specs:
        w_agree, w_dis = fs_weights(m, u)
        term = F.when(
            COMPARATORS[kind](F.col(a_col), F.col(b_col)), F.lit(w_agree)
        ).otherwise(F.lit(w_dis))
        score = term if score is None else score + term
    label = (
        F.when(score >= upper, F.lit("match"))
        .when(score > lower, F.lit("possible"))
        .otherwise(F.lit("non_match"))
    )
    out_cols = [a_key, b_key, *keep_cols]
    return pairs.select(
        *out_cols, score.alias("score"), label.alias("label")
    )


def agreement_patterns(
    pairs: DataFrame, specs: list[tuple]
) -> DataFrame:
    """Collapse candidate pairs to their agreement-vector histogram:
    one row per distinct (g0..gk-1) boolean pattern with its count.
    THIS is the corpus-scale step of EM fitting — one partial-agged
    groupBy over the pair table; everything after operates on ≤ 2^k
    rows. specs rows are (a_col, b_col, comparator, ...) — any trailing
    m/u entries are ignored."""
    cols = [
        COMPARATORS[s[2]](F.col(s[0]), F.col(s[1])).alias(f"g{i}")
        for i, s in enumerate(specs)
    ]
    names = [f"g{i}" for i in range(len(specs))]
    return (
        pairs.select(*cols)
        .groupBy(*names)
        .agg(F.count(F.lit(1)).alias("n"))
    )


_EM_EPS = 1e-6


def fs_em(
    patterns,
    n_fields: int,
    iters: int = 5,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_p: float = 0.5,
) -> tuple[list[float], list[float], float]:
    """Fellegi–Sunter EM (Winkler 1988): fit per-field m/u and the match
    prior p from the agreement-pattern histogram, unsupervised.

    ``patterns``: the DataFrame from :func:`agreement_patterns` (or any
    iterable of rows with g0..g{k-1} bools and n). The driver-side loop
    is the scale-correct design, not a shortcut: the corpus has already
    been reduced to ≤ 2^k pattern counts by one distributed aggregation,
    and EM over ≤ 2^k numbers is scalar arithmetic — distributing it
    would add k shuffles per iteration to update 2k+1 floats (the same
    reasoning as the Lloyd centroid update). Patterns are processed in
    sorted order so float summation — and therefore the result — is
    deterministic. Estimates are clamped to [eps, 1-eps] each M-step so
    degenerate fixtures can't produce 0/1 probabilities (and the log2
    weights they'd break).
    """
    if hasattr(patterns, "collect"):
        rows = patterns.collect()
    else:
        rows = list(patterns)
    ks = [f"g{i}" for i in range(n_fields)]
    hist = sorted(
        (tuple(bool(r[k]) for k in ks), int(r["n"])) for r in rows
    )
    m = [init_m] * n_fields
    u = [init_u] * n_fields
    p = init_p

    def clamp(x: float) -> float:
        return min(max(x, _EM_EPS), 1.0 - _EM_EPS)

    for _ in range(iters):
        total = 0.0
        w_tot = 0.0
        m_num = [0.0] * n_fields
        u_num = [0.0] * n_fields
        for g, n in hist:
            pm = p
            pu = 1.0 - p
            for i in range(n_fields):
                pm *= m[i] if g[i] else 1.0 - m[i]
                pu *= u[i] if g[i] else 1.0 - u[i]
            w = pm / (pm + pu)
            total += n
            w_tot += n * w
            for i in range(n_fields):
                if g[i]:
                    m_num[i] += n * w
                    u_num[i] += n * (1.0 - w)
        p = clamp(w_tot / total)
        m = [clamp(m_num[i] / w_tot) for i in range(n_fields)]
        u = [clamp(u_num[i] / (total - w_tot)) for i in range(n_fields)]
    return m, u, p
