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

__all__ = ["COMPARATORS", "fs_weights", "fs_link"]


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
    pairs = ca.join(cb, "_blk")
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
