"""Extractive summarization: per-document TextRank over the sentence
similarity graph, computed as PURE JVM ARRAY ALGEBRA — zero shuffle.

The training-data use: snippet/abstract generation for retrieval
indexes, dataset cards, and dedup previews over a 10^12-doc corpus —
a per-doc transform must not shuffle, and this one doesn't: sentence
splitting, token sets, the pairwise Jaccard matrix, the power
iterations, and the top-n pick all happen inside one projection over
the document row (TextRank a la Mihalcea & Tarau 2004, sentence mode).

Scale shape: O(S^2) work per document where S = number of sentences
considered — bounded by ``max_sentences`` (default 24), so per-row cost
is a constant and the whole operator is a narrow map Catalyst pipelines
into the scan. Compare kg/ops/ranking.py textrank_keywords (corpus-
global, one shuffle): same recurrence, opposite granularity.

Determinism: sentence boundaries are a replayable RE2-safe rule (no
lookbehind — a capture-group replace inserts \\x01 then splits), the
similarity is exact-integer Jaccard evaluated in double, and the fixed
power iterations fold in index order; the contract oracle replays every
step in SQL including the iteration unroll.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["split_sentences", "textrank_summary"]

#: sentence-boundary marker inserted by the RE2-safe split rule
_SENT_MARK = "\x01"


def split_sentences(text: Column, max_sentences: int = 24) -> Column:
    """ARRAY<STRING> of the first ``max_sentences`` sentences of
    ``text``: a terminator ([.!?]) followed by whitespace ends a
    sentence. RE2-safe (capture-group replace + split — no lookbehind),
    so DuckDB replays the rule verbatim; trailing text without a
    terminator is a sentence; empty fragments are dropped."""
    marked = F.regexp_replace(text, r"([.!?])\s+", "$1" + _SENT_MARK)
    return F.slice(
        F.filter(
            F.transform(F.split(marked, _SENT_MARK), lambda s: F.trim(s)),
            lambda s: s != F.lit(""),
        ),
        1,
        max_sentences,
    )


def _token_sets(sents: Column) -> Column:
    # per sentence: sorted distinct lowercase whitespace tokens
    return F.transform(
        sents,
        lambda s: F.array_sort(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(s), r"\s+"), lambda x: x != F.lit("")
                )
            )
        ),
    )


def textrank_summary(
    docs: DataFrame,
    n_keep: int = 2,
    iterations: int = 4,
    damping: float = 0.85,
    max_sentences: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``n_keep`` summary sentences per document by sentence-level
    TextRank. Returns (id_col, sent_idx, sentence, rank) — sent_idx is
    the 0-based position in the document, rank the converged TextRank
    score rounded to 6 places; ties break toward the EARLIER sentence
    (lead-position prior). Documents with no sentences emit nothing; a
    single/isolated sentence keeps only the uniform base term (ranks do
    NOT sum to 1 — similarity-graph TextRank drops dangling
    redistribution, the standard formulation).

    The whole computation is one projection per row:
    - W[i][j] = Jaccard(tokens_i, tokens_j) for i != j (0 on the
      diagonal), built by a nested transform over sentence indices;
    - out-weight norms o[j] = sum_i W[j][i];
    - ``iterations`` rounds of r_i = (1-d)/S + d * sum_j (isolated
      sentences redistribute nothing — their rank mass decays to the
      uniform term, the standard dangling treatment for similarity
      graphs): r_i += d * W[j][i]/o[j] * r_j over j with o[j] > 0,
      folded in index order (the oracle folds identically);
    - top-n_keep by (rank desc, index asc), then posexplode.
    """
    d = float(damping)
    sents = split_sentences(F.col(text_col), max_sentences)
    base = docs.select(
        F.col(id_col), sents.alias("_s")
    ).where(F.size("_s") > 0)
    n = F.size("_s")
    idx = F.sequence(F.lit(0), n - 1)

    def _jac(t, i, j):
        ti = F.element_at(t, i + 1)
        tj = F.element_at(t, j + 1)
        inter = F.size(F.array_intersect(ti, tj))
        union = F.size(F.array_union(ti, tj))
        return F.when(
            (i == j) | (union == 0), F.lit(0.0)
        ).otherwise(inter.cast("double") / union.cast("double"))

    def _iterate(w, o):
        # fixed power iterations as ONE runtime fold: acc/w/o are lambda
        # VARIABLES, so each iteration's rank vector is evaluated once
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(int(iterations))),
            F.transform(idx, lambda _: F.lit(1.0) / n.cast("double")),
            lambda acc, _: F.transform(
                idx,
                lambda i: F.lit(1.0 - d) / n.cast("double")
                + F.lit(d)
                * F.aggregate(
                    idx,
                    F.lit(0.0),
                    lambda s, j: s
                    + F.when(
                        F.element_at(o, j + 1) > 0,
                        F.element_at(F.element_at(w, j + 1), i + 1)
                        / F.element_at(o, j + 1)
                        * F.element_at(acc, j + 1),
                    ).otherwise(F.lit(0.0)),
                ),
            ),
        )

    # LET-BINDING chain via single-element transform(array(...)): the
    # token sets, the S x S matrix, and the out-norms each bind to a
    # lambda variable and are therefore evaluated ONCE per row at
    # runtime. Chained withColumn intermediates would be inlined by
    # CollapseProject and re-evaluated on EVERY element_at access
    # inside the iteration lambdas — O(S^2)-per-access, exponential
    # across iterations (measured: the sf0.01 contract went from
    # minutes to sub-second with this binding).
    ranks = F.element_at(
        F.transform(
            F.array(_token_sets(F.col("_s"))),
            lambda t: F.element_at(
                F.transform(
                    F.array(
                        F.transform(
                            idx,
                            lambda i: F.transform(
                                idx, lambda j: _jac(t, i, j)
                            ),
                        )
                    ),
                    lambda w: F.element_at(
                        F.transform(
                            F.array(
                                F.transform(
                                    w,
                                    lambda row: F.aggregate(
                                        row,
                                        F.lit(0.0),
                                        lambda acc, v: acc + v,
                                    ),
                                )
                            ),
                            lambda o: _iterate(w, o),
                        ),
                        1,
                    ),
                ),
                1,
            ),
        ),
        1,
    )
    # total on empty docs: stage fusion can evaluate these projections
    # BEFORE the size filter (observed on rake_keyphrases), and an empty
    # _s would make idx = sequence(0, -1) descend into element_at(.., 1)
    # on empty arrays
    base = base.withColumn(
        "_r",
        F.when(n > 0, ranks).otherwise(
            F.array().cast("array<double>")
        ),
    )
    picked = F.when(
        n > 0,
        F.slice(
            F.array_sort(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        (-F.element_at("_r", i + 1)).alias("_neg"),
                        i.cast("int").alias("sent_idx"),
                    ),
                )
            ),
            1,
            n_keep,
        ),
    ).otherwise(F.array().cast("array<struct<_neg:double,sent_idx:int>>"))
    return base.select(
        id_col, F.explode(picked).alias("_p"), "_s", "_r"
    ).select(
        id_col,
        F.col("_p.sent_idx").cast("int").alias("sent_idx"),
        F.element_at("_s", F.col("_p.sent_idx") + 1).alias("sentence"),
        F.round(
            F.element_at("_r", F.col("_p.sent_idx") + 1), 6
        ).alias("rank"),
    )
