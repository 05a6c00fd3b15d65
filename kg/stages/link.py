"""Stage 4: entity linking — triples' subj/obj resolved against the alias dict.

Join strategy (scale story, in order of preference):
1. dim fits the broadcast threshold -> F.broadcast hash join; the 10^12-row
   fact side never shuffles (default here).
2. dim too big -> salted repartition join (kg/salt.py): hot head-entities
   ("Coffee" in ~30% of triples in the synthetic corpus; BASELINE.md skew
   knob) are spread across n_salts reducers; AQE skew-join splitting then
   mops up any residual imbalance.

Unmatched surfaces keep NULL ids (left join) — they flow to canonicalization
as singleton candidates rather than being dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kg.normalize import PUNCT
from kg.salt import salted_join

__all__ = ["link_triples", "norm_surface_col", "alias_priors", "nil_cluster",
           "disambiguate_by_context"]


def norm_surface_col(col: str | Column) -> Column:
    """Column version of kg.normalize.norm_value (lower, then strip ends)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.btrim(F.lower(c), F.lit(PUNCT))


def _alias_side(
    alias_dim: DataFrame, prefix: str, weights: DataFrame | None = None
) -> DataFrame:
    # deterministic one-row-per-norm. Without weights: min entity_id wins
    # (dropDuplicates keeps an arbitrary row and would be
    # partitioning-dependent). With weights (alias_norm, entity_id,
    # weight — e.g. commonness priors from alias_priors): the
    # highest-weight entity wins an ambiguous surface, ties -> min
    # entity_id; aliases with no weight row weigh 0.0, so unambiguous
    # aliases and cold entities keep the min-id behavior.
    dim = alias_dim.select("alias_norm", "entity_id", "canonical")
    if weights is None:
        w = F.lit(0.0)
    else:
        dim = dim.join(
            weights.select("alias_norm", "entity_id",
                           F.col("weight").cast("double").alias("_w")),
            ["alias_norm", "entity_id"],
            "left",
        )
        w = F.coalesce(F.col("_w"), F.lit(0.0))
    return (
        dim.groupBy(F.col("alias_norm").alias(f"{prefix}_norm"))
        .agg(
            F.min(
                F.struct(
                    (-w).alias("negw"), "entity_id", "canonical"
                )
            ).alias("_e")
        )
        .select(
            f"{prefix}_norm",
            F.col("_e.entity_id").alias(f"{prefix}_id"),
            F.col("_e.canonical").alias(f"{prefix}_canonical"),
        )
    )


def link_triples(
    triples: DataFrame,
    alias_dim: DataFrame,
    use_salting: bool = False,
    n_salts: int = 16,
    weights: DataFrame | None = None,
) -> DataFrame:
    """triples(url, subj, pred, obj, conf) + alias_dim(alias_norm, entity_id,
    canonical) -> linked triples with subj_id/obj_id/canonical columns.

    ``weights``: optional (alias_norm, entity_id, weight) dim —
    commonness priors (kg.stages.link.alias_priors) or any curated
    score; ambiguous surfaces resolve to the highest-weight entity
    instead of the min-id fallback. The weight join is dim x dim
    (dictionary-sized), so the fact side's plan is unchanged."""
    t = triples.withColumn("subj_norm", norm_surface_col("subj")).withColumn(
        "obj_norm", norm_surface_col("obj")
    )
    subj_dim = _alias_side(alias_dim, "subj", weights)
    obj_dim = _alias_side(alias_dim, "obj", weights)
    if use_salting:
        linked = salted_join(
            t, subj_dim, "subj_norm", n_salts=n_salts, how="left", entropy_col="url"
        )
        linked = salted_join(
            linked, obj_dim, "obj_norm", n_salts=n_salts, how="left", entropy_col="url"
        )
    else:
        linked = t.join(F.broadcast(subj_dim), "subj_norm", "left").join(
            F.broadcast(obj_dim), "obj_norm", "left"
        )
    return linked.select(
        "url",
        "subj",
        "pred",
        "obj",
        "conf",
        "subj_id",
        "subj_canonical",
        "obj_id",
        "obj_canonical",
    )


def alias_priors(
    mentions: DataFrame,
    surface_col: str = "matched_word",
    entity_col: str = "entity_name",
) -> DataFrame:
    """Commonness priors for entity linking: P(entity | surface) estimated
    by corpus vote over detected mentions — the standard disambiguation
    prior ("jaguar" -> the car 70% / the cat 30%) a linker combines with
    context. Returns one row per (surface, entity):
    (surface, entity, n, n_total, prior, top_entity) where ``prior`` =
    n / n_total and ``top_entity`` marks the argmax (ties -> smallest
    entity string, deterministic).

    Scale shape: one partial-agged groupBy on (surface, entity); the
    per-surface totals + argmax reduce further to one row per surface
    (min over a (-n, entity) struct — partial-aggregable, no window), and
    the join back is keyed on surface, which both sides are already
    hash-partitioned by from their own aggregations, so AQE elides the
    extra exchange. No skew pileup: the group key includes the entity.
    """
    counts = mentions.groupBy(
        F.col(surface_col).alias("surface"),
        F.col(entity_col).alias("entity"),
    ).agg(F.count("*").alias("n"))
    totals = counts.groupBy("surface").agg(
        F.sum("n").alias("n_total"),
        F.min(
            F.struct((-F.col("n")).alias("negn"), F.col("entity").alias("e"))
        ).alias("b"),
    )
    return counts.join(totals, "surface").select(
        "surface",
        "entity",
        F.col("n").cast("long").alias("n"),
        F.col("n_total").cast("long").alias("n_total"),
        F.round(F.col("n") / F.col("n_total"), 9).alias("prior"),
        (F.col("entity") == F.col("b.e")).alias("top_entity"),
    )


def nil_cluster(
    linked: DataFrame,
    max_per_doc: int = 64,
    doc_col: str = "url",
) -> DataFrame:
    """NIL clustering (the TAC-KBP entity-linking step after dictionary
    lookup fails): group the UNLINKED mention surfaces — subj/obj rows
    link_triples left with NULL ids — into synthetic emerging entities,
    so downstream canonicalization sees one candidate node per real-world
    NIL entity instead of one per surface form.

    Rule (deterministic, relational): two distinct normalized surfaces
    belong to the same NIL entity when they co-occur in the SAME document
    and one is a contiguous token subsequence of the other ("dr maria von
    holt" ⊇ "maria von holt" ⊇ "von holt" — the newswire coreference
    convention that shorter references follow a full introduction);
    clusters are the connected components of that evidence graph, so
    variants chain transitively across documents even when the extreme
    forms never co-occur. Surfaces are keyed by their 60-bit md5 hash
    (the engine's cross-engine-exact id scheme); ``nil_id`` is the
    NEGATED component min-hash — the sign keeps synthetic ids disjoint
    from dictionary entity ids.

    Returns (surface_norm, nil_id, canonical, n_mentions): canonical =
    the cluster's longest surface (ties -> lexicographically smallest),
    n_mentions = total unlinked mention instances of that surface.

    Scale shape: mention extraction is a pure map + one partial-agged
    groupBy; the evidence self-join is co-partitioned on the doc key
    with a count-then-filter cap on distinct unlinked surfaces per doc
    (``max_per_doc``, the same skew guard as entity_cooccurrence — one
    boilerplate page with 10^4 junk surfaces would otherwise go
    quadratic); components run on the SURFACE graph (vocabulary-sized,
    orders of magnitude below the corpus) via the large-star/small-star
    iteration. A dropped doc's surfaces still cluster via their other
    docs — the cap trades evidence recall, never precision.
    """
    from kg.cc import connected_components

    subj_m = linked.where(F.col("subj_id").isNull()).select(
        F.col(doc_col).alias("url"), norm_surface_col("subj").alias("norm")
    )
    obj_m = linked.where(F.col("obj_id").isNull()).select(
        F.col(doc_col).alias("url"), norm_surface_col("obj").alias("norm")
    )
    m = subj_m.union(obj_m).where(F.col("norm") != "")
    counts = m.groupBy("norm").agg(F.count("*").cast("long").alias("n_mentions"))
    per_doc = m.distinct()
    small_docs = (
        per_doc.groupBy("url")
        .agg(F.count("*").alias("_k"))
        .where(F.col("_k") <= int(max_per_doc))
        .select("url")
    )
    kept = per_doc.join(small_docs, "url")

    def _hid(c: Column) -> Column:
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

    a, b = kept.alias("a"), kept.alias("b")
    contain = (
        F.instr(
            F.concat(F.lit(" "), F.col("a.norm"), F.lit(" ")),
            F.concat(F.lit(" "), F.col("b.norm"), F.lit(" ")),
        )
        > 0
    )
    edges = (
        a.join(
            b,
            (F.col("a.url") == F.col("b.url"))
            & (F.col("a.norm") != F.col("b.norm"))
            & contain,
        )
        .select(
            _hid(F.col("a.norm")).alias("src"),
            _hid(F.col("b.norm")).alias("dst"),
        )
        .distinct()
    )
    comp = connected_components(edges).select(
        F.col("node").alias("hid"), F.col("component")
    )
    clustered = (
        counts.select("norm", "n_mentions", _hid(F.col("norm")).alias("hid"))
        .join(comp, "hid", "left")
        .select(
            "norm",
            "n_mentions",
            (-F.coalesce("component", F.col("hid"))).cast("long").alias(
                "nil_id"
            ),
        )
    )
    canon = (
        clustered.groupBy("nil_id")
        .agg(
            F.min(
                F.struct(
                    (-F.length("norm")).alias("negl"),
                    F.col("norm").alias("s"),
                )
            ).alias("b")
        )
        .select("nil_id", F.col("b.s").alias("canonical"))
    )
    return clustered.join(canon, "nil_id").select(
        F.col("norm").alias("surface_norm"),
        "nil_id",
        "canonical",
        "n_mentions",
    )


def disambiguate_by_context(
    mentions: DataFrame,
    candidates: DataFrame,
    priors: DataFrame | None = None,
    alpha: float = 0.6,
) -> DataFrame:
    """Context-aware entity disambiguation — the classic two-signal
    linker: ``score = alpha * P(entity | surface) + (1 - alpha) *
    sim(mention context, entity description)``, winner-take-all per
    mention. The step above :func:`alias_priors` (pure commonness) for
    surfaces like "jaguar" where the prior alone picks the car in a
    jungle story.

    Inputs: ``mentions`` (mention_id, surface_norm, context — the
    mention_contexts window text), ``candidates`` (surface_norm,
    entity_id, description — e.g. kg/ops/kgtrain.py
    entity_descriptions verbalizations), optional ``priors``
    (surface_norm, entity_id, prior). Context similarity is the
    bag-of-DISTINCT-words overlap cosine |A∩B| / sqrt(|A|·|B|) — exact
    integers under one sqrt/division, engine-bit-identical, 0 when
    either side is empty (then the prior decides alone). Ties break to
    the smallest entity_id. Returns one row per mention:
    (mention_id, surface_norm, entity_id, prior, ctx_sim, score).

    Scale shape: the candidate dim (surface -> entities × description
    words) broadcasts; the mention side never shuffles for the join and
    the per-mention argmax is a partial-aggregable max_by — no window
    over the corpus. Word-set algebra is JVM array functions on the
    already-joined rows.
    """
    if not 0.0 <= float(alpha) <= 1.0:
        raise ValueError("alpha must be in [0, 1]")

    def _wordset(col: Column) -> Column:
        return F.array_distinct(
            F.filter(
                F.split(F.lower(col), r"\s+"), lambda x: x != F.lit("")
            )
        )

    m = mentions.select(
        "mention_id",
        F.col("surface_norm"),
        _wordset(F.col("context")).alias("_ctx"),
    )
    c = candidates.select(
        "surface_norm",
        F.col("entity_id").cast("long").alias("entity_id"),
        _wordset(F.col("description")).alias("_desc"),
    )
    if priors is not None:
        c = c.join(
            priors.select(
                "surface_norm",
                F.col("entity_id").cast("long").alias("entity_id"),
                "prior",
            ),
            ["surface_norm", "entity_id"],
            "left",
        )
    else:
        c = c.withColumn("prior", F.lit(None).cast("double"))
    inter = F.size(F.array_intersect(F.col("_ctx"), F.col("_desc")))
    na, nb = F.size("_ctx"), F.size("_desc")
    sim = F.when(
        (na > 0) & (nb > 0),
        inter.cast("double")
        / F.sqrt(na.cast("double") * nb.cast("double")),
    ).otherwise(F.lit(0.0))
    scored = (
        m.join(F.broadcast(c), "surface_norm")
        .withColumn("_sim", sim)
        .withColumn(
            "_score",
            F.lit(float(alpha)) * F.coalesce("prior", F.lit(0.0))
            + F.lit(1.0 - float(alpha)) * F.col("_sim"),
        )
    )
    best = scored.groupBy("mention_id", "surface_norm").agg(
        F.max(
            F.struct(
                F.col("_score").alias("s"),
                (-F.col("entity_id")).alias("nid"),
                F.col("prior").alias("p"),
                F.col("_sim").alias("sim"),
            )
        ).alias("b")
    )
    return best.select(
        "mention_id",
        "surface_norm",
        (-F.col("b.nid")).cast("long").alias("entity_id"),
        F.col("b.p").alias("prior"),
        F.round(F.col("b.sim"), 9).alias("ctx_sim"),
        F.round(F.col("b.s"), 9).alias("score"),
    )
