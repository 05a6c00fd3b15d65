"""Stage 5: canonicalization — MinHash-LSH blocking + connected components.

Groups alias surfaces that denote the same entity:

  aliases --tokenize--> word-token sets
          --HashingTF(binary) + MinHashLSH.approxSimilarityJoin--> candidate
               pairs with exact Jaccard distance (LSH only *blocks*; the
               reported distance is exact, so the threshold is a real
               Jaccard gate, not an approximation)
          --filter distance <= 1 - min_jaccard--> edges
          --connected_components (kg/cc.py)--> component per alias
          --max_by(length, lexicographic)--> canonical surface per component

Scale notes:
- MinHashLSH is the built-in pyspark.ml.feature implementation — the
  shuffle-heavy part (band bucketing + within-bucket join) is JVM-side.
- node ids are xxhash64(alias_norm) — stable across runs, no driver-side
  id assignment.
- the alias universe is dim-sized (millions), not corpus-sized; the corpus
  only contributes NEW surfaces via distinct(), which partial-aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg.cc import connected_components

__all__ = ["canonicalize_aliases"]


def canonicalize_aliases(
    aliases: DataFrame,
    min_jaccard: float = 0.30,
    num_hash_tables: int = 5,
    num_features: int = 1 << 18,
) -> DataFrame:
    """aliases(alias, alias_norm) -> (entity_id, canonical, aliases, n_aliases).

    entity_id is the component id (min xxhash64 over member alias_norms —
    deterministic). canonical = longest alias_norm's surface, ties broken by
    the lexicographically greatest surface (deterministic).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

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
    uniq = uniq.localCheckpoint(eager=True)  # reused 4x below; cut lineage once

    tf = HashingTF(
        inputCol="tokens", outputCol="features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(uniq)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, threshold=1.0 - min_jaccard + 1e-9, distCol="jaccard_dist"
    )
    edges = (
        pairs.select(
            F.col("datasetA.node").alias("src"), F.col("datasetB.node").alias("dst")
        )
        .where(F.col("src") < F.col("dst"))
        .distinct()
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
