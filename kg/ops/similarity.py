"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline. The dot product is a JVM-side
  ``aggregate(zip_with(...))`` — no Python in the scoring loop; the pair
  space is bounded by broadcasting the (small) query side.
- LSH-bucketed ANN: the scale path — built-in BucketedRandomProjectionLSH
  (random hyperplane projection ≈ cosine on L2-normalized vectors) blocks
  the pair space, then the same exact cosine re-ranks within buckets.

At 10^9+ vectors the brute-force path is only for query batches (broadcast
side stays small); the LSH path's shuffle is the bucket join, sized by
bucketLength/numHashTables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "cosine_topk_bruteforce",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_cosine_near_dup",
    "dot_product_col",
]


def dot_product_col(a: str | Column, b: str | Column) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_col(a: str | Column) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(ca, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    k: int = 5,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    (query_id, neighbor_id, rank). query side = rows passing query_filter
    (default: all — quadratic; pass a filter at scale). Ties break on
    neighbor id ascending, deterministic.
    """
    base = embeddings.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec")
    ).withColumn("nnorm", _norm_col("nvec"))
    q = embeddings.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    if query_filter is not None:
        q = q.where(query_filter)
    q = q.withColumn("qnorm", _norm_col("qvec"))
    pairs = F.broadcast(q).crossJoin(base).where(F.col("qid") != F.col("nid"))
    scored = pairs.withColumn(
        "cos",
        dot_product_col("qvec", "nvec")
        / (F.col("qnorm") * F.col("nnorm")),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "rank",
        )
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    dist_threshold: float = 1.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via BucketedRandomProjectionLSH over L2-normalized
    vectors (euclidean distance on the unit sphere is monotone in cosine:
    d^2 = 2 - 2cos). Output: (query_id, neighbor_id, rank) — same shape as
    the brute-force baseline so recall is directly measurable.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        F.col(id_col).cast("long").alias("vid"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("raw"),
    )
    vecs = Normalizer(inputCol="raw", outputCol="nvec", p=2.0).transform(vecs)
    lsh = BucketedRandomProjectionLSH(
        inputCol="nvec",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=13,
    )
    model = lsh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, dist_threshold, distCol="euc")
    scored = pairs.select(
        F.col("datasetA.vid").alias("query_id"),
        F.col("datasetB.vid").alias("neighbor_id"),
        # cos = 1 - d^2/2 on unit vectors
        (F.lit(1.0) - F.col("euc") * F.col("euc") / F.lit(2.0)).alias("cos"),
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ann_ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer partitions the
    vectors into ``n_lists`` cells; each query probes its ``n_probe``
    nearest cells and exact-cosine re-ranks only those candidates.

    The scale story vs LSH: the candidate set per query is
    ~n_probe/n_lists of the corpus, tunable independently of recall via
    n_probe; the cell assignment is one KMeans fit (sampled at very large N)
    + one transform, and the probe join shuffles by list_id — co-partitioned
    with the inverted lists. Centroids are driver-collected (n_lists rows)
    and broadcast.

    Output: (query_id, neighbor_id, rank) — same shape as the brute-force
    baseline so recall is directly measurable.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = embeddings.select(
        F.col(id_col).cast("long").alias("vid"),
        F.col(vec_col).cast("array<double>").alias("arr"),
    ).withColumn("nrm", _norm_col("arr")).where(F.col("nrm") > 0)
    unit = base.withColumn(
        "unit", F.transform("arr", lambda x: x / F.col("nrm"))
    ).select("vid", "unit")
    feats = unit.withColumn("fv", array_to_vector("unit"))
    model = KMeans(
        k=n_lists, seed=11, featuresCol="fv", predictionCol="list_id"
    ).fit(feats)
    assigned = model.transform(feats).select("vid", "unit", "list_id")

    spark = embeddings.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "probe_list int, centroid array<double>",
    )
    q = assigned.select(
        F.col("vid").alias("qid"), F.col("unit").alias("qunit"), "list_id"
    )
    if query_filter is not None:
        q = q.where(query_filter)
    # probe ranking: nearest centroids by dot product with the unit query
    # (monotone in euclidean distance on the sphere)
    probed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cdot", dot_product_col("qunit", "centroid"))
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.desc("cdot"), F.asc("probe_list")
                )
            ),
        )
        .where(F.col("probe_rank") <= n_probe)
        .select("qid", "qunit", F.col("probe_list").alias("list_id"))
    )
    cands = probed.join(assigned, "list_id").where(F.col("qid") != F.col("vid"))
    scored = cands.withColumn("cos", dot_product_col("qunit", "unit"))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            "rank",
        )
    )


def embedding_cosine_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate clustering: vectors whose cosine
    similarity reaches ``threshold`` become edges; transitive closure via
    connected components (kg/cc.py) yields (vec_id, component) for EVERY
    input vector (singletons are their own component).

    ``candidates``: optional (src, dst) pair table to score — at scale pass
    LSH-blocked pairs (ann_lsh_topk's join) so the pair space is bounded;
    the default exact all-pairs self-join is the small/bounded-input path.
    """
    from kg.cc import connected_components

    base = embeddings.select(
        F.col(id_col).cast("long").alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("nrm", _norm_col("vec"))
    a = base.select(
        F.col("vid").alias("src"), F.col("vec").alias("va"), F.col("nrm").alias("na")
    )
    b = base.select(
        F.col("vid").alias("dst"), F.col("vec").alias("vb"), F.col("nrm").alias("nb")
    )
    if candidates is None:
        pairs = a.crossJoin(b).where(F.col("src") < F.col("dst"))
    else:
        pairs = candidates.join(a, "src").join(b, "dst")
    edges = pairs.where(
        dot_product_col("va", "vb") / (F.col("na") * F.col("nb"))
        >= F.lit(float(threshold))
    ).select("src", "dst")
    comps = connected_components(edges)
    return base.join(comps, base.vid == comps.node, "left").select(
        F.col("vid").alias(id_col),
        F.coalesce("component", F.col("vid")).alias("component"),
    )


def embedding_stats(embeddings: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", label_col: str = "label") -> DataFrame:
    """Per-label embedding diagnostics: count, mean L2 norm (rounded)."""
    norms = embeddings.select(
        F.col(label_col).alias("label"), _norm_col(vec_col).alias("nrm")
    )
    return (
        norms.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
        )
        .orderBy("label")
    )
