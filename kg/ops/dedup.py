"""Deduplication operators: exact, sorted-shingle signature, MinHash-LSH,
SimHash, and n-gram Jaccard — the standard near-dup ladder for pre-training
corpora (exact -> cheap signature -> probabilistic blocking -> verify).

Scale shapes:
- exact/shingle/simhash-band dedup: one partial-aggregated groupBy each.
- MinHash near-dup: built-in pyspark.ml MinHashLSH banding join, then
  connected components (kg/cc.py) so transitive duplicate chains collapse
  into one cluster (pairwise-only dedup leaves A~B~C split).
- SimHash: Arrow-batched pandas UDF (numpy bit math; no JVM equivalent),
  then JVM-side band grouping for candidate pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kg.cc import connected_components


def _norm_text(col: str = "text") -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def _words(col: str = "text") -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != F.lit(""))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (after whitespace/case normalization) docs:
    (text_hash, n_docs, keep_id). keep_id = min id, the canonical survivor."""
    return (
        docs.select(F.col(id_col), F.md5(_norm_text()).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def shingle_signature_dedup(
    docs: DataFrame, id_col: str = "doc_id", k: int = 3, sig_size: int = 8
) -> DataFrame:
    """Sorted-shingle signature: md5 over the first ``sig_size`` sorted
    distinct k-word shingles. Near-dup docs sharing their rare shingles
    collide; cheap one-shuffle alternative to MinHash for coarse dedup.
    Output: (doc_id, shingle_sig)."""
    words = _words()
    shingles = F.array_sort(
        F.array_distinct(
            F.when(F.size(words) >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size(words) - k),
                    lambda i: F.array_join(F.slice(words, i + 1, k), " "),
                )
            ).otherwise(F.array(F.array_join(words, " ")))
        )
    )
    sig = F.md5(F.array_join(F.slice(shingles, 1, sig_size), ""))
    return docs.select(F.col(id_col), sig.alias("shingle_sig"))


def minhash_near_dup(
    docs: DataFrame,
    id_col: str = "doc_id",
    min_jaccard: float = 0.5,
    num_hash_tables: int = 6,
    num_features: int = 1 << 18,
) -> DataFrame:
    """MinHash-LSH near-duplicate clustering over word-token sets.

    (doc_id, component, keep_id): docs sharing a component are near-dups;
    keep_id is the cluster survivor (min doc_id). Transitive closure via
    connected components, not just pairs.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    toks = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       _words().alias("tokens")).where(F.size("tokens") > 0)
    tf = HashingTF(inputCol="tokens", outputCol="features",
                   numFeatures=num_features, binary=True)
    feats = tf.transform(toks)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=num_hash_tables, seed=7)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, threshold=1.0 - min_jaccard + 1e-9, distCol="d"
    )
    edges = (
        pairs.select(F.col("datasetA.doc_id").alias("src"),
                     F.col("datasetB.doc_id").alias("dst"))
        .where(F.col("src") < F.col("dst"))
        .distinct()
    )
    comps = connected_components(edges)
    all_docs = toks.select("doc_id")
    membered = all_docs.join(comps, all_docs.doc_id == comps.node, "left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )
    keep = membered.groupBy("component").agg(F.min("doc_id").alias("keep_id"))
    return membered.join(keep, "component").select("doc_id", "component", "keep_id")


# ---- SimHash ----

SIMHASH_SCHEMA = "doc_id long, simhash long"


def _simhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    import numpy as np

    def words_of(t: str) -> list[str]:
        return (t or "").lower().split()

    def h64(w: str) -> int:
        return int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")

    for pdf in batches:
        out = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            ws = words_of(text)
            if not ws:
                out.append((int(doc_id), 0))
                continue
            hs = np.array([h64(w) for w in set(ws)], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                np.int32
            )
            votes = (2 * bits - 1).sum(axis=0)
            sim = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sim |= np.uint64(1) << np.uint64(b)
            out.append((int(doc_id), int(sim.astype(np.int64))))
        yield pd.DataFrame(out, columns=["doc_id", "simhash"])


def simhash(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc (md5-based word hashes; deterministic across
    runs and partitionings). Arrow-batched pandas UDF — bit-vote math has no
    reasonable JVM-builtin expression."""
    src = docs.select(F.col(id_col).cast("long").alias("doc_id"), "text")
    return src.mapInPandas(_simhash_batches, schema=SIMHASH_SCHEMA)


def simhash_band_candidates(sim: DataFrame, n_bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any 16-bit SimHash band
    (Hamming-distance blocking). Output: (a, b) with a < b."""
    width = 64 // n_bands
    bands = sim.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("key"),
                )
                for i in range(n_bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    k: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact k-gram Jaccard verification over candidate pairs (a, b):
    the verify half of blocking+verify near-dup. JVM-side set algebra."""
    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), _words().alias("_w")
    )
    w = F.col("_w")
    grams = src.select(
        "doc_id",
        F.when(
            F.size(w) >= k,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - k),
                    lambda i: F.array_join(F.slice(w, i + 1, k), " "),
                )
            ),
        ).otherwise(F.array(F.array_join(w, " "))).alias("grams"),
    )
    a = grams.select(F.col("doc_id").alias("a"), F.col("grams").alias("grams_a"))
    b = grams.select(F.col("doc_id").alias("b"), F.col("grams").alias("grams_b"))
    joined = candidates.join(a, "a").join(b, "b")
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size("grams_a") + F.size("grams_b") - inter
    jac = F.round(inter / F.greatest(union, F.lit(1)), 4)
    return (
        joined.select("a", "b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= min_jaccard)
    )
