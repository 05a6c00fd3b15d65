#!/usr/bin/env python
"""sf1-class scale rehearsal (VERDICT r3 item 4): run the heavy chain
mentions -> link -> near_dup -> CC at ~1M pages (10x the per-round bench
corpus) with PRODUCTION caps, and record per-stage walls plus direct
evidence that each cap/skew mechanism actually triggered and what it cost:

- bucket-size capping (minhash_band_candidates max_bucket=64): count the
  dropped buckets + the row mass they held (the recall the cap trades for
  bounded candidate volume);
- explicit salting (kg/salt.py via link_triples use_salting): per-key
  histogram of the triple subjects before/after (skew_report), salted vs
  broadcast wall;
- AQE skew-join splitting: a CC-shaped hub join executed under AQE with
  the skew thresholds scaled DOWN proportionally to the corpus (defaults
  fire at 256MB partitions — the 100-TB operating point; at ~1M docs the
  same relative skew lives in ~MB partitions, so the rehearsal sets
  skewedPartitionThresholdInBytes/advisoryPartitionSizeInBytes low enough
  that the identical mechanism is observable), with the final adaptive
  plan grepped for the skew=true marker.

Writes one JSON line; BENCH/SCALE_r4.md is the human-readable report.

Usage: python BENCH/scale_rehearsal.py [n_docs]   (default 1_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CHUNK = 100_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _gen_chunk(args) -> str:
    i, n, path = args
    from kg import synth

    out = Path(path) / f"part_{i:03d}.parquet"
    if not out.exists():
        pdf = synth.gen_pages(n, seed=1000 + i, sentence_range=(12, 20))
        pdf.to_parquet(str(out), index=False)
    return str(out)


def ensure_corpus() -> str:
    """1M synthetic pages, generated once in 100k-page chunks (distinct
    seeds => distinct url hosts => globally unique urls; chunks generated
    in parallel processes) and reused."""
    path = Path(f"/tmp/kg_scale_corpus_{N_DOCS}")
    done = path / "_DONE"
    if done.exists():
        return str(path)
    path.mkdir(parents=True, exist_ok=True)
    from multiprocessing import Pool

    n_chunks = (N_DOCS + CHUNK - 1) // CHUNK
    jobs = [
        (i, min(CHUNK, N_DOCS - i * CHUNK), str(path))
        for i in range(n_chunks)
    ]
    with Pool(min(n_chunks, 10)) as pool:
        for j, _ in enumerate(pool.imap_unordered(_gen_chunk, jobs)):
            print(f"corpus chunk {j + 1}/{n_chunks} written",
                  file=sys.stderr)
    done.touch()
    return str(path)


def wall(fn):
    t0 = time.monotonic()
    out = fn()
    return round(time.monotonic() - t0, 2), out


def main() -> int:
    corpus = ensure_corpus()
    from kg.session import get_spark, materialize

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="kg-scale-rehearsal",
        shuffle_partitions=CPUS * 4,
        extra_conf={
            # scaled-down AQE skew thresholds (see module docstring): the
            # 256MB/64MB defaults are the 100-TB operating point; ~1/64
            # keeps the SAME relative-skew trigger observable at 1M docs
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "4MB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1MB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ckpt = "/tmp/kg_scale_ckpt"
    spark.sparkContext.setCheckpointDir(ckpt)  # production materialize path

    report: dict = {"n_docs": N_DOCS, "cpus": CPUS}

    pages = spark.read.parquet(corpus).repartition(CPUS * 4)
    from kg.stages.extract import extract_docs

    t, _ = wall(lambda: extract_docs(pages).write.mode("overwrite")
                 .parquet("/tmp/kg_scale_docs.parquet"))
    report["extract_wall_s"] = t
    docs = spark.read.parquet("/tmp/kg_scale_docs.parquet")
    docs_x = docs.select(F.col("url").alias("doc_id"), "text")

    # ---- mentions (production path: hoisted gazetteer plan,
    # co-partitioned corpus) ----
    from kg import synth
    from kg.stages.mentions import (
        detect_mentions, gazetteer_dim, plan_gazetteer, regex_dim,
    )

    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    rx = regex_dim(spark, synth.REGEX_DATA)
    gplan = plan_gazetteer(gaz)

    def run_mentions():
        return detect_mentions(
            docs_x, gaz, rx, id_col="doc_id", plan=gplan, co_partition=True
        ).count()

    t, n = wall(run_mentions)
    report["mentions_wall_s"], report["n_mentions"] = t, n

    # ---- triples + link (broadcast vs salted; skew_report pre-flight) ----
    from kg.ops.profile import skew_report
    from kg.stages.link import link_triples
    from kg.stages.triples import extract_triples_from_pages

    t, _ = wall(lambda: extract_triples_from_pages(pages).write
                 .mode("overwrite").parquet("/tmp/kg_scale_triples.parquet"))
    report["triples_wall_s"] = t
    triples = spark.read.parquet("/tmp/kg_scale_triples.parquet")
    report["n_triples"] = triples.count()

    sk = skew_report(triples, "subj", top_k=3).collect()
    report["subj_skew"] = [
        {"key": r.key, "n": r.n_rows, "share": r.share,
         "skew_factor": r.skew_factor, "suggested_salt": r.suggested_salt}
        for r in sk
    ]

    alias_dim = spark.createDataFrame(synth.alias_df())

    def force(df):
        return df.agg(
            F.count("*").alias("n"), F.sum("subj_id").alias("_a"),
            F.sum(F.length("subj_canonical")).alias("_c"),
        ).first()["n"]

    t, n = wall(lambda: force(link_triples(triples, alias_dim)))
    report["link_broadcast_wall_s"], report["n_linked"] = t, n
    t, n2 = wall(lambda: force(
        link_triples(triples, alias_dim, use_salting=True, n_salts=8)))
    report["link_salted_wall_s"] = t
    assert n == n2, "salted != broadcast"

    # ---- near_dup with PRODUCTION caps + cap instrumentation ----
    from kg.ops.dedup import (
        _words, minhash_band_candidates, minhash_near_dup,
        minhash_signatures,
    )

    docs_h = docs_x.select(F.xxhash64("doc_id").alias("doc_id"), "text")

    t, n = wall(lambda: minhash_near_dup(
        docs_h, min_jaccard=0.8, max_bucket=64).count())
    report["near_dup_wall_s"], report["n_near_dup_rows"] = t, n

    # cap forensics: replay the band-bucket table and measure what the
    # cap dropped (the production run above used the same knobs)
    toks = docs_h.select(
        "doc_id",
        F.array_sort(F.array_distinct(_words())).alias("tokset"),
    ).where(F.size("tokset") > 0)
    sigs = materialize(minhash_signatures(toks, "doc_id", "tokset", 64))
    from kg.ops.dedup import _band_key_structs

    buckets = sigs.select(
        "_id", F.explode(_band_key_structs(64, 16)).alias("bk")
    ).select("_id", "bk.band", "bk.bkey")
    sizes = buckets.groupBy("band", "bkey").agg(F.count("*").alias("n"))
    capstats = sizes.agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.when(F.col("n") > 64, 1).otherwise(0)).alias("n_dropped"),
        F.sum(F.when(F.col("n") > 64, F.col("n")).otherwise(0)).alias(
            "dropped_mass"),
        F.max("n").alias("max_bucket_size"),
    ).first()
    report["cap"] = {
        "n_buckets": capstats.n_buckets,
        "n_dropped_buckets": int(capstats.n_dropped),
        "dropped_row_mass": int(capstats.dropped_mass),
        "max_bucket_size": int(capstats.max_bucket_size),
    }

    # candidate volume under the cap (what the verify ladder then paid)
    cands = materialize(minhash_band_candidates(
        toks, k=64, bands=16, max_bucket=64, signatures=sigs))
    t, n = wall(cands.count)
    report["candidates_wall_s"], report["n_candidates"] = t, n

    # ---- CC on the verified near-dup edge graph, forced distributed ----
    from kg.cc import connected_components
    from kg.ops.dedup import jaccard_verified_edges

    edges = materialize(
        jaccard_verified_edges(
            toks, cands, min_jaccard=0.8, signatures=sigs, est_margin=0.3,
        ).select("src", "dst")
    )
    report["n_edges"] = edges.count()
    t, n = wall(lambda: connected_components(
        edges, local_threshold=0).count())
    report["cc_wall_s"], report["n_cc_nodes"] = t, n

    # ---- AQE skew-split evidence: the triple stream joined on its
    # HOT-SUBJECT key (three subjects carry ~12% of 6.4M rows each — the
    # skew_report above) against a per-subject dim, with the broadcast
    # path suppressed (merge hint) so the join actually shuffles on the
    # skewed key, under AQE with scaled thresholds; the final adaptive
    # plan carries skew=true on the sort-merge join when the split
    # fired. Three lessons kept for honesty (each cost a failed
    # attempt): (1) the first cut used the verified near-dup edge
    # graph — at 1.9k edges nothing can skew; (2) AQE's skew detector
    # reads COMPRESSED map-output bytes, and a hot partition of 781k
    # identical subject strings lz4-compresses to near-nothing (plus
    # Catalyst prunes unused payload columns), so the join must carry
    # an incompressible per-row payload — here an md5 provenance token
    # standing in for the embeddings/snippets real pipelines drag
    # through such joins — and the aggregate must consume it or pruning
    # removes it again; (3) OptimizeSkewedJoin pattern-matches
    # SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) — a dim built by an
    # in-plan aggregation leaves a HashAggregate between Sort and the
    # shuffle stage and silently disables the rewrite, so the dim is
    # WRITTEN and re-read (the realistic shape anyway: dictionaries are
    # stored tables).
    triples.groupBy("subj").agg(F.count("*").alias("subj_n")).write.mode(
        "overwrite").parquet("/tmp/kg_scale_subj_dim.parquet")
    subj_dim = spark.read.parquet("/tmp/kg_scale_subj_dim.parquet")
    skew_join = (
        triples.select("subj", F.md5("url").alias("prov"))
        .join(subj_dim.hint("merge"), "subj")
        .groupBy("subj_n").agg(
            F.count("*").alias("n"),
            F.sum(F.length("prov")).alias("_p"),
        )
    )
    rows = skew_join.collect()
    plan = skew_join._jdf.queryExecution().executedPlan().toString()
    report["aqe_skew_join_fired"] = "skew=true" in plan
    report["aqe_skew_plan_excerpt"] = next(
        (ln.strip() for ln in plan.splitlines() if "skew=true" in ln), "")
    report["n_skew_groups"] = len(rows)

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
