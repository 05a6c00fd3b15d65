#!/usr/bin/env python
"""Round-5 scale rehearsal (VERDICT r4 item 6): run the CURATION/DEDUP
ladder — the rungs round 4 added or reworked — at ~1M pages with
PRODUCTION caps, and record per-stage walls plus direct evidence that
each new cap mechanism actually fired:

- gopher_rules -> remove_boilerplate_lines -> dedupe_paragraphs_global:
  walls + kept/dropped mass (all linear/one-shuffle shapes);
- remove_duplicate_substrings (the r4 reworked ExactSubstr gram path)
  at BOTH execution venues (JVM expression vs the r5 Arrow-batched
  pandas-UDF gram hasher) — same corpus, same k, walls for each and an
  output-equality assertion, extending BENCH/AB_TEXTOPS_r5.md to 1M
  pages;
- semdedup with the r5 max_cell count-then-filter cap: 1M synthetic
  embeddings engineered with a boilerplate MEGA-CELL (~80% of vectors
  collapse into one embedding-space cluster — the shape the r4 bucket
  census says real boilerplate produces), a cell census showing the cap
  dropping it, and the pair volume the cap averted.

Reuses the 1M-page corpus + extracted docs parquet from
BENCH/scale_rehearsal.py when present. Writes one JSON line;
BENCH/SCALE_r5.md is the human-readable report.

Usage: python BENCH/scale_rehearsal_r5.py [n_docs]  (default 1_000_000)
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
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# semdedup rehearsal knobs: k cells over dim-8 vectors, production-ish
# cap. ~80% of vectors land in ONE boilerplate cell (engineered; the r4
# census measured 21% of MinHash buckets hot at 1M pages with a 221k-doc
# max bucket, and embedding spaces collapse harder), the rest spread
# over distinct topic anchors.
SEM_K = 64
SEM_DIM = 8
# production cap at full scale; at smoke sizes the cap scales down so
# the engineered mega-cell is still OVER it (otherwise the smoke pays
# the uncapped |mega|^2 pair join + a 10^8-edge CC the cap exists to
# prevent — which is itself the point the rehearsal demonstrates)
SEM_MAX_CELL = 20_000 if N_DOCS >= 100_000 else max(N_DOCS // 4, 100)
SEM_SPREAD_FRAC = 0.05  # non-boilerplate fraction

# The boilerplate vectors are EXACTLY identical (no jitter): identical
# texts embed identically, and that is precisely the regime that makes
# a mega-cell — with jitter, data-drawn seeds land INSIDE the jitter
# ball and split the cluster into ~n/k subcells (observed in the 20k
# smoke: max cell 1487 of an engineered 16k cluster), i.e. proportional
# seeding self-equalizes fuzzy clusters; EXACT duplicates all tie to
# one argmax centroid no matter how many seeds duplicate it, which is
# why real boilerplate produces the mega-cells the cap exists for.


def wall(fn):
    t0 = time.monotonic()
    out = fn()
    return round(time.monotonic() - t0, 2), out


def main() -> int:
    sys.argv = sys.argv[:1]
    import BENCH.scale_rehearsal as r4

    r4.N_DOCS = N_DOCS
    corpus = r4.ensure_corpus()

    from kg.session import get_spark

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="kg-scale-rehearsal-r5",
        shuffle_partitions=CPUS * 4,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir("/tmp/kg_scale_ckpt")

    report: dict = {"n_docs": N_DOCS, "cpus": CPUS}

    docs_path = Path(
        "/tmp/kg_scale_docs.parquet"
        if N_DOCS == 1_000_000
        else f"/tmp/kg_scale_docs_{N_DOCS}.parquet"
    )
    if not (docs_path / "_SUCCESS").exists():
        from kg.stages.extract import extract_docs

        pages = spark.read.parquet(corpus).repartition(CPUS * 4)
        t, _ = wall(lambda: extract_docs(pages).write.mode("overwrite")
                    .parquet(str(docs_path)))
        report["extract_wall_s"] = t
    docs_x = spark.read.parquet(str(docs_path)).select(
        F.col("url").alias("doc_id"), "text"
    )

    # ---- gopher rule ladder: pure map, zero shuffle ----
    from kg.ops.textstats import (
        dedupe_paragraphs_global,
        gopher_rules,
        remove_boilerplate_lines,
    )

    def run_gopher():
        r = gopher_rules(docs_x).agg(
            F.count("*").alias("n"),
            F.sum(F.col("keep").cast("long")).alias("kept"),
        ).first()
        return int(r["n"]), int(r["kept"])

    t, (n, kept) = wall(run_gopher)
    report["gopher_wall_s"] = t
    report["gopher_n"], report["gopher_kept"] = n, kept

    # ---- corpus-wide line boilerplate removal ----
    def run_boiler():
        r = remove_boilerplate_lines(docs_x, min_docs=3).agg(
            F.count("*").alias("n"),
            F.sum("n_removed").alias("removed"),
            F.sum(F.length("clean_text")).alias("_b"),
        ).first()
        return int(r["n"]), int(r["removed"])

    t, (n, removed) = wall(run_boiler)
    report["boilerplate_wall_s"] = t
    report["boilerplate_lines_removed"] = removed

    # ---- cross-doc paragraph dedup (r4 rung, first run above sf0.1) ----
    def run_para():
        r = dedupe_paragraphs_global(docs_x).agg(
            F.count("*").alias("n"),
            F.sum("n_dropped").alias("dropped"),
            F.sum(F.length("text")).alias("_b"),
        ).first()
        return int(r["n"]), int(r["dropped"])

    t, (n, dropped) = wall(run_para)
    report["paragraph_global_wall_s"] = t
    report["paragraphs_dropped"] = dropped

    # ---- ExactSubstr removal, BOTH gram venues, same corpus ----
    from kg.ops.dedup import remove_duplicate_substrings

    def run_substr(arrow: bool):
        r = remove_duplicate_substrings(
            docs_x, k=8, arrow_grams=arrow
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.length("text_clean")).alias("bytes"),
            F.sum("n_removed").alias("removed"),
        ).first()
        return int(r["n"]), int(r["bytes"]), int(r["removed"])

    t, jvm_out = wall(lambda: run_substr(False))
    report["substr_jvm_wall_s"] = t
    t, arrow_out = wall(lambda: run_substr(True))
    report["substr_arrow_wall_s"] = t
    assert jvm_out == arrow_out, (jvm_out, arrow_out)
    report["substr_n_docs"], report["substr_bytes"], report[
        "substr_tokens_removed"
    ] = jvm_out

    # ---- semdedup with the r5 max_cell cap ----
    # Deterministic embeddings from the doc-id hash: ~80% collapse onto
    # one boilerplate anchor (+1e-3 jitter), the rest take one of
    # SEM_K-1 orthogonal-ish topic anchors (+ jitter). dim SEM_DIM.
    h = F.xxhash64("doc_id")
    spread = (F.pmod(h, F.lit(1000))
              < int(SEM_SPREAD_FRAC * 1000))
    topic = F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(SEM_K - 1)) + 1
    jit = lambda i: (  # noqa: E731
        F.pmod(F.xxhash64("doc_id", F.lit(100 + i)), F.lit(2001)) - 1000
    ).cast("double") / 1_000_000.0
    dims = [
        F.when(
            spread,
            F.when(F.pmod(topic, F.lit(SEM_DIM)) == i, 1.0)
            .otherwise(0.0)
            + (topic / F.lit(float(SEM_K))) * F.lit(0.1 * (i + 1))
            + jit(i),
        )
        .otherwise(F.lit(1.0) if i == 0 else F.lit(0.0))
        .alias(f"_d{i}")
        for i in range(SEM_DIM)
    ]
    emb = docs_x.select(h.alias("vec_id"), *dims).select(
        "vec_id", F.array(*[f"_d{i}" for i in range(SEM_DIM)]).alias(
            "embedding"
        )
    ).write.mode("overwrite").parquet("/tmp/kg_scale_emb.parquet")
    emb = spark.read.parquet("/tmp/kg_scale_emb.parquet")
    report["n_vectors"] = emb.count()

    from kg.ops.similarity import lloyd_kmeans, semdedup

    # cell census under the SAME quantizer semdedup will run (cap
    # forensics: what the count-then-filter drops and what it averts)
    assigned, _ = lloyd_kmeans(
        emb, k=SEM_K, rounds=2, id_col="vec_id", vec_col="embedding"
    )
    cells = assigned.groupBy("list_id").agg(F.count("*").alias("n"))
    cen = cells.agg(
        F.count("*").alias("n_cells"),
        F.sum(F.when(F.col("n") > SEM_MAX_CELL, 1).otherwise(0)).alias(
            "n_over_cap"
        ),
        F.sum(F.when(F.col("n") > SEM_MAX_CELL, F.col("n")).otherwise(0))
        .alias("capped_mass"),
        F.sum(
            F.when(
                F.col("n") > SEM_MAX_CELL, F.col("n") * F.col("n") / 2
            ).otherwise(0)
        ).alias("pairs_averted"),
        F.max("n").alias("max_cell_size"),
    ).first()
    report["semdedup_cells"] = {
        "k": SEM_K,
        "max_cell": SEM_MAX_CELL,
        "n_cells": int(cen.n_cells),
        "n_over_cap": int(cen.n_over_cap),
        "capped_mass": int(cen.capped_mass),
        "pairs_averted": int(cen.pairs_averted),
        "max_cell_size": int(cen.max_cell_size),
    }
    if (1 - SEM_SPREAD_FRAC) * N_DOCS > SEM_MAX_CELL:
        # full-scale run: the engineered mega-cell exceeds the cap, so
        # the rehearsal MUST observe the count-then-filter firing
        assert cen.n_over_cap >= 1, "cap did not fire at full scale"

    def run_sem():
        r = semdedup(
            emb, k=SEM_K, rounds=2, min_cos=0.999,
            max_cell=SEM_MAX_CELL,
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.col("is_dup").cast("long")).alias("dups"),
        ).first()
        return int(r["n"]), int(r["dups"])

    t, (n, dups) = wall(run_sem)
    report["semdedup_wall_s"] = t
    report["semdedup_n"], report["semdedup_dups"] = n, dups

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
