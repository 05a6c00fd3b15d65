"""Physical-plan assertions for the round-2 operators — the plan-shape
contract PLANS.md documents, enforced so regressions surface in CI rather
than at 100 TB. (The mentions broadcast/no-Python assertions live in
tests/test_mentions_spark.py.)"""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_sign_bands_single_arrow_pass_no_shuffle(spark, embeddings):
    from kg.ops.similarity import sign_bands

    p = _plan(sign_bands(embeddings, n_bits=2, n_bands=8))
    assert p.count("MapInPandas") == 1  # one Arrow projection pass
    assert "Exchange" not in p  # embarrassingly parallel
    # column pruning reaches the scan: only id + vector are read
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>>" in p


def test_cosine_band_candidates_no_cartesian(spark, embeddings):
    from kg.ops.similarity import cosine_band_candidates

    p = _plan(cosine_band_candidates(embeddings, n_bits=2, n_bands=8))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the bucket self-join is an equi-join on (band, key)
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_minhash_candidates_all_jvm_no_cartesian(spark):
    from pyspark.sql import functions as F

    from kg.ops.dedup import _words, minhash_band_candidates

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(
        F.col("doc_id").alias("doc_id"),
        F.array_sort(F.array_distinct(_words())).alias("tokset"),
    ).where(F.size("tokset") > 0)
    p = _plan(minhash_band_candidates(toks, k=16, bands=4))
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in p, node


def test_incremental_probe_all_jvm_equi_join_no_cartesian(spark):
    """The batch-vs-index probe must stay an equi hash join on
    (band, bkey) with no Python and no nested-loop path — the index side
    is the whole accepted corpus at scale."""
    from pyspark.sql import functions as F

    from kg.ops.dedup import incremental_near_dup, minhash_index_build

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    index = minhash_index_build(docs.where(F.col("doc_id") % 4 != 0))
    out = incremental_near_dup(
        docs.where(F.col("doc_id") % 4 == 0), index, min_jaccard=0.8
    )
    p = _plan(out)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in p, node


def test_nonbroadcast_mentions_plan_uses_shuffle_join(spark):
    from kg import synth
    from kg.stages.mentions import detect_mentions, gazetteer_dim

    docs = spark.createDataFrame(
        [("u1", "carrot cake and coffee")], "url string, text string"
    )
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    p = _plan(detect_mentions(docs, gaz, None, share_scan=False,
                              broadcast_dim=False))
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p


def test_simhash_band_candidates_capped_no_blowup_path(spark):
    """The simhash blocker joins only cap-filtered buckets (same guard as
    its minhash/cosine siblings): equi-join on (band, key), no cartesian,
    and the bucket-size filter is present in the plan."""
    sim = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 9)], "doc_id long, simhash long"
    )
    from kg.ops.dedup import simhash_band_candidates

    df = simhash_band_candidates(sim, n_bands=4, max_bucket=64)
    p = _plan(df)
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in p, node
    assert "HashJoin" in p or "SortMergeJoin" in p
    # the count-then-filter cap gate feeds the join
    assert "count(1)" in p and "<= 64" in p


def test_bm25_prunes_postings_before_any_exchange(spark):
    """The query-term literal filter must sit BELOW the first shuffle so a
    query's cost tracks its terms' posting lists, not the corpus (the
    PLANS.md bm25 shape), and both stats joins must broadcast."""
    from kg.ops.ranking import bm25_search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = _plan(bm25_search(docs, ["alpha", "beta"], top_n=5))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    # walk the tree: every term IN (...) filter appears under an Exchange
    # (deeper in the printed tree), i.e. the filter line index is after
    # the first Exchange line in at least one scan subtree — assert the
    # cheap invariant: a Filter mentioning the literal terms exists, and
    # no Exchange appears below it in its own subtree printout
    lines = p.splitlines()
    fidx = [i for i, ln in enumerate(lines) if "alpha" in ln and "Filter" in ln]
    assert fidx, "literal term filter missing from the plan"

    def marker_col(ln: str) -> int:
        return max(ln.find("+- "), ln.find("*("), 0)

    # within the filter's OWN subtree (deeper-indented following lines),
    # there must be a parquet scan and no Exchange: the filter feeds the
    # scan directly, under every shuffle
    for i in fidx:
        depth = marker_col(lines[i])
        subtree = []
        for ln in lines[i + 1:]:
            if marker_col(ln) <= depth:
                break
            subtree.append(ln)
        assert any("Scan parquet" in ln or "FileScan" in ln
                   for ln in subtree), "\n".join(subtree)
        assert not any("Exchange" in ln for ln in subtree), (
            "term filter floated above a shuffle:\n" + "\n".join(subtree)
        )


def test_tfidf_df_join_broadcasts(spark):
    from kg.ops.ranking import tfidf_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = _plan(tfidf_topk(docs, k=3))
    assert "BroadcastHashJoin" in p


def test_time_rollup_single_corpus_shuffle(spark):
    """The raw table is shuffled once (finest grain); coarser grains
    re-aggregate the materialized finer aggregate."""
    from pyspark.sql import functions as F

    from kg.ops.temporal import time_rollup

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rolled = time_rollup(events, dims=["event_type"], grains=("hour", "day"))
    p = _plan(rolled)
    # the day branch reads the hour materialization (localCheckpoint),
    # never the parquet source: exactly the hour branch's scan remains
    assert p.count("Scan parquet") <= 1


def test_asof_join_exactly_one_shuffle(spark):
    """The union+window merge-asof must co-shuffle both inputs ONCE on the
    key — a second exchange or a join node means the shape regressed to a
    range-probe join."""
    from pyspark.sql import functions as F

    from kg.ops.temporal import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id")
    right = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value")
    p = _plan(asof_join(left, right, keys=["user_id"], right_cols=["value"]))
    assert p.count("Exchange") == 1
    assert "Join" not in p  # union+window, not a join


def test_graph_table_partition_pruning(spark, tmp_path):
    """The materialized graph is partitioned by (pred, url_hash_bucket);
    a predicate on pred must prune at the scan (PartitionFilters), so a
    single-relation query touches one partition directory, not the
    corpus."""
    from pyspark.sql import functions as F

    rows = [(p, b, i) for i, (p, b) in enumerate(
        [("born_in", 0), ("born_in", 1), ("works_at", 0), ("ceo_of", 1)]
    )]
    df = spark.createDataFrame(rows, "pred string, url_hash_bucket int, x long")
    out = str(tmp_path / "graph")
    df.write.partitionBy("pred", "url_hash_bucket").parquet(out)

    plan = _plan(
        spark.read.parquet(out).where(F.col("pred") == "born_in")
    )
    assert "PartitionFilters: [isnotnull(pred" in plan or \
        "PartitionFilters: [pred" in plan or "(pred" in plan.split(
            "PartitionFilters:")[1].split("]")[0]
    # and nothing of the filter leaks into the row-level data filters
    assert "PushedFilters: []" in plan


def test_jaccard_join_exact_no_cartesian_all_jvm(spark):
    """The prefix-filter similarity join must stay an equi-join plan:
    no cartesian/nested-loop node anywhere, no Python eval in the path."""
    from kg.ops.dedup import jaccard_join_exact

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = _plan(jaccard_join_exact(docs, min_jaccard=0.8))
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in p, node


def test_link_graph_pure_map_plus_one_partial_agged_shuffle(spark):
    from kg.ops.weblinks import host_link_graph

    pages = spark.read.parquet("fixtures/pages_tiny.parquet")
    p = _plan(host_link_graph(pages))
    # extraction is all JVM expressions: no Python workers anywhere
    assert "BatchEvalPython" not in p and "MapInPandas" not in p
    # exactly the distinct-agg expand shuffle pair; no join at all
    assert "Join" not in p
    assert "partial_count" in p  # map-side combine before the exchange
    # column pruning reaches the scan: url + html only
    assert "ReadSchema: struct<url:string,html:binary>" in p


@pytest.fixture(scope="module")
def documents_sf(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_chunk_documents_pure_narrow_map(spark, documents_sf):
    from kg.ops.curation import chunk_documents

    p = _plan(chunk_documents(documents_sf, chunk_len=16, overlap=4))
    assert "Exchange" not in p  # embarrassingly parallel
    assert "MapInPandas" not in p and "EvalPython" not in p  # all JVM
    # column pruning reaches the scan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_train_split_and_quantize_no_shuffle_no_python(
    spark, documents_sf, embeddings
):
    from kg.ops.curation import train_val_test_split
    from kg.ops.similarity import quantize_embeddings

    for df, schema in (
        (train_val_test_split(documents_sf), "struct<doc_id:bigint>"),
        (
            quantize_embeddings(embeddings),
            "struct<vec_id:bigint,embedding:array<float>>",
        ),
    ):
        p = _plan(df)
        assert "Exchange" not in p
        assert "MapInPandas" not in p and "EvalPython" not in p
        assert f"ReadSchema: {schema}" in p


def test_pack_sequences_single_shuffle(spark, documents_sf):
    from kg.ops.curation import pack_sequences

    p = _plan(pack_sequences(documents_sf, seq_len=64, n_shards=4))
    # exactly the window-by-shard exchange; the cumsum itself is one
    # Window over the sharded layout
    assert p.count("Exchange") == 1
    assert p.count("Window") == 1


def test_mixture_weights_corpus_never_shuffles_for_join(spark, documents_sf):
    from kg.ops.curation import mixture_weights

    p = _plan(mixture_weights(documents_sf, {"en": 0.6, "de": 0.4}))
    # per-group factors come back onto the corpus via broadcast, never a
    # corpus-sized sort-merge join; the only exchanges feed the tiny
    # (partial-agged) totals/grand-total aggregations
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_keep_best_per_cluster_no_window(spark):
    from pyspark.sql import functions as F

    from kg.ops.dedup import keep_best_per_cluster

    assign = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).alias("component"))
    scores = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("double").alias("quality"))
    p = _plan(keep_best_per_cluster(assign, scores))
    # argmax is a partial-aggregable struct max: a mega-cluster combines
    # map-side instead of serializing through one window partition
    assert "Window" not in p
    assert "partial_max" in p or "HashAggregate" in p


def test_fact_evidence_two_exchanges_no_join(spark):
    """fact_evidence is a pre-agg on (fact, url) + one fact-key exchange
    whose partitioning the window AND the final agg both reuse: exactly
    two Exchange nodes, no Join, no Python."""
    import datetime as dt

    from pyspark.sql import functions as F

    from kg.graphstats import fact_evidence

    t0 = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("u1", "A", "p", "B", 1, 2, t0)],
        "url string, subj string, pred string, obj string, "
        "subj_id long, obj_id long, warc_ts timestamp",
    )
    p = _plan(fact_evidence(df))
    assert p.count("Exchange") == 2
    assert "Join" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p


def test_fact_confidence_single_exchange_no_window(spark):
    """Noisy-or in log space is a plain partial-aggregable SUM: one
    Exchange, no Window, no Join, no Python."""
    from kg.reason import fact_confidence

    ev = spark.createDataFrame(
        [("u1", 1, "p", 2, 0.5)],
        "url string, subj_id long, pred string, obj_id long, conf double",
    )
    p = _plan(fact_confidence(ev))
    assert p.count("Exchange") == 1
    assert "Window" not in p and "Join" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p


def test_induce_entity_types_broadcasts_rules(spark):
    """The rules dim joins broadcast; the only exchanges key on the
    entity (vote agg + window argmax)."""
    from kg.reason import induce_entity_types

    linked = spark.createDataFrame(
        [("u1", "works_for", 1, 2)],
        "url string, pred string, subj_id long, obj_id long",
    )
    rules = spark.createDataFrame(
        [("works_for", "subj", "PERSON"), ("works_for", "obj", "ORG")],
        "pred string, role string, etype string",
    )
    p = _plan(induce_entity_types(linked, rules))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_quality_prune_single_exchange(spark):
    """Both windows (rank + group count) share one group-key exchange;
    no join, no Python."""
    from kg.ops.curation import quality_prune

    df = spark.createDataFrame(
        [(1, "a", 0.5)], "doc_id long, source string, quality double"
    )
    p = _plan(quality_prune(df))
    assert p.count("Exchange") == 1
    assert "Join" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p


def test_kmv_overlap_sketch_sized_join_only(spark):
    """The only join is the 1-row x 1-row sketch cross join; per-side
    aggregations are partial-aggregated collects, no Python."""
    from kg.ops.sketch import kmv_overlap

    a = spark.range(10).selectExpr("cast(id as string) as v")
    b = spark.range(10).selectExpr("cast(id as string) as v")
    p = _plan(kmv_overlap(a, b, "v", k=8))
    assert p.count("Join") == 1  # the sketch pair join, nothing else
    assert "InPandas" not in p and "BatchEvalPython" not in p


def test_remove_boilerplate_all_jvm_no_window_no_cartesian(spark, documents_sf):
    from kg.ops.textstats import remove_boilerplate_lines

    p = _plan(remove_boilerplate_lines(documents_sf, min_docs=3))
    # pure column expressions end to end: no Python, no window, and the
    # frequency/membership/reassembly aggregations all partial-aggregate
    assert "MapInPandas" not in p and "BatchEvalPython" not in p
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "partial_count" in p  # map-side combine on the df groupBy


def test_link_prediction_equi_joins_only(spark):
    from kg.graphstats import link_prediction_scores

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 23) for i in range(60)], "src long, dst long"
    )
    p = _plan(link_prediction_scores(edges))
    # wedge join, anti-join, and degree joins are all equi-joins; the
    # (u, v) score aggregation partial-aggregates before its exchange
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "partial_count" in p


def test_url_templates_pure_map_plus_one_partial_agged_shuffle(spark):
    from kg.ops.webnorm import url_templates

    urls = spark.createDataFrame(
        [(f"https://h{i % 3}.test/p/{i}",) for i in range(50)],
        "url string",
    )
    p = _plan(url_templates(urls))
    # template derivation is JVM expressions — no Python anywhere
    assert "MapInPandas" not in p and "BatchEvalPython" not in p
    # count(DISTINCT url) compiles to two-phase aggregation: at most the
    # distinct-expand exchange plus the final group exchange, with a
    # partial aggregate before the first shuffle (map-side collapse)
    assert p.count("Exchange") <= 2
    # map-side collapse exists at both levels (per-url dedup + rollup)
    assert "partial_count" in p and "partial_min" in p


def test_harmonic_round_is_one_shuffle_join_plus_anti(spark):
    from pyspark.sql import functions as F

    from kg.graphstats import harmonic_centrality

    edges = spark.createDataFrame(
        [(i, (i + 1) % 20) for i in range(20)], "src long, dst long"
    )
    out = harmonic_centrality(edges, n_landmarks=2, rounds=2)
    p = _plan(out)
    # all relational — no Python, no cartesian blowup anywhere in the tree
    assert "MapInPandas" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_substring_removal_all_jvm_no_cartesian(spark, documents_sf):
    """ExactSubstr removal (r4 shape): array-local gram build — NO
    doc-keyed window exchange; ONE gram-keyed window pass whose sort is
    the bare 8-byte partition key (no orderBy -> no (id, pos) sort
    columns); equi joins only; no Python anywhere, no nested-loop path;
    the interval merge is linear zip_with (no aggregate fold)."""
    from kg.ops.dedup import remove_duplicate_substrings

    p = _plan(remove_duplicate_substrings(documents_sf, k=8))
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "CartesianProduct", "BroadcastNestedLoopJoin",
                 "SinglePartition"):
        assert node not in p, node
    assert "Window" in p  # the single gram-partition pass
    assert "row_number" not in p  # canonical-first is min-struct, no rank
    # exactly one Window node: the doc-keyed gram-build window is gone
    assert p.count("Window") - p.count("WindowGroupLimit") <= 2


def test_subword_tokenize_python_touches_dim_not_corpus(spark,
                                                        documents_sf):
    """The greedy matcher is ONE Arrow pass positioned over the
    distinct-word dim; the corpus side joins it broadcast."""
    from kg.ops.subword import subword_tokenize

    p = _plan(subword_tokenize(documents_sf))
    assert p.count("MapInPandas") == 1
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_leakage_split_train_corpus_never_shuffles(spark, documents_sf):
    """Both the gram guard joins are broadcast: no Exchange may carry the
    corpus (the only exchanges allowed are the tiny held-out gram
    distinct + hit aggregation)."""
    from pyspark.sql import functions as F

    from kg.ops.curation import leakage_safe_split

    p = _plan(leakage_safe_split(documents_sf))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the full-corpus text column never rides an exchange: every shuffle
    # in this plan is over gram/id projections, not (id, text) rows
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", p):
        assert "text" not in m.group(1)


def test_dense_ids_no_global_single_partition_sort(spark, documents_sf,
                                                   monkeypatch):
    """The op's reason to exist: no Window and no single-partition global
    sort — a rangepartitioning exchange + within-partition sort instead.
    The materialize barrier normally truncates the visible plan, so pin
    with it patched to identity (same dataflow, full lineage)."""
    import kg.ops.ids as ids_mod
    from kg.ops.ids import assign_dense_ids

    monkeypatch.setattr(ids_mod, "materialize", lambda df: df)
    df = documents_sf.select("doc_id", "lang")
    p = _plan(assign_dense_ids(df, ["lang", "doc_id"], num_partitions=8))
    assert "Window" not in p
    assert "rangepartitioning" in p.lower()
    assert "SinglePartition" not in p


def test_lr_round_two_partial_agged_shuffles_no_window(spark,
                                                       documents_sf):
    """One LR scoring pass: feature distinct + per-doc sum are the only
    exchanges; the model rides as an array literal (no join for it)."""
    from kg.ops.lm import lr_score

    p = _plan(lr_score(documents_sf, [0.1] * 16, 0.05))
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "partial_" in p.lower() or "HashAggregate" in p


def test_sums_truth_finder_round_equi_joins_only(spark):
    """One Sums half-round (claims x trust -> fact belief): an equi-join
    on the source key + a partial-agged groupBy on the fact key — no
    window, no cartesian, nothing Python-side."""
    from pyspark.sql import functions as F

    claims = spark.createDataFrame(
        [("s1", "a", "p", "x"), ("s2", "a", "p", "y")],
        "source string, subj string, pred string, obj string",
    )
    trust = spark.createDataFrame(
        [("s1", 1.0), ("s2", 1.0)], "source string, trust double"
    )
    p = _plan(
        claims.join(trust, "source")
        .groupBy("subj", "pred", "obj")
        .agg(F.sum("trust").alias("b"), F.count("*").alias("n_sources"))
    )
    assert "CartesianProduct" not in p
    assert "Window" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p
    assert "HashAggregate" in p


def test_predicate_canon_equi_joins_only_no_python(spark):
    """canonicalize_predicates: the candidate stage is an equi-self-join
    on the (s, o) pair key gated by the count-then-filter pair cap —
    never a cartesian — and the whole ladder stays JVM-side; the
    per-pred sizes dim joins broadcast."""
    from kg.stages.canon import canonicalize_predicates

    claims = spark.createDataFrame(
        [("s1", "p1", "o1"), ("s1", "p2", "o1"), ("s2", "p1", "o2")],
        "subj string, pred string, obj string",
    )
    p = _plan(canonicalize_predicates(claims, rounds=2))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "MapInPandas" not in p and "BatchEvalPython" not in p
    assert "BroadcastHashJoin" in p


def test_sgns_table_no_join_in_bin_expansion(spark):
    # bins per node are a CLOSED-FORM contiguous range: the expansion is
    # explode(sequence(...)) over the cumsum output, never a node x bin
    # join — at a 10^9-node vocabulary a join would dwarf the table build
    from kg.ops.kgtrain import sgns_unigram_table

    counts = spark.createDataFrame(
        [(i, i % 7 + 1) for i in range(50)], "node_id long, cnt long")
    p = _plan(sgns_unigram_table(counts, table_size=64))
    assert "CartesianProduct" not in p
    assert "Generate explode" in p  # the sequence() bin-span expansion
    assert "InPandas" not in p and "BatchEvalPython" not in p  # all JVM
    # exactly ONE vocab-sized exchange: the window re-partitions by _pid
    # because the materialize barrier erases the range partitioning
    # metadata (same accepted shape as _contiguous_rank); the offsets
    # side is a broadcast
    assert p.count("Exchange hashpartitioning") == 1


def test_sgns_negatives_single_equi_join_on_bin(spark):
    from kg.ops.kgtrain import sgns_negatives, sgns_unigram_table

    counts = spark.createDataFrame(
        [(i, i % 7 + 1) for i in range(50)], "node_id long, cnt long")
    tbl = sgns_unigram_table(counts, table_size=64)
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "center_id long, context_id long")
    p = _plan(sgns_negatives(pairs, tbl, k=3, table_size=64))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p  # equi-join on bin
    assert "InPandas" not in p and "BatchEvalPython" not in p


def test_node2vec_step_equi_joins_only_all_jvm(spark):
    # the biased step is candidate-explosion + equi-joins + one bounded
    # per-walk window; any cartesian/NLJ here would be quadratic in the
    # frontier at webgraph scale
    from kg.ops.kgtrain import node2vec_walks

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 4)], "src long, dst long")
    p = _plan(node2vec_walks(e, walk_len=3, ret_w=1, in_w=4, out_w=2))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p


def test_sample_neighborhoods_equi_joins_bounded_windows(spark):
    from kg.ops.kgtrain import sample_neighborhoods

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src long, dst long")
    s = spark.createDataFrame([(1,)], "node_id long")
    p = _plan(sample_neighborhoods(e, s, fanouts=(2, 2)))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p


def test_link_prediction_ranks_equi_joins_one_agg_no_window(spark):
    # energies are equi-joins + JVM array math; the rank is ONE
    # partial-agged groupBy per positive (no window, no per-positive sort)
    from kg.ops.kgtrain import (hash_embeddings, link_prediction_ranks,
                                negative_sample_triples)

    linked = spark.createDataFrame(
        [(1, "p", 2), (2, "p", 3)], "subj_id long, pred string, obj_id long")
    ents = spark.createDataFrame([(i,) for i in (1, 2, 3)],
                                 "entity_id long")
    ee = hash_embeddings(ents)
    re_ = hash_embeddings(
        spark.createDataFrame([("p",)], "pred string"),
        id_col="pred", salt="r")
    from kg.session import materialize

    # sever the sampler's lineage (its two-phase rank uses a per-_pid
    # window) so the plan under test is the ranks op alone
    negs = materialize(negative_sample_triples(linked, k=2))
    p = _plan(link_prediction_ranks(negs, ee, re_))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p


def test_hll_distinct_two_partial_agged_exchanges_no_python(spark):
    """HLL = two groupBys (registers, then estimate), both map-side
    partial-aggregated; no join, no window, no Python — the bounded-state
    counter the always-on corpus monitors rely on."""
    from kg.ops.sketch import hll_distinct

    df = spark.range(100).selectExpr(
        "cast(id % 3 as string) g", "cast(id as string) v"
    )
    p = _plan(hll_distinct(df, ["g"], "v", p=8))
    assert "Join" not in p
    assert "Window" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p
    assert "partial_max" in p  # register maxes combine map-side


def test_neighborhood_round_single_shuffle_join_no_python(spark):
    """One HyperBall round = counters ⋈ edges (equi join) + one
    partial-aggregated groupBy max; no cartesian, no Python."""
    from kg.graphstats import neighborhood_function

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    nf = neighborhood_function(edges, rounds=1, p=4)
    # the returned table is a driver-built aggregate; pin the round's
    # building blocks instead: counters joined to edges then max-merged
    from kg.session import materialize
    from pyspark.sql import functions as F

    e = materialize(edges.selectExpr("src", "dst"))
    c = materialize(
        edges.selectExpr("src as node", "cast(src % 16 as int) reg",
                         "cast(1 as int) mx").distinct()
    )
    merged = (
        c.union(
            e.join(c.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), "reg", "mx")
        )
        .groupBy("node", "reg")
        .agg(F.max("mx").alias("mx"))
    )
    p = _plan(merged)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p
    assert "partial_max" in p
    # and the end-to-end op returns the fixed 5-column aggregate shape
    assert nf.columns == ["r", "n_nodes", "est_pairs", "avg_ball"]


def test_modularity_equi_joins_only_partial_agged(spark):
    from kg.graphstats import modularity

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2)], "src long, dst long"
    )
    comm = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0)], "node long, label long"
    )
    p = _plan(modularity(edges, comm))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p
    assert "partial_count" in p  # degree + intra aggs combine map-side


def test_bpe_round_all_jvm_corpus_touched_once(spark):
    """BPE trainer: the pair-count round over the word dim is pure JVM
    (explode + partial-agged groupBy, no Python, no join); the merge
    apply is a JVM array fold (no Python either)."""
    from kg.ops.subword import _initial_symbols, _merge_pair
    from pyspark.sql import functions as F

    dim = spark.createDataFrame(
        [("low", 3), ("lower", 2)], "word string, n long"
    ).select("n", _initial_symbols(F.col("word")).alias("syms"))
    pairs = (
        dim.select(
            "n",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("a"),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("b"),
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )
    p = _plan(pairs)
    assert "InPandas" not in p and "BatchEvalPython" not in p
    assert "Join" not in p
    assert "partial_sum" in p
    merged = dim.select(_merge_pair(F.col("syms"), "l", "o").alias("syms"))
    p2 = _plan(merged)
    assert "InPandas" not in p2 and "BatchEvalPython" not in p2
    assert "Exchange" not in p2  # the apply step is a narrow map


def test_nil_cluster_capped_evidence_join_no_python(spark):
    """NIL clustering: the evidence self-join is equi on the doc key
    (never cartesian), the per-doc cap is a count-then-filter, and the
    whole pipeline is JVM-side."""
    from kg.stages.link import nil_cluster

    linked = spark.createDataFrame(
        [("u1", "A B", "p", "B", None, None)],
        "url string, subj string, pred string, obj string,"
        " subj_id long, obj_id long",
    )
    p = _plan(nil_cluster(linked))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p
    assert "partial_count" in p


def test_near_search_equi_band_join_pruned_scan(spark):
    """Proximity search: scan pruned to query terms, band joins ride on
    equi keys (doc, bucket) — no nested-loop join, no Python."""
    from kg.ops.ranking import near_search

    docs = spark.createDataFrame(
        [(1, "join a hash")], "doc_id long, text string"
    )
    p = _plan(near_search(docs, ["join", "hash"], window=5))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p


def test_graph_mixing_single_row_no_window_no_python(spark):
    from kg.graphstats import graph_mixing

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    p = _plan(graph_mixing(edges))
    assert "Window" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p
    assert "partial_count" in p


def test_file_skipping_stats_partial_agged_no_python(spark):
    """Footer-stats build: min/max/count and bloom bit_or all combine
    map-side; output is one row per file; no Python anywhere."""
    from kg.ops.layout import file_skipping_stats, scan_prune

    docs = spark.createDataFrame(
        [(1, 0, "a")], "doc_id long, file int, source string"
    )
    stats = file_skipping_stats(docs, "file", "source", m_bits=256)
    p = _plan(stats)
    assert "InPandas" not in p and "BatchEvalPython" not in p
    assert "partial_min" in p and "partial_bit_or" in p
    p2 = _plan(scan_prune(stats, "a", m_bits=256))
    # decision pass is pure array algebra over the metadata dim:
    # no join beyond the stats build itself, no window, no Python
    assert "Window" not in p2
    assert "InPandas" not in p2 and "BatchEvalPython" not in p2


def test_disambiguate_by_context_broadcast_dim_no_window(spark):
    """Two-signal linker: candidate dim broadcast (mention side never
    shuffles for the join); per-mention argmax is a partial-aggregable
    max_by, not a window; all word-set algebra is JVM."""
    from kg.stages.link import disambiguate_by_context

    mentions = spark.createDataFrame(
        [(1, "a", "x y")], "mention_id long, surface_norm string,"
        " context string"
    )
    cands = spark.createDataFrame(
        [("a", 1, "x z")], "surface_norm string, entity_id long,"
        " description string"
    )
    p = _plan(disambiguate_by_context(mentions, cands))
    assert "BroadcastHashJoin" in p
    assert "Window" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p
    assert "partial_max" in p


def test_ktruss_round_no_cartesian_partial_agged_support(spark):
    """One peel round = the degree-ordered triangle plan + a
    partial-aggregated support groupBy + a semi filter join — no
    cartesian, no window, no Python."""
    from kg.graphstats import _canonical_undirected, _enumerate_triangles
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "src long, dst long"
    )
    und = _canonical_undirected(edges)
    tris = _enumerate_triangles(und)
    support = (
        tris.select(F.least("a", "b1").alias("u"),
                    F.greatest("a", "b1").alias("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("s"))
    )
    p = _plan(und.join(support, ["u", "v"], "left"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" not in p
    assert "InPandas" not in p and "BatchEvalPython" not in p
    assert "partial_count" in p


def test_isotonic_single_corpus_shuffle_then_dim_windows(spark):
    """Isotonic calibration: ONE partial-agged corpus groupBy; the pair
    join and windows run on the <= n_bins dim (threshold_sweep's
    histogram discipline); no Python."""
    from kg.ops.curation import isotonic_calibrate

    df = spark.createDataFrame(
        [(0.2, 1), (0.7, 0)], "score double, label int"
    )
    p = _plan(isotonic_calibrate(df, n_bins=8))
    assert "InPandas" not in p and "BatchEvalPython" not in p
    assert "partial_count" in p or "partial_sum" in p
    # the j <= k pair join (and the fit rejoin) are dim x dim
    # (<= n_bins rows per side): a cartesian/nested-loop there is
    # deliberate and bounded. The corpus itself reaches exactly one
    # aggregation before the dim algebra — pinned by the partial agg
    # assert above; everything downstream operates on bin rows.
    assert p.count("CartesianProduct") + p.count(
        "BroadcastNestedLoopJoin"
    ) <= 2


def test_categorical_mi_relational_no_driver_collect(spark):
    """MI is pure DataFrame algebra over the contingency cells: cells
    join two BROADCAST marginals + aggregates — no collect()-scale
    driver state (VERDICT r3 item 3: the old impl collected every cell,
    so a high-cardinality pair could OOM the driver). Building the
    DataFrame must launch no job, and the plan must contain the joins
    (the collect-based version returned a LocalTableScan of driver-computed
    literals) with the corpus scan deduped by ReuseExchange."""
    from pyspark.sql import functions as F

    from kg.ops.profile import categorical_mi

    df = spark.range(200).select(
        (F.col("id") % 7).cast("string").alias("a"),
        (F.col("id") % 13).cast("string").alias("b"),
    )
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup() or [])
    mi = categorical_mi(df, "a", "b")
    jobs_after = len(tracker.getJobIdsForGroup() or [])
    assert jobs_after == jobs_before  # lazy: no collect at build time
    p = _plan(mi)
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "HashAggregate" in p
    assert "InPandas" not in p and "BatchEvalPython" not in p
    # no LocalTableScan-of-literals anywhere near the top: the output
    # row is COMPUTED by the plan, not precollected on the driver
    assert "LocalTableScan" not in p
    r = mi.first()
    assert r.n_cells == 91 and 0.0 <= r.nmi <= 1.0


def test_mixture_weights_temperature_relational_no_driver_collect(spark):
    """Temperature-smoothed mixing with an arbitrary-cardinality group
    column: targets must stay a broadcast dim end to end (VERDICT r4
    item 5 — the dict-returning temperature_targets path collects the
    group totals, a driver OOM for a host-keyed call). Build must be
    lazy, the factor dim must reach the corpus as a BROADCAST join, and
    values must equal the dict-path compose on a bounded group column."""
    from pyspark.sql import functions as F

    from kg.ops.curation import (
        mixture_weights,
        mixture_weights_temperature,
        temperature_targets,
    )

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("lang"),
        F.concat(F.lit("tok "), (F.col("id") % 17).cast("string"),
                 F.lit(" words here")).alias("text"),
    )
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup() or [])
    rel = mixture_weights_temperature(docs, alpha=0.3, group_col="lang")
    jobs_after = len(tracker.getJobIdsForGroup() or [])
    assert jobs_after == jobs_before  # lazy: no collect at build time
    p = _plan(rel)
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "InPandas" not in p and "BatchEvalPython" not in p
    got = sorted(map(tuple, rel.collect()))
    targets = temperature_targets(docs, alpha=0.3, group_col="lang")
    want = sorted(map(tuple, mixture_weights(
        docs, targets=targets, group_col="lang").collect()))
    assert got == want
