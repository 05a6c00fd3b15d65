"""KG-embedding training-example construction (kg/ops/kgtrain.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg.ops.kgtrain import _contiguous_rank, negative_sample_triples


def _linked(spark, rows):
    return spark.createDataFrame(
        rows, "subj_id long, pred string, obj_id long")


class TestContiguousRank:
    def test_matches_global_row_number(self, spark):
        ids = [97, 3, 41, 5, 88, 13, 2, 60, 71, 19]
        df = spark.createDataFrame([(i,) for i in ids], "entity_id long")
        got = {r["entity_id"]: r["idx"]
               for r in _contiguous_rank(df.repartition(7)).collect()}
        want = {v: i for i, v in enumerate(sorted(ids))}
        assert got == want


class TestNegativeSamples:
    def test_deterministic_filtered_and_capped(self, spark):
        rows = [(1, "p", 2), (1, "p", 3), (2, "q", 1)]
        df = _linked(spark, rows)
        a = sorted(map(tuple, negative_sample_triples(df, k=3).collect()))
        b = sorted(map(tuple, negative_sample_triples(
            df.repartition(5), k=3).collect()))
        assert a == b  # deterministic + partition invariant
        for subj_id, pred, obj_id, neg_rank, neg in a:
            assert 1 <= neg_rank <= 3
            assert neg != obj_id  # never the positive's own tail
            assert (subj_id, pred, neg) not in rows  # filtered setting
            assert neg in {1, 2, 3}  # drawn from the entity vocabulary

    def test_duplicate_positives_collapse_and_nulls_ignored(self, spark):
        df = spark.createDataFrame(
            [(1, "p", 2), (1, "p", 2), (None, "p", 2), (1, "p", None)],
            "subj_id long, pred string, obj_id long")
        out = negative_sample_triples(df, k=8)
        assert out.select("subj_id", "pred", "obj_id").distinct().count() == 1

    def test_matches_bruteforce_recompute(self, spark):
        import hashlib

        rows = [(i % 5 + 1, f"p{i % 2}", (i * 3) % 7 + 1) for i in range(20)]
        df = _linked(spark, rows)
        pos = set(rows)
        vocab = sorted({s for s, _, _ in pos} | {o for _, _, o in pos})
        n = len(vocab)
        want = set()
        for s, p, o in pos:
            for i in (1, 2):
                h = hashlib.md5(f"{s}|{p}|{o}|{i}".encode()).hexdigest()
                neg = vocab[int(h[:15], 16) % n]
                if neg != o and (s, p, neg) not in pos:
                    want.add((s, p, o, i, neg))
        got = {tuple(r) for r in negative_sample_triples(df, k=2).collect()}
        assert got == want


class TestRandomWalks:
    def _walks(self, spark, rows, **kw):
        from kg.ops.kgtrain import random_walks

        e = spark.createDataFrame(rows, "src long, dst long")
        return random_walks(e, **kw)

    def test_deterministic_and_partition_invariant(self, spark):
        rows = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4)]
        a = sorted(
            (r.walk_id, tuple(r.walk))
            for r in self._walks(spark, rows, walk_len=4).collect()
        )
        from kg.ops.kgtrain import random_walks

        e7 = spark.createDataFrame(rows, "src long, dst long").repartition(7)
        b = sorted(
            (r.walk_id, tuple(r.walk))
            for r in random_walks(e7, walk_len=4).collect()
        )
        assert a == b and len(a) == 4  # one walk per node (1,2,3,4)

    def test_walk_follows_md5_rule_and_dead_end_stops(self, spark):
        # node 4 has no out-edges: every walk reaching it ends there
        rows = [(1, 2), (2, 4)]
        out = {r.walk_id: list(r.walk) for r in self._walks(
            spark, rows, walk_len=5).collect()}
        # degree-1 chains are forced regardless of the hash draw
        assert out[1] == [1, 2, 4]
        assert out[2] == [2, 4]
        assert out[4] == [4]

    def test_walks_per_node_ids_unique(self, spark):
        rows = [(1, 2), (2, 1)]
        out = self._walks(spark, rows, walk_len=2, walks_per_node=3).collect()
        assert len(out) == 6
        assert len({r.walk_id for r in out}) == 6
        # forced 2-cycle: all walks alternate
        for r in out:
            exp = [r.start_id]
            while len(exp) < 3:
                exp.append(3 - exp[-1])
            assert list(r.walk) == exp

    def test_python_replay_matches(self, spark):
        import hashlib

        rows = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (2, 4), (4, 1)]
        adj = {}
        for s, d in rows:
            adj.setdefault(s, []).append(d)
        for v in adj.values():
            v.sort()
        got = {r.walk_id: list(r.walk) for r in self._walks(
            spark, rows, walk_len=3, walks_per_node=2).collect()}
        for node in (1, 2, 3, 4):
            for i in (0, 1):
                wid = node * 2 + i
                path = [node]
                for t in range(1, 4):
                    nbrs = adj.get(path[-1])
                    if not nbrs:
                        break
                    h = int(hashlib.md5(
                        f"{wid}|{t}".encode()).hexdigest()[:15], 16)
                    path.append(nbrs[h % len(nbrs)])
                assert got[wid] == path, wid


class TestVerbalize:
    FACTS = "subj string, pred string, obj string"

    def test_template_and_fallback_sentences(self, spark):
        from kg.ops.kgtrain import verbalize_facts

        facts = spark.createDataFrame(
            [("Ada", "born_in", "London"), ("Acme", "rivals_with", "Bmbl")],
            self.FACTS,
        )
        out = {r.pred: r for r in verbalize_facts(facts).collect()}
        assert out["born_in"].sentence == "Ada was born in London."
        assert out["born_in"].templated
        assert out["rivals_with"].sentence == "Acme rivals with Bmbl."
        assert not out["rivals_with"].templated

    def test_descriptions_capped_and_ordered(self, spark):
        from kg.ops.kgtrain import entity_descriptions

        facts = spark.createDataFrame(
            [("e", "produces", f"item{i:02d}") for i in range(8)]
            + [("e", "acquired", "aaa")],
            self.FACTS,
        ).repartition(5)
        row = entity_descriptions(facts, max_sentences=3).collect()[0]
        # (pred, obj) ascending: acquired first, then produces item00/01
        assert row.description == (
            "e acquired aaa. e produces item00. e produces item01."
        )
        assert row.n_facts == 3

    def test_duplicate_facts_collapse(self, spark):
        from kg.ops.kgtrain import entity_descriptions

        base = spark.createDataFrame(
            [("e", "acquired", "x"), ("e", "acquired", "x")], self.FACTS
        )
        row = entity_descriptions(base).collect()[0]
        assert row.n_facts == 1

    def test_verbalize_no_fact_shuffle(self, spark):
        from kg.ops.kgtrain import verbalize_facts

        facts = spark.read.parquet(
            "fixtures/expected_triples_small.parquet"
        ).select("subj", "pred", "obj")
        p = (
            verbalize_facts(facts)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p
        # the only exchange is the broadcast of the template dim
        assert p.count("Exchange hashpartitioning") == 0
        assert "InPandas" not in p and "BatchEvalPython" not in p

    def test_descriptions_two_data_exchanges(self, spark):
        from kg.ops.kgtrain import entity_descriptions

        facts = spark.read.parquet(
            "fixtures/expected_triples_small.parquet"
        )
        p = (
            entity_descriptions(facts)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # distinct + subject window; the groupBy reuses the window's
        # partitioning rather than adding a third
        assert p.count("Exchange hashpartitioning") == 2


class TestDistantSupervision:
    def _fixture(self, spark):
        mentions = spark.createDataFrame(
            [
                ("d1", "Acme"), ("d1", "Bob"), ("d1", "Bob"),  # dup mention
                ("d2", "Acme"), ("d2", "Paris"),
                ("d3", "Bob"), ("d3", "Paris"),
            ],
            "url string, entity_name string",
        )
        facts = spark.createDataFrame(
            [("Bob", "ceo_of", "Acme"), ("Bob", "works_for", "Acme"),
             ("Acme", "located_in", "Paris")],
            "subj string, pred string, obj string",
        )
        return mentions, facts

    def test_labels_orientations_and_negatives(self, spark):
        from kg.ops.kgtrain import distant_supervision

        mentions, facts = self._fixture(spark)
        got = sorted(
            map(tuple, distant_supervision(mentions, facts).collect())
        )
        assert got == sorted([
            # d1: Bob->Acme matches two predicates (multi-label DS)
            ("d1", "Bob", "Acme", "ceo_of", True),
            ("d1", "Bob", "Acme", "works_for", True),
            ("d1", "Acme", "Bob", "NO_RELATION", False),
            # d2: the located_in fact labels this doc even though it was
            # asserted elsewhere (DS noise by design)
            ("d2", "Acme", "Paris", "located_in", True),
            ("d2", "Paris", "Acme", "NO_RELATION", False),
            # d3: no fact between Bob and Paris in either direction
            ("d3", "Bob", "Paris", "NO_RELATION", False),
            ("d3", "Paris", "Bob", "NO_RELATION", False),
        ])

    def test_negative_downsample_keeps_positives(self, spark):
        from kg.ops.kgtrain import distant_supervision

        mentions, facts = self._fixture(spark)
        rows = distant_supervision(
            mentions, facts, neg_keep_frac=0.0
        ).collect()
        assert all(r.positive for r in rows)
        assert len(rows) == 3

    def test_entity_cap_drops_hub_doc(self, spark):
        from kg.ops.kgtrain import distant_supervision

        mentions, facts = self._fixture(spark)
        rows = distant_supervision(
            mentions, facts, max_entities_per_doc=1
        ).collect()
        assert rows == []


class TestWalkSkipgrams:
    def _pairs(self, spark, walks, **kw):
        from kg.ops.kgtrain import walk_skipgrams

        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(walks)],
            "walk_id long, walk array<long>",
        )
        return {
            (r.center_id, r.context_id): r.n_pairs
            for r in walk_skipgrams(df, **kw).collect()
        }

    def test_matches_bruteforce_replay(self, spark):
        walks = [[1, 2, 3, 4, 2], [2, 3], [5]]
        for window in (1, 2, 3):
            want = {}
            for w in walks:
                for i in range(len(w)):
                    for j in range(max(0, i - window),
                                   min(len(w), i + window + 1)):
                        if i != j:
                            k = (w[i], w[j])
                            want[k] = want.get(k, 0) + 1
            assert self._pairs(spark, walks, window=window) == want, window

    def test_counts_are_multiset_not_distinct(self, spark):
        # repeated co-occurrences accumulate, not collapse: in [1,2,1,2]
        # with window=1 the (1,2) pair arises at 0->1, 2->1 and 2->3
        got = self._pairs(spark, [[1, 2, 1, 2]], window=1)
        assert got[(1, 2)] == 3 and got[(2, 1)] == 3

    def test_singleton_walks_emit_nothing(self, spark):
        assert self._pairs(spark, [[7], []], window=2) == {}

    def test_no_join_single_shuffle(self, spark):
        from kg.ops.kgtrain import walk_skipgrams

        df = spark.createDataFrame(
            [(1, [1, 2, 3])], "walk_id long, walk array<long>"
        )
        plan = walk_skipgrams(df)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan  # pair gen is array-local
        assert plan.count("Exchange") == 1  # one partial-agged groupBy


class TestSgnsSampling:
    """unigram^0.75 quantized-table negative sampling (word2vec recipe)."""

    def _counts(self, spark, rows):
        return spark.createDataFrame(rows, "node_id long, cnt long")

    def test_int_pow34_exact_fourth_root(self, spark):
        from kg.ops.kgtrain import _int_pow34

        df = spark.createDataFrame(
            [(c,) for c in [1, 2, 15, 16, 17, 81, 255, 256, 257,
                            10_000, 999_983, 2_097_151]],
            "cnt long",
        )
        got = {r["cnt"]: r["w"]
               for r in df.select("cnt", _int_pow34(F.col("cnt")).alias("w"))
               .collect()}
        for c, w in got.items():
            assert w ** 4 <= c ** 3 < (w + 1) ** 4, (c, w)

    def test_table_exactly_b_rows_and_mass_proportional(self, spark):
        from kg.ops.kgtrain import sgns_unigram_table

        counts = self._counts(
            spark, [(1, 16), (2, 1), (3, 81), (4, 256)])  # w = 8,1,27,64
        B = 100
        rows = sgns_unigram_table(counts, table_size=B).collect()
        assert len(rows) == B
        assert sorted({r["bin"] for r in rows}) == list(range(B))
        share = {}
        for r in rows:
            share[r["node_id"]] = share.get(r["node_id"], 0) + 1
        # W=100, so bins per node = weight +/- 1 quantization slop
        for node, w in [(1, 8), (2, 1), (3, 27), (4, 64)]:
            assert abs(share.get(node, 0) - w) <= 1, (node, share)

    def test_table_partition_invariant(self, spark):
        from kg.ops.kgtrain import sgns_unigram_table

        counts = self._counts(
            spark, [(i, (i * 7) % 23 + 1) for i in range(40)])
        a = sorted(map(tuple, sgns_unigram_table(counts, 64).collect()))
        b = sorted(map(tuple,
                       sgns_unigram_table(counts.repartition(11), 64)
                       .collect()))
        assert a == b and len(a) == 64

    def test_table_matches_duckdb_recompute(self, spark):
        import duckdb

        from kg.ops.kgtrain import sgns_unigram_table

        data = [(i, (i * 13) % 97 + 1) for i in range(25)]
        counts = self._counts(spark, data)
        B = 48
        got = sorted(
            map(tuple, sgns_unigram_table(counts, table_size=B).collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE counts(node_id BIGINT, cnt BIGINT)")
        con.executemany("INSERT INTO counts VALUES (?, ?)", data)
        want = sorted(map(tuple, con.execute(f"""
            WITH wts AS (
              SELECT node_id,
                CAST(floor(pow(cnt, 0.75)) AS BIGINT)
                  + CASE WHEN power4(CAST(floor(pow(cnt,0.75)) AS BIGINT)+1)
                           <= cnt*cnt*cnt THEN 1 ELSE 0 END AS c1,
                cnt FROM counts
            ), wts2 AS (
              SELECT node_id,
                c1 - CASE WHEN c1*c1*c1*c1 > cnt*cnt*cnt THEN 1 ELSE 0 END
                  AS w FROM wts
            ), cum AS (
              SELECT node_id, w,
                SUM(w) OVER (ORDER BY node_id
                             ROWS UNBOUNDED PRECEDING) AS hi,
                SUM(w) OVER () AS wtot FROM wts2 WHERE w > 0
            ), spans AS (
              SELECT node_id,
                CAST((({2*B} * (hi - w) + wtot - 1) // wtot) // 2
                     AS BIGINT) AS b_min,
                CAST(((({2*B} * hi - 1) // wtot + 1) // 2) - 1
                     AS BIGINT) AS b_max
              FROM cum
            )
            SELECT unnest(generate_series(b_min, b_max)) AS bin, node_id
            FROM spans WHERE b_max >= b_min ORDER BY 1
        """.replace(
            "power4(CAST(floor(pow(cnt,0.75)) AS BIGINT)+1)",
            "(CAST(floor(pow(cnt,0.75)) AS BIGINT)+1)"
            "*(CAST(floor(pow(cnt,0.75)) AS BIGINT)+1)"
            "*(CAST(floor(pow(cnt,0.75)) AS BIGINT)+1)"
            "*(CAST(floor(pow(cnt,0.75)) AS BIGINT)+1)",
        )).fetchall()))
        assert got == want

    def test_negatives_deterministic_and_drop_context(self, spark):
        import hashlib

        from kg.ops.kgtrain import sgns_negatives, sgns_unigram_table

        counts = self._counts(spark, [(1, 16), (2, 1), (3, 81), (4, 256)])
        B = 32
        tbl = sgns_unigram_table(counts, table_size=B)
        lookup = {r["bin"]: r["node_id"] for r in tbl.collect()}
        pairs = spark.createDataFrame(
            [(1, 3), (4, 2), (3, 1)], "center_id long, context_id long")
        got = sorted(map(tuple, sgns_negatives(
            pairs, tbl, k=4, table_size=B).collect()))
        want = []
        for c, ctx in [(1, 3), (4, 2), (3, 1)]:
            for i in range(1, 5):
                h = hashlib.md5(f"{c}|{ctx}|{i}".encode()).hexdigest()
                neg = lookup[int(h[:15], 16) % B]
                if neg != ctx:
                    want.append((c, ctx, i, neg))
        assert got == sorted(want)
        again = sorted(map(tuple, sgns_negatives(
            pairs.repartition(5), tbl, k=4, table_size=B).collect()))
        assert got == again

    def test_walk_node_counts(self, spark):
        from kg.ops.kgtrain import walk_node_counts

        df = spark.createDataFrame(
            [(0, [1, 2, 1]), (1, [2]), (2, [])],
            "walk_id long, walk array<long>")
        got = {r["node_id"]: r["cnt"]
               for r in walk_node_counts(df).collect()}
        assert got == {1: 2, 2: 2}


class TestNode2vecWalks:
    ROWS = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (2, 4), (4, 1), (4, 5)]

    def _walks(self, spark, **kw):
        from kg.ops.kgtrain import node2vec_walks

        e = spark.createDataFrame(self.ROWS, "src long, dst long")
        return {
            r.walk_id: list(r.walk)
            for r in node2vec_walks(e, **kw).collect()
        }

    def test_unit_weights_degenerate_to_random_walks(self, spark):
        from kg.ops.kgtrain import node2vec_walks, random_walks

        e = spark.createDataFrame(self.ROWS, "src long, dst long")
        a = sorted((r.walk_id, tuple(r.walk)) for r in random_walks(
            e, walk_len=4, walks_per_node=2).collect())
        b = sorted((r.walk_id, tuple(r.walk)) for r in node2vec_walks(
            e, walk_len=4, walks_per_node=2).collect())
        assert a == b

    def test_python_replay_biased(self, spark):
        import hashlib

        rw, iw, ow = 1, 4, 2
        adj, edges = {}, set(self.ROWS)
        for s, d in self.ROWS:
            adj.setdefault(s, []).append(d)
        for v in adj.values():
            v.sort()
        got = self._walks(spark, walk_len=3, walks_per_node=2,
                          ret_w=rw, in_w=iw, out_w=ow)
        nodes = {s for s, _ in self.ROWS} | {d for _, d in self.ROWS}
        for node in nodes:
            for i in (0, 1):
                wid = node * 2 + i
                path = [node]
                for t in range(1, 4):
                    cur = path[-1]
                    nbrs = adj.get(cur)
                    if not nbrs:
                        break
                    h = int(hashlib.md5(
                        f"{wid}|{t}".encode()).hexdigest()[:15], 16)
                    if t == 1:
                        path.append(nbrs[h % len(nbrs)])
                        continue
                    prev = path[-2]
                    ws = [rw if v == prev
                          else iw if (prev, v) in edges else ow
                          for v in nbrs]
                    draw = h % sum(ws)
                    acc = 0
                    for v, w in zip(nbrs, ws):
                        acc += w
                        if draw < acc:
                            path.append(v)
                            break
                assert got[wid] == path, (wid, got[wid], path)

    def test_dead_end_terminates(self, spark):
        # 5 has no out-edges: every walk reaching it stops
        got = self._walks(spark, walk_len=6, walks_per_node=1,
                          ret_w=3, in_w=1, out_w=1)
        assert got[5] == [5]
        for path in got.values():
            if path[-1] == 5:
                assert len(path) <= 7

    def test_partition_invariant(self, spark):
        from kg.ops.kgtrain import node2vec_walks

        e = spark.createDataFrame(self.ROWS, "src long, dst long")
        a = sorted((r.walk_id, tuple(r.walk)) for r in node2vec_walks(
            e, walk_len=3, ret_w=1, in_w=4, out_w=2).collect())
        b = sorted((r.walk_id, tuple(r.walk)) for r in node2vec_walks(
            e.repartition(7), walk_len=3, ret_w=1, in_w=4, out_w=2
        ).collect())
        assert a == b

    def test_rejects_nonpositive_weights(self, spark):
        import pytest

        from kg.ops.kgtrain import node2vec_walks

        e = spark.createDataFrame(self.ROWS, "src long, dst long")
        with pytest.raises(ValueError):
            node2vec_walks(e, ret_w=0)


class TestSampleNeighborhoods:
    ROWS = [(1, v) for v in (2, 3, 4, 5, 6)] + [
        (2, 7), (2, 8), (3, 7), (4, 1), (7, 9), (8, 9), (9, 1)]

    def _sample(self, spark, seeds, fanouts, rows=None):
        from kg.ops.kgtrain import sample_neighborhoods

        e = spark.createDataFrame(rows or self.ROWS, "src long, dst long")
        s = spark.createDataFrame([(x,) for x in seeds], "node_id long")
        return sorted(
            (r.layer, r.src, r.dst)
            for r in sample_neighborhoods(e, s, fanouts=fanouts).collect()
        )

    @staticmethod
    def _replay(rows, seeds, fanouts):
        import hashlib

        adj = {}
        for s, d in set(rows):
            adj.setdefault(s, []).append(d)
        out, frontier = [], sorted(set(seeds))
        for layer, f in enumerate(fanouts, start=1):
            nxt = set()
            for u in frontier:
                ranked = sorted(
                    adj.get(u, []),
                    key=lambda v: (int(hashlib.md5(
                        f"{u}|{layer}|{v}".encode()).hexdigest()[:15], 16),
                        v),
                )[:f]
                for v in ranked:
                    out.append((layer, u, v))
                    nxt.add(v)
            frontier = sorted(nxt)
        return sorted(out)

    def test_matches_python_replay(self, spark):
        for seeds, fanouts in [((1,), (2, 2)), ((1, 7), (3, 1)),
                               ((9,), (1, 1, 1))]:
            got = self._sample(spark, seeds, fanouts)
            assert got == self._replay(self.ROWS, seeds, fanouts), (
                seeds, fanouts)

    def test_fanout_caps_per_node_per_layer(self, spark):
        got = self._sample(spark, (1,), (2, 2))
        from collections import Counter

        c = Counter((layer, src) for layer, src, _ in got)
        assert all(n <= 2 for n in c.values())
        assert c[(1, 1)] == 2  # node 1 has 5 out-neighbors, capped at 2

    def test_partition_invariant_and_rerun_identical(self, spark):
        from kg.ops.kgtrain import sample_neighborhoods

        e = spark.createDataFrame(self.ROWS, "src long, dst long")
        s = spark.createDataFrame([(1,), (3,)], "node_id long")
        a = sorted(map(tuple, sample_neighborhoods(
            e, s, fanouts=(2, 2)).collect()))
        b = sorted(map(tuple, sample_neighborhoods(
            e.repartition(9), s.repartition(3), fanouts=(2, 2)).collect()))
        assert a == b

    def test_dead_end_frontier_empties(self, spark):
        got = self._sample(spark, (5,), (3, 3), rows=[(5, 6)] + self.ROWS[5:])
        assert [t for t in got if t[0] == 1] == [(1, 5, 6)]
        assert all(layer == 1 for layer, _, _ in got)


class TestTranseEval:
    LINKED = [(1, "p", 2), (1, "p", 3), (2, "q", 1), (3, "p", 4),
              (4, "q", 2)]

    @staticmethod
    def _emb(salt, x, dim=4, mod=17):
        import hashlib

        return [int(hashlib.md5(f"{salt}|{x}|{j}".encode())
                    .hexdigest()[:15], 16) % mod - mod // 2
                for j in range(dim)]

    def _setup(self, spark):
        from kg.ops.kgtrain import hash_embeddings

        linked = spark.createDataFrame(
            self.LINKED, "subj_id long, pred string, obj_id long")
        ents = spark.createDataFrame(
            [(i,) for i in range(1, 5)], "entity_id long")
        ee = hash_embeddings(ents, dim=4, modulus=17)
        re_ = hash_embeddings(
            spark.createDataFrame([("p",), ("q",)], "pred string"),
            dim=4, modulus=17, id_col="pred", salt="r")
        return linked, ee, re_

    def test_hash_embeddings_python_replay(self, spark):
        _, ee, re_ = self._setup(spark)
        got = {r["entity_id"]: list(r["emb"]) for r in ee.collect()}
        assert got == {i: self._emb("e", i) for i in range(1, 5)}
        gotr = {r["pred"]: list(r["emb"]) for r in re_.collect()}
        assert gotr == {p: self._emb("r", p) for p in ("p", "q")}

    def test_energy_exact_l1_replay(self, spark):
        from kg.ops.kgtrain import transe_energy

        linked, ee, re_ = self._setup(spark)
        for r in transe_energy(linked, ee, re_).collect():
            es = self._emb("e", r.subj_id)
            rp = self._emb("r", r.pred)
            eo = self._emb("e", r.obj_id)
            assert r.energy == sum(
                abs(a + b - c) for a, b, c in zip(es, rp, eo))

    def test_ranks_pessimistic_and_partition_invariant(self, spark):
        from kg.ops.kgtrain import (link_prediction_ranks,
                                    negative_sample_triples)

        linked, ee, re_ = self._setup(spark)
        negs = negative_sample_triples(linked, k=3)
        a = sorted(map(tuple, link_prediction_ranks(
            negs, ee, re_).collect()))
        b = sorted(map(tuple, link_prediction_ranks(
            negs.repartition(7), ee, re_).collect()))
        assert a == b and len(a) == len(self.LINKED)
        # brute-force rank recompute
        neg_rows = [tuple(r) for r in negs.collect()]
        for subj, pred, obj, pos_e, n_cands, rank in a:
            es, rp = self._emb("e", subj), self._emb("r", pred)
            pe = sum(abs(x + y - z) for x, y, z in zip(
                es, rp, self._emb("e", obj)))
            assert pe == pos_e
            cands = [n for (s, p, o, _, n) in neg_rows
                     if (s, p, o) == (subj, pred, obj)]
            assert n_cands == len(cands)
            worse = sum(
                1 for n in cands
                if sum(abs(x + y - z) for x, y, z in zip(
                    es, rp, self._emb("e", n))) <= pe)
            assert rank == 1 + worse

    def test_metrics_row(self, spark):
        from kg.ops.kgtrain import (link_prediction_ranks, lp_metrics,
                                    negative_sample_triples)

        linked, ee, re_ = self._setup(spark)
        ranks = link_prediction_ranks(
            negative_sample_triples(linked, k=3), ee, re_)
        row = lp_metrics(ranks, ks=(1, 3)).collect()[0]
        rs = [r["rank"] for r in ranks.collect()]
        assert row["n_pos"] == len(rs)
        assert row["mrr"] == round(sum(1 / r for r in rs) / len(rs), 6)
        assert row["hits_1"] == round(
            sum(r <= 1 for r in rs) / len(rs), 6)
        assert row["hits_3"] == round(
            sum(r <= 3 for r in rs) / len(rs), 6)


class TestKgtrainPipelineStage:
    def test_run_pipeline_kgtrain_stage(self, spark, tmp_path):
        """run_pipeline --stages ...,kgtrain writes the four training
        exports + the dense-id map, internally consistent: walk/skipgram
        node ids live in the dense-id space, the sampling table covers
        every bin exactly once, and negatives never collide with a true
        (subj, pred) tail."""
        import run_pipeline

        out = str(tmp_path / "kg_out")
        rc = run_pipeline.main([
            "--pages", "/root/repo/fixtures/pages_tiny.parquet",
            "--out", out, "--buckets", "4",
            "--stages", "extract,triples,link,canon,graph,kgtrain",
        ])
        assert rc == 0
        from pyspark.sql import functions as F

        ids = spark.read.parquet(f"{out}/train_entity_ids")
        n = ids.count()
        assert ids.agg(F.min("node_id"), F.max("node_id")).first() == (
            0, n - 1)
        walks = spark.read.parquet(f"{out}/train_walks")
        nodes_in_walks = walks.select(
            F.explode("walk").alias("x")).agg(F.max("x")).first()[0]
        assert nodes_in_walks < n  # dense-id space
        sg = spark.read.parquet(f"{out}/train_skipgrams")
        assert sg.where(F.col("n_pairs") < 1).count() == 0
        tbl = spark.read.parquet(f"{out}/sgns_table")
        assert tbl.count() == 1 << 16
        assert tbl.select("bin").distinct().count() == 1 << 16
        negs = spark.read.parquet(f"{out}/train_negatives")
        pos = spark.read.parquet(f"{out}/graph")
        assert negs.where(
            F.col("neg_obj_id") == F.col("obj_id")).count() == 0
        assert negs.count() > 0


class TestNeighborMeanFeatures:
    def test_mean_and_count(self, spark):
        from kg.ops.kgtrain import neighbor_mean_features

        feats = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [3.0, 4.0]), (3, [5.0, 8.0])],
            "vec_id long, embedding array<double>",
        )
        edges = spark.createDataFrame(
            [(1, 3), (2, 3), (3, 1)], "src long, dst long"
        )
        got = {
            r.node: (r.n_neighbors, r.mean_vec)
            for r in neighbor_mean_features(edges, feats).collect()
        }
        # node 3 averages feats of 1 and 2; node 1 gets node 3's feats;
        # node 2 has no in-neighbors -> absent
        assert got[3] == (2, [2.0, 2.0])
        assert got[1] == (1, [5.0, 8.0])
        assert 2 not in got

    def test_isolated_feature_node_ignored(self, spark):
        from kg.ops.kgtrain import neighbor_mean_features

        feats = spark.createDataFrame(
            [(1, [1.0]), (9, [7.0])], "vec_id long, embedding array<double>"
        )
        edges = spark.createDataFrame([(1, 2)], "src long, dst long")
        rows = neighbor_mean_features(edges, feats).collect()
        assert len(rows) == 1 and rows[0].node == 2
