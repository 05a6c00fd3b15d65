"""Lexical ranking (kg/ops/ranking.py) and snapshot diff
(kg/ops/merge.py:snapshot_diff) against independent pure-Python
recomputations."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from kg.ops.merge import snapshot_diff
from kg.ops.ranking import bm25_search, corpus_vocab, tfidf_topk

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown cat sleeps"),
    (2, "spark joins hash tables and the fox"),
    (3, "hash hash hash collision"),
    (4, "  "),  # whitespace-only: contributes no tokens
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _postings():
    out = {}
    for i, text in DOCS:
        toks = [t for t in text.lower().split() if t]
        if toks:
            out[i] = Counter(toks)
    return out


class TestVocab:
    def test_counts_and_rank_tiebreak(self, spark, docs_df):
        p = _postings()
        cf = Counter()
        df = Counter()
        for c in p.values():
            cf.update(c)
            df.update(c.keys())
        want = sorted(cf, key=lambda t: (-cf[t], t))
        got = corpus_vocab(docs_df, top_v=5).collect()
        assert [r["term"] for r in sorted(got, key=lambda r: r["rank"])] == want[:5]
        for r in got:
            assert r["cf"] == cf[r["term"]] and r["df"] == df[r["term"]]


class TestTfidf:
    def test_matches_python_recompute(self, spark, docs_df):
        p = _postings()
        n = len(DOCS)  # N counts all docs, including the empty one
        df = Counter()
        for c in p.values():
            df.update(c.keys())
        want = {}
        for doc, c in p.items():
            scored = sorted(
                (
                    (round(tf * (math.log((n + 1) / (df[t] + 1)) + 1), 6), t)
                    for t, tf in c.items()
                ),
                key=lambda st: (-st[0], st[1]),
            )
            want[doc] = scored[:3]
        got = tfidf_topk(docs_df, k=3).collect()
        by_doc: dict[int, list] = {}
        for r in sorted(got, key=lambda r: (r["doc"], r["pos"])):
            by_doc.setdefault(r["doc"], []).append((r["score"], r["term"]))
        assert by_doc == want

    def test_partition_invariant(self, spark, docs_df):
        a = sorted(map(tuple, tfidf_topk(docs_df, k=3).collect()))
        b = sorted(map(tuple, tfidf_topk(docs_df.repartition(7), k=3).collect()))
        assert a == b


class TestBm25:
    def test_matches_python_recompute(self, spark, docs_df):
        k1, b = 1.2, 0.75
        query = ["hash", "fox"]
        p = _postings()
        n = len(DOCS)
        dls = {doc: sum(c.values()) for doc, c in p.items()}
        avgdl = sum(dls.values()) / len(dls)
        df = Counter()
        for c in p.values():
            df.update(t for t in c if t in query)
        want = {}
        for doc, c in p.items():
            s = 0.0
            hits = 0
            for t in query:
                if t not in c:
                    continue
                hits += 1
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1)
                s += idf * (c[t] * (k1 + 1)) / (
                    c[t] + k1 * (1 - b + b * dls[doc] / avgdl)
                )
            if hits:
                want[doc] = (round(s, 6), hits)
        got = bm25_search(docs_df, query, top_n=10).collect()
        assert {r["doc"]: (r["score"], r["n_hits"]) for r in got} == want
        # rank order: score desc, doc asc
        ranked = sorted(got, key=lambda r: r["rank"])
        assert [r["doc"] for r in ranked] == [
            d for d, _ in sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))
        ]

    def test_doc3_tops_hash_query(self, spark, docs_df):
        got = bm25_search(docs_df, ["hash"], top_n=1).collect()
        assert got[0]["doc"] == 3


class TestSnapshotDiff:
    def test_all_four_statuses(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "id long, s string, v long")
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "B", 20), (4, "d", 40)],
            "id long, s string, v long")
        got = {r["id"]: r["status"] for r in snapshot_diff(
            old, new, keys=["id"], compare_cols=["s", "v"]).collect()}
        assert got == {
            1: "unchanged", 2: "changed", 3: "removed", 4: "added"}

    def test_null_safe_compare(self, spark):
        old = spark.createDataFrame([(1, None)], "id long, s string")
        new = spark.createDataFrame([(1, None)], "id long, s string")
        got = snapshot_diff(old, new, ["id"], ["s"]).collect()
        assert got[0]["status"] == "unchanged"


class TestHistoryIntervals:
    def test_versions_chain_and_current_flag(self, spark):
        import datetime as dt

        from kg.ops.merge import history_intervals

        t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa
        rows = [
            (1, t(0), 10, "a"), (1, t(10), 11, "b"), (1, t(20), 12, "c"),
            (2, t(5), 20, "x"),
        ]
        df = spark.createDataFrame(
            rows, "k long, ts timestamp, eid long, v string")
        got = {
            r["eid"]: (r["valid_from"], r["valid_to"], r["is_current"])
            for r in history_intervals(
                df, keys=["k"], order_cols=["eid"]).collect()
        }
        assert got[10] == (t(0), t(10), False)
        assert got[11] == (t(10), t(20), False)
        assert got[12] == (t(20), None, True)
        assert got[20] == (t(5), None, True)
        # intervals chain: each version's valid_to is the next valid_from


class TestFunnel:
    def test_chain_semantics(self, spark):
        import datetime as dt

        from kg.ops.events import funnel_steps

        t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa
        rows = [
            # u1 completes all three in order
            (1, t(0), "signup"), (1, t(5), "click"), (1, t(9), "purchase"),
            # u2: purchase BEFORE the click -> only 2 steps
            (2, t(0), "signup"), (2, t(8), "click"), (2, t(3), "purchase"),
            # u3: signup only
            (3, t(1), "signup"),
            # u4: click/purchase but never signed up -> absent
            (4, t(0), "click"), (4, t(1), "purchase"),
            # u5: greedy-earliest anchor still completes (click@2 after
            # the EARLIEST signup@1, purchase@3)
            (5, t(4), "signup"), (5, t(1), "signup"),
            (5, t(2), "click"), (5, t(3), "purchase"),
        ]
        ev = spark.createDataFrame(
            [(u, ts, et, float(u), "{}", u) for u, ts, et in rows],
            "user_id long, ts timestamp, event_type string, value double,"
            " props string, event_id long",
        )
        got = {
            r["user_id"]: (r["steps_completed"], r["t_first"], r["t_last"])
            for r in funnel_steps(
                ev, ["signup", "click", "purchase"]).collect()
        }
        assert got[1] == (3, t(0), t(9))
        assert got[2] == (2, t(0), t(8))
        assert got[3] == (1, t(1), t(1))
        assert 4 not in got
        assert got[5] == (3, t(1), t(3))


class TestRetention:
    def test_cohort_matrix(self, spark):
        import datetime as dt

        from kg.ops.events import cohort_retention

        # week starting Mon 2024-01-01; u1,u2 cohort week0; u3 week1.
        # u1 active weeks 0,1,2; u2 weeks 0,2; u3 weeks 1 only
        def t(day):
            return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)

        rows = [
            (1, t(0)), (1, t(7)), (1, t(15)),
            (2, t(2)), (2, t(14)),
            (3, t(8)),
        ]
        ev = spark.createDataFrame(
            [(u, ts, "click", 1.0, "{}", i) for i, (u, ts) in enumerate(rows)],
            "user_id long, ts timestamp, event_type string, value double,"
            " props string, event_id long",
        )
        got = {
            (r["cohort_week"].date().isoformat(), r["week_n"]):
                (r["n_active"], r["n_cohort"], r["retention"])
            for r in cohort_retention(ev).collect()
        }
        assert got[("2024-01-01", 0)] == (2, 2, 1.0)
        assert got[("2024-01-01", 1)] == (1, 2, 0.5)
        assert got[("2024-01-01", 2)] == (2, 2, 1.0)
        assert got[("2024-01-08", 0)] == (1, 1, 1.0)


class TestPhraseSearch:
    def _docs(self, spark):
        rows = [
            (1, "the red wine is a red wine indeed"),
            (2, "red and wine but never adjacent red, wine"),
            (3, "RED WINE uppercase still matches"),
            (4, "wine red reversed does not"),
            (5, "ends with red wine"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_consecutive_only_case_folded(self, spark):
        from kg.ops.ranking import phrase_search

        got = {
            r.doc: (r.first_pos, r.n_occurrences)
            for r in phrase_search(self._docs(spark), "red wine").collect()
        }
        assert got == {1: (1, 2), 3: (0, 1), 5: (2, 1)}

    def test_single_term_and_triple(self, spark):
        from kg.ops.ranking import phrase_search

        docs = self._docs(spark)
        single = {
            r.doc: r.n_occurrences
            for r in phrase_search(docs, "red").collect()
        }
        assert single[1] == 2 and single[4] == 1
        triple = {
            r.doc: (r.first_pos, r.n_occurrences)
            for r in phrase_search(docs, "a red wine").collect()
        }
        assert triple == {1: (4, 1)}

    def test_empty_phrase_raises(self, spark):
        import pytest

        from kg.ops.ranking import phrase_search

        with pytest.raises(ValueError):
            phrase_search(self._docs(spark), "   ")


class TestCooccurrence:
    def test_window_pairs_and_self_pair_drop(self, spark):
        from kg.ops.ranking import cooccurrence_edges

        docs = spark.createDataFrame(
            [(1, "a b c a"), (2, "x x y"), (3, "solo"), (4, "")],
            "doc_id long, text string",
        )
        got = {
            (r.a, r.b): r.wt
            for r in cooccurrence_edges(docs, window=2).collect()
        }
        # doc 1 (window 2): (a,b) at i=0 and i=1(b,a normalized), (a,c)
        # at i=0 and i=2, (b,c) at i=1; doc 2 (window 2): (x,x) dropped
        # twice, (x,y) twice; solo/empty docs contribute nothing
        assert got == {
            ("a", "b"): 2.0, ("a", "c"): 2.0, ("b", "c"): 1.0,
            ("x", "y"): 2.0,
        }

    def test_window_one_is_adjacency_only(self, spark):
        from kg.ops.ranking import cooccurrence_edges

        docs = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"
        )
        got = {(r.a, r.b) for r in cooccurrence_edges(docs, window=1).collect()}
        assert got == {("a", "b"), ("b", "c")}


class TestTextRank:
    def test_hub_outranks_leaves_and_ranks_sum_to_one(self, spark):
        from kg.ops.ranking import textrank_keywords

        # "hub" co-occurs with every leaf; leaves only see the hub
        docs = spark.createDataFrame(
            [(i, f"hub leaf{i}") for i in range(6)],
            "doc_id long, text string",
        )
        ranks = {
            r.term: r.rank
            for r in textrank_keywords(docs, window=1, iterations=6).collect()
        }
        assert abs(sum(ranks.values()) - 1.0) < 1e-6
        hub = ranks.pop("hub")
        assert all(hub > v for v in ranks.values())

    def test_symmetric_graph_gives_equal_ranks(self, spark):
        from kg.ops.ranking import textrank_keywords

        docs = spark.createDataFrame(
            [(1, "p q"), (2, "q p")], "doc_id long, text string"
        )
        ranks = [r.rank for r in textrank_keywords(docs, window=1).collect()]
        assert len(ranks) == 2 and abs(ranks[0] - ranks[1]) < 1e-12


class TestRake:
    def _replay(self, text, top_k=3):
        import re

        from kg.ops.ranking import RAKE_STOPWORDS

        pat = r"\b(?:" + "|".join(RAKE_STOPWORDS) + r")\b|[^a-z0-9\s]+"
        parts = [
            re.sub(r"\s+", " ", p).strip()
            for p in re.sub(pat, "\x01", text.lower()).split("\x01")
        ]
        phrases = [p for p in parts if p]
        if not phrases:
            return []
        pw = [p.split(" ") for p in phrases]
        freq, deg = {}, {}
        for ws in pw:
            for w in ws:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(ws)
        scored = sorted(
            (
                (-sum(deg[w] / freq[w] for w in ws), i)
                for i, ws in enumerate(pw)
            ),
        )[:top_k]
        return [(i, phrases[i], round(-s, 6)) for s, i in scored]

    def test_matches_python_replay(self, spark):
        from kg.ops.ranking import rake_keyphrases

        corpus = [
            (1, "Minimal supporting sets are computed. The minimal set "
                "algorithm computes minimal supporting sets fast, and the "
                "algorithm is fast."),
            (2, "one"),
            (3, ""),
            (4, "the and of"),
            (5, "a b the a b"),
        ]
        docs = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {
            (r.doc_id, r.phrase_idx): (r.phrase, r.score)
            for r in rake_keyphrases(docs, top_k=3).collect()
        }
        want = {}
        for did, text in corpus:
            for i, phrase, score in self._replay(text):
                want[(did, i)] = (phrase, score)
        assert set(got) == set(want)
        for k, (phrase, score) in want.items():
            assert got[k][0] == phrase
            assert abs(got[k][1] - score) < 1e-6

    def test_zero_shuffle(self, spark):
        from kg.ops.ranking import rake_keyphrases

        docs = spark.createDataFrame(
            [(1, "x y. z")], "doc_id long, text string"
        )
        plan = rake_keyphrases(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestInduceStopwords:
    def test_df_ratio_threshold(self, spark):
        from kg.ops.ranking import induce_stopwords

        docs = spark.createDataFrame(
            [
                (1, "the cat sat"),
                (2, "the dog ran"),
                (3, "the cat ran"),
                (4, "a bird"),
            ],
            "doc_id long, text string",
        )
        got = {r.term: (r.df, r.df_ratio, r.cf)
               for r in induce_stopwords(docs, max_df_ratio=0.5).collect()}
        # the: df 3/4 = 0.75 > 0.5; cat/ran: 2/4 = 0.5 NOT > 0.5; rest below
        assert got == {"the": (3, 0.75, 3)}

    def test_min_docs_guards_small_corpora(self, spark):
        from kg.ops.ranking import induce_stopwords

        docs = spark.createDataFrame(
            [(1, "only one doc here")], "doc_id long, text string"
        )
        assert induce_stopwords(docs, max_df_ratio=0.5).count() == 0


class TestNearSearch:
    def test_window_semantics_inclusive_boundary(self, spark):
        from kg.ops.ranking import near_search

        docs = spark.createDataFrame(
            [
                (1, "join a b c d hash"),      # distance 5: inside w=5
                (2, "join a b c d e hash"),    # distance 6: outside
                (3, "hash x join"),            # other term BEFORE anchor
                (4, "join join hash"),         # two qualifying anchors
                (5, "nothing here"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc"]: (r["n_anchors"], r["first_anchor"])
            for r in near_search(docs, ["join", "hash"], window=5).collect()
        }
        assert got == {1: (1, 0), 3: (1, 2), 4: (2, 0)}

    def test_three_term_conjunction(self, spark):
        from kg.ops.ranking import near_search

        docs = spark.createDataFrame(
            [
                (1, "sort join x hash"),   # both within 3 of anchor
                (2, "sort a a a join x hash"),  # sort 4 away: fails w=3
            ],
            "doc_id long, text string",
        )
        got = [
            r["doc"]
            for r in near_search(
                docs, ["join", "hash", "sort"], window=3
            ).collect()
        ]
        assert got == [1]

    def test_phrase_hit_implies_near_hit(self, spark):
        from kg.ops.ranking import near_search, phrase_search

        from pyspark.sql import functions as F

        docs = spark.read.parquet("fixtures/pages_small.parquet").select(
            F.col("url").alias("doc_id"), "text"
        )
        ph = {r["doc"] for r in phrase_search(docs, "the company").collect()}
        nr = {
            r["doc"]
            for r in near_search(docs, ["the", "company"], window=3).collect()
        }
        assert ph <= nr

    def test_validation(self, spark):
        from kg.ops.ranking import near_search

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            near_search(docs, [])
        with pytest.raises(ValueError):
            near_search(docs, ["a", "b"], window=0)

    def test_partition_invariant(self, spark):
        from kg.ops.ranking import near_search

        docs = spark.createDataFrame(
            [(i, "join x hash join") for i in range(40)],
            "doc_id long, text string",
        )
        one = sorted(map(tuple, near_search(docs, ["join", "hash"]).collect()))
        two = sorted(
            map(
                tuple,
                near_search(docs.repartition(13), ["join", "hash"]).collect(),
            )
        )
        assert one == two
