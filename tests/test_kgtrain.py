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
