"""Temporal operators (kg/ops/temporal.py) and sketches
(kg/ops/sketch.py): golden semantics vs pure-Python recomputes,
partition invariance, and the KMV error bound."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from kg.ops.sketch import grouped_quantiles, kmv_distinct
from kg.ops.temporal import asof_join, range_join, time_rollup


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


class TestAsof:
    def fixtures(self, spark):
        trades = spark.createDataFrame(
            [
                (1, _ts(10), "t1"),
                (1, _ts(30), "t2"),
                (1, _ts(5), "t0"),  # before any quote
                (2, _ts(20), "t3"),
                (3, _ts(20), "t4"),  # key absent on right
            ],
            "k long, ts timestamp, tag string",
        )
        quotes = spark.createDataFrame(
            [
                (1, _ts(8), 100.0),
                (1, _ts(10), 101.0),  # equal-ts: inclusive match for t1
                (1, _ts(25), 102.0),
                (2, _ts(1), 103.0),
            ],
            "k long, ts timestamp, px double",
        )
        return trades, quotes

    def test_backward_inclusive_semantics(self, spark):
        trades, quotes = self.fixtures(spark)
        out = {
            r["tag"]: (r["r_px"], r["r_ts"])
            for r in asof_join(
                trades, quotes, keys=["k"], right_cols=["px"]
            ).collect()
        }
        assert out["t0"] == (None, None)
        assert out["t1"] == (101.0, _ts(10))  # ts-equal quote wins
        assert out["t2"] == (102.0, _ts(25))
        assert out["t3"] == (103.0, _ts(1))
        assert out["t4"] == (None, None)

    def test_tolerance(self, spark):
        trades, quotes = self.fixtures(spark)
        out = {
            r["tag"]: r["r_px"]
            for r in asof_join(
                trades,
                quotes,
                keys=["k"],
                right_cols=["px"],
                tolerance_sec=6 * 60,
            ).collect()
        }
        # t2 (30) matches quote at 25 (5min, inside); t3 (20) matches
        # quote at 1 (19min, outside tolerance -> nulled)
        assert out["t2"] == 102.0
        assert out["t3"] is None

    def test_left_rows_preserved_and_partition_invariant(self, spark):
        trades, quotes = self.fixtures(spark)
        out = asof_join(trades, quotes, keys=["k"], right_cols=["px"])
        assert out.count() == trades.count()
        rep = asof_join(
            trades.repartition(7), quotes.repartition(3),
            keys=["k"], right_cols=["px"],
        )
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, rep.collect())
        )


class TestRangeJoin:
    def fixtures(self, spark):
        events = spark.createDataFrame(
            [(1, _ts(m), f"e{m}") for m in (0, 10, 20, 35, 61)]
            + [(2, _ts(10), "other_key")],
            "k long, ts timestamp, tag string",
        )
        windows = spark.createDataFrame(
            [
                (1, _ts(5), _ts(20), "w1"),   # catches 10, 20 (inclusive)
                (1, _ts(30), _ts(40), "w2"),  # catches 35
                (1, _ts(90), _ts(95), "w3"),  # empty
                (2, _ts(0), _ts(60), "w4"),   # other key
            ],
            "k long, win_start timestamp, win_end timestamp, wtag string",
        )
        return events, windows

    def test_containment_inclusive(self, spark):
        events, windows = self.fixtures(spark)
        got = sorted(
            (r["tag"], r["wtag"])
            for r in range_join(
                events, windows, keys=["k"]
            ).collect()
        )
        assert got == [
            ("e10", "w1"), ("e20", "w1"), ("e35", "w2"),
            ("other_key", "w4"),
        ]

    def test_no_duplicates_across_buckets(self, spark):
        # tiny bucket => every window spans many buckets; each event must
        # still match each containing window exactly once
        events, windows = self.fixtures(spark)
        got = range_join(events, windows, keys=["k"], bucket_sec=7.0)
        assert got.count() == 4
        assert got.select("tag", "wtag").distinct().count() == 4

    def test_left_semi(self, spark):
        events, windows = self.fixtures(spark)
        got = sorted(
            r["tag"]
            for r in range_join(
                events, windows, keys=["k"], how="left_semi"
            ).collect()
        )
        assert got == ["e10", "e20", "e35", "other_key"]

    def test_plan_is_hash_join_not_nested_loop(self, spark):
        events, windows = self.fixtures(spark)
        plan = range_join(events, windows, keys=["k"])._jdf.queryExecution(
        ).executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan


class TestTimeRollup:
    def test_vs_python_recompute(self, spark):
        rows = [
            (i, _ts(i * 37), float((i * 7919) % 100) / 10, ["a", "b"][i % 2])
            for i in range(200)
        ]
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, value double, etype string"
        )
        got = {
            (r["grain"], r["bucket_start"], r["etype"]): (
                r["n"], r["sum_value"], r["min_value"], r["max_value"]
            )
            for r in time_rollup(
                events, dims=["etype"], grains=("hour", "day")
            ).collect()
        }
        expect = {}
        for grain, trunc in (
            ("hour", lambda t: t.replace(minute=0, second=0, microsecond=0)),
            ("day", lambda t: t.replace(
                hour=0, minute=0, second=0, microsecond=0)),
        ):
            acc = {}
            for _i, ts, v, e in rows:
                key = (grain, trunc(ts), e)
                n, s, lo, hi = acc.get(key, (0, 0.0, float("inf"),
                                             float("-inf")))
                acc[key] = (n + 1, s + v, min(lo, v), max(hi, v))
            for k, (n, s, lo, hi) in acc.items():
                expect[k] = (n, round(s, 6), lo, hi)
        assert got == expect

    def test_coarse_equals_direct_aggregation(self, spark):
        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        rolled = time_rollup(events, grains=("hour", "day"))
        direct = events.groupBy(
            F.date_trunc("day", "ts").alias("bucket_start")
        ).agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        got = {
            r["bucket_start"]: (r["n"], r["sum_value"])
            for r in rolled.where(F.col("grain") == "day").collect()
        }
        want = {
            r["bucket_start"]: (r["n"], r["sum_value"])
            for r in direct.collect()
        }
        assert got == want

    def test_bad_grain_order_raises(self, spark):
        events = spark.createDataFrame(
            [(1, _ts(0), 1.0)], "event_id long, ts timestamp, value double"
        )
        with pytest.raises(ValueError):
            time_rollup(events, grains=("day", "hour"))


class TestKMV:
    def test_small_groups_exact(self, spark):
        df = spark.createDataFrame(
            [("a", f"v{i % 17}") for i in range(100)]
            + [("b", f"v{i}") for i in range(5)],
            "g string, v string",
        )
        got = {
            r["g"]: (r["n_seen"], r["est_distinct"])
            for r in kmv_distinct(df, ["g"], "v", k=64).collect()
        }
        assert got["a"] == (17, 17.0)
        assert got["b"] == (5, 5.0)

    def test_error_bound_when_sketch_full(self, spark):
        n_true = 5000
        df = spark.createDataFrame(
            [("g", f"value-{i}") for i in range(n_true)], "g string, v string"
        )
        k = 256
        est = kmv_distinct(df, ["g"], "v", k=k).first()["est_distinct"]
        # ~1/sqrt(k-2) relative error; allow 5 sigma
        assert abs(est - n_true) / n_true < 5.0 / math.sqrt(k - 2)

    def test_partition_invariant_and_duplicate_blind(self, spark):
        base = [("g", f"v{i}") for i in range(1000)]
        a = spark.createDataFrame(base, "g string, v string")
        b = spark.createDataFrame(base * 3, "g string, v string").repartition(
            13
        )
        ra = kmv_distinct(a, ["g"], "v").first()
        rb = kmv_distinct(b, ["g"], "v").first()
        assert (ra["kth_min"], ra["est_distinct"]) == (
            rb["kth_min"], rb["est_distinct"]
        )


class TestQuantiles:
    def test_exact_vs_python(self, spark):
        vals = [float(v) for v in (1, 3, 5, 7, 100)]
        df = spark.createDataFrame(
            [("g", v) for v in vals], "g string, v double"
        )
        got = {
            r["p"]: r["q"]
            for r in grouped_quantiles(
                df, ["g"], "v", probs=(0.5, 0.25)
            ).collect()
        }
        assert got[0.5] == 5.0
        assert got[0.25] == 3.0  # exact rank: (5-1)*0.25 = 1 -> vals[1]

    def test_interpolation(self, spark):
        df = spark.createDataFrame(
            [("g", 1.0), ("g", 2.0)], "g string, v double"
        )
        got = grouped_quantiles(df, ["g"], "v", probs=(0.5,)).first()["q"]
        assert got == 1.5

    def test_approx_close_to_exact(self, spark):
        df = spark.createDataFrame(
            [("g", float((i * 7919) % 10007)) for i in range(10007)],
            "g string, v double",
        )
        exact = {
            r["p"]: r["q"] for r in grouped_quantiles(df, ["g"], "v").collect()
        }
        approx = {
            r["p"]: r["q"]
            for r in grouped_quantiles(df, ["g"], "v", approx=True).collect()
        }
        for p, q in exact.items():
            assert abs(approx[p] - q) <= 0.02 * 10007


class TestAsofVsPandas:
    def test_matches_pandas_merge_asof(self, spark):
        """Independent-oracle property check: our union+window merge-asof
        equals pandas.merge_asof(direction='backward') on a seeded random
        fixture (1000 left x 800 right rows, 23 keys, duplicate-free
        right (key, ts) pairs as the operator contract requires)."""
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(7)
        base = pd.Timestamp("2024-01-01").value // 1000
        left = pd.DataFrame({
            "k": rng.integers(0, 23, 1000),
            "ts": pd.to_datetime(
                base + rng.integers(0, 10**9, 1000), unit="us"
            ),
            "lid": np.arange(1000),
        })
        right = pd.DataFrame({
            "k": rng.integers(0, 23, 800),
            "ts": pd.to_datetime(
                base + rng.integers(0, 10**9, 800), unit="us"
            ),
            "px": rng.random(800).round(6),
        }).drop_duplicates(["k", "ts"])

        expect = pd.merge_asof(
            left.sort_values("ts"), right.sort_values("ts"),
            on="ts", by="k", direction="backward",
        )
        want = {
            (r.k, r.lid): (None if pd.isna(r.px) else r.px)
            for r in expect.itertuples()
        }

        lsp = spark.createDataFrame(left).repartition(7)
        rsp = spark.createDataFrame(right).repartition(3)
        got = {
            (r["k"], r["lid"]): r["r_px"]
            for r in asof_join(
                lsp, rsp, keys=["k"], right_cols=["px"]
            ).collect()
        }
        assert got == want


class TestAsofForward:
    def test_forward_inclusive(self, spark):
        trades = spark.createDataFrame(
            [(1, _ts(10), "t1"), (1, _ts(26), "t2"), (1, _ts(40), "t3")],
            "k long, ts timestamp, tag string",
        )
        quotes = spark.createDataFrame(
            [(1, _ts(10), 100.0), (1, _ts(25), 101.0), (1, _ts(30), 102.0)],
            "k long, ts timestamp, px double",
        )
        out = {
            r["tag"]: r["r_px"]
            for r in asof_join(
                trades, quotes, keys=["k"], right_cols=["px"],
                direction="forward",
            ).collect()
        }
        # t1 matches the ts-equal quote (inclusive); t2 the next at 30;
        # t3 has nothing ahead
        assert out == {"t1": 100.0, "t2": 102.0, "t3": None}

    def test_matches_pandas_forward(self, spark):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(13)
        base = pd.Timestamp("2024-01-01").value // 1000
        left = pd.DataFrame({
            "k": rng.integers(0, 11, 400),
            "ts": pd.to_datetime(base + rng.integers(0, 10**8, 400),
                                 unit="us"),
            "lid": np.arange(400),
        })
        right = pd.DataFrame({
            "k": rng.integers(0, 11, 300),
            "ts": pd.to_datetime(base + rng.integers(0, 10**8, 300),
                                 unit="us"),
            "px": rng.random(300).round(6),
        }).drop_duplicates(["k", "ts"])
        expect = pd.merge_asof(
            left.sort_values("ts"), right.sort_values("ts"),
            on="ts", by="k", direction="forward",
        )
        want = {
            (r.k, r.lid): (None if pd.isna(r.px) else r.px)
            for r in expect.itertuples()
        }
        got = {
            (r["k"], r["lid"]): r["r_px"]
            for r in asof_join(
                spark.createDataFrame(left).repartition(5),
                spark.createDataFrame(right).repartition(3),
                keys=["k"], right_cols=["px"], direction="forward",
            ).collect()
        }
        assert got == want

    def test_bad_direction_raises(self, spark):
        trades = spark.createDataFrame(
            [(1, _ts(0), "x")], "k long, ts timestamp, tag string")
        with pytest.raises(ValueError):
            asof_join(trades, trades, keys=["k"], direction="nearest")


class TestKMVTwoLevel:
    def test_two_level_equals_single_level(self, spark):
        df = spark.createDataFrame(
            [(f"g{i % 3}", f"value-{i % 700}") for i in range(3000)],
            "g string, v string",
        ).repartition(11)
        one = sorted(map(tuple, kmv_distinct(df, ["g"], "v", k=64).collect()))
        two = sorted(map(tuple, kmv_distinct(
            df, ["g"], "v", k=64, n_shards=8).collect()))
        assert one == two


class TestNullSemantics:
    def test_kmv_ignores_null_values(self, spark):
        df = spark.createDataFrame(
            [("g", "a"), ("g", None), ("g", "b"), ("g", None)],
            "g string, v string",
        )
        r = kmv_distinct(df, ["g"], "v", k=16).first()
        assert (r["n_seen"], r["est_distinct"]) == (2, 2.0)

    def test_corpus_report_null_text_counts_as_empty(self, spark):
        from kg.ops.textstats import corpus_report

        df = spark.createDataFrame(
            [(1, None, "s"), (2, None, "s"), (3, "real text here ok", "s")],
            "doc_id long, text string, source string",
        )
        r = corpus_report(df).first()
        # both null docs hash to the empty doc: one keeper, one dup
        assert (r["n_docs"], r["n_dups"]) == (3, 1)


class TestKMVOverlap:
    def test_estimates_close_to_truth_and_shard_invariant(self, spark):
        from kg.ops.sketch import kmv_overlap

        # A = 0..3999, B = 2000..5999 -> |A|=|B|=4000, inter=2000,
        # union=6000, jaccard=1/3
        a = spark.range(0, 4000).select(F.col("id").cast("string").alias("v"))
        b = spark.range(2000, 6000).select(
            F.col("id").cast("string").alias("v")
        )
        r1 = kmv_overlap(a, b, "v", k=256).collect()[0]
        r4 = kmv_overlap(a, b, "v", k=256, n_shards=4).collect()[0]
        assert tuple(r1) == tuple(r4)  # two-level merge is exact
        assert r1.n_a == 256 and r1.n_b == 256  # estimator branch
        assert abs(r1.est_distinct_a - 4000) / 4000 < 0.25
        assert abs(r1.est_intersect - 2000) / 2000 < 0.35
        assert abs(r1.est_union - 6000) / 6000 < 0.25
        assert abs(r1.est_jaccard - 1 / 3) < 0.15

    def test_small_inputs_exact(self, spark):
        from kg.ops.sketch import kmv_overlap

        a = spark.createDataFrame([("x",), ("y",), ("z",)], "v string")
        b = spark.createDataFrame([("y",), ("z",), ("w",)], "v string")
        r = kmv_overlap(a, b, "v", k=256).collect()[0]
        # sketches not full -> exact set algebra
        assert (r.n_a, r.n_b) == (3, 3)
        assert r.est_distinct_a == 3.0 and r.est_intersect == 2.0
        assert r.est_union == 4.0 and r.est_jaccard == 0.5


class TestCountMinSketch:
    def _tokens(self, spark):
        # zipf-ish: token t_i appears (50 - i) times
        rows = [(f"t{i}",) for i in range(40) for _ in range(50 - i)]
        return spark.createDataFrame(rows, "tok string")

    def test_never_underestimates_and_tight_for_heavy(self, spark):
        from kg.ops.sketch import cms_build, cms_estimate

        toks = self._tokens(spark)
        sk = cms_build(toks, "tok", depth=4, width=512)
        probes = spark.createDataFrame(
            [(f"t{i}",) for i in range(40)] + [("absent",)], "key string"
        )
        est = {
            r.key: r.est
            for r in cms_estimate(sk, probes, depth=4, width=512).collect()
        }
        for i in range(40):
            exact = 50 - i
            assert est[f"t{i}"] >= exact
            assert est[f"t{i}"] <= exact + 80  # collision slack at width 512
        assert est["absent"] >= 0

    def test_sketch_is_bounded_and_mergeable(self, spark):
        from kg.ops.sketch import cms_build, cms_estimate

        toks = self._tokens(spark)
        import pyspark.sql.functions as F

        half1 = toks.limit(500)
        sk_all = cms_build(toks, "tok", depth=2, width=128)
        assert sk_all.count() <= 2 * 128
        # monoid: cell-wise sum of the two halves' sketches == whole-corpus
        merged = (
            cms_build(half1, "tok", depth=2, width=128)
            .unionByName(
                cms_build(toks.exceptAll(half1), "tok", depth=2, width=128)
            )
            .groupBy("row", "col").agg(F.sum("n").alias("n"))
        )
        got = {(r.row, r.col): r.n for r in merged.collect()}
        want = {(r.row, r.col): r.n for r in sk_all.collect()}
        assert got == want


class TestDetectBursts:
    def test_trailing_baseline_and_flags(self, spark):
        import datetime as dt

        from kg.ops.events import detect_bursts

        base = dt.datetime(2024, 1, 1)
        rows = []
        # type A: 2 events/hour for 4 hours, then 9 in hour 5 -> burst
        for h in range(4):
            for i in range(2):
                rows.append((f"e{h}{i}", base + dt.timedelta(hours=h, minutes=i), "A"))
        for i in range(9):
            rows.append((f"b{i}", base + dt.timedelta(hours=4, minutes=i), "A"))
        # type B: flat, never bursts
        for h in range(3):
            rows.append((f"x{h}", base + dt.timedelta(hours=h), "B"))
        df = spark.createDataFrame(rows, "event_id string, ts timestamp, event_type string")
        got = {
            (r.event_type, r.window_start.hour): (r.n, r.baseline, r.is_burst)
            for r in detect_bursts(df, trailing=24, factor=3.0).collect()
        }
        assert got[("A", 0)] == (2, None, False)  # no baseline yet
        assert got[("A", 4)] == (9, 2.0, True)    # 9 >= 3*2
        assert all(not v[2] for k, v in got.items() if k[0] == "B")
        assert got[("B", 1)][1] == 1.0


class TestBloomFilter:
    def _values(self, spark, n=400, prefix="m"):
        return spark.createDataFrame(
            [(f"{prefix}{i}",) for i in range(n)], "val string"
        )

    def test_no_false_negatives_and_bounded_fp(self, spark):
        from kg.ops.sketch import bloom_build, bloom_probe

        members = self._values(spark, 400, "m")
        absent = self._values(spark, 2000, "x")
        bl = bloom_build(members, "val", m_bits=1 << 14, k_hashes=4)
        # filter table is bounded by m/32 words regardless of inserts
        assert bl.count() <= (1 << 14) // 32
        got = {
            r.val: r.maybe_present
            for r in bloom_probe(
                members.unionByName(absent), bl, "val",
                m_bits=1 << 14, k_hashes=4,
            ).collect()
        }
        # Bloom guarantee: zero false negatives
        assert all(got[f"m{i}"] for i in range(400))
        # fp rate ~ (1-e^(-kn/m))^k ~ 0.0024 at n=400,m=16384,k=4;
        # give generous slack for hash variance
        fps = sum(1 for i in range(2000) if got[f"x{i}"])
        assert fps / 2000 < 0.02

    def test_merge_is_bitwise_or_monoid(self, spark):
        import pyspark.sql.functions as F
        from kg.ops.sketch import bloom_build

        a = self._values(spark, 200, "a")
        b = self._values(spark, 200, "b")
        whole = bloom_build(a.unionByName(b), "val", m_bits=4096, k_hashes=3)
        merged = (
            bloom_build(a, "val", m_bits=4096, k_hashes=3)
            .unionByName(bloom_build(b, "val", m_bits=4096, k_hashes=3))
            .groupBy("word").agg(F.bit_or("bits").alias("bits"))
        )
        got = {(r.word, r.bits) for r in merged.collect()}
        want = {(r.word, r.bits) for r in whole.collect()}
        assert got == want

    def test_duplicate_inserts_are_absorbed(self, spark):
        from kg.ops.sketch import bloom_build

        vals = self._values(spark, 50)
        once = bloom_build(vals, "val", m_bits=1024, k_hashes=2)
        thrice = bloom_build(
            vals.unionByName(vals).unionByName(vals), "val",
            m_bits=1024, k_hashes=2,
        )
        assert sorted(map(tuple, once.collect())) == sorted(
            map(tuple, thrice.collect())
        )


class TestCmsInnerProduct:
    def test_never_underestimates_and_tight(self, spark):
        import pyspark.sql.functions as F

        from kg.ops.sketch import cms_build, cms_inner_product

        # A: key k appears k times (k=1..40); B: even keys 3x
        a = spark.createDataFrame(
            [(f"k{i}",) for i in range(1, 41) for _ in range(i)],
            "key string",
        )
        b = spark.createDataFrame(
            [(f"k{i}",) for i in range(2, 41, 2) for _ in range(3)],
            "key string",
        )
        exact = sum(i * 3 for i in range(2, 41, 2))
        ska = cms_build(a, "key", depth=4, width=1024)
        skb = cms_build(b, "key", depth=4, width=1024)
        est = cms_inner_product(ska, skb, depth=4).first().est_join_size
        assert est >= exact
        assert est <= exact * 1.2  # width 1024 keeps collision mass low

    def test_disjoint_keys_estimate_small(self, spark):
        from kg.ops.sketch import cms_build, cms_inner_product

        a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "key string")
        b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "key string")
        est = cms_inner_product(
            cms_build(a, "key", depth=4, width=2048),
            cms_build(b, "key", depth=4, width=2048),
            depth=4,
        ).first().est_join_size
        assert 0 <= est <= 5  # only hash-collision mass


class TestTimeDensify:
    def test_gaps_filled_per_group(self, spark):
        import datetime as dt

        from kg.ops.temporal import time_densify

        rows = [
            ("a", dt.datetime(2026, 1, 1, 0), 3),
            ("a", dt.datetime(2026, 1, 1, 3), 2),
            ("b", dt.datetime(2026, 1, 1, 1), 1),
        ]
        b = spark.createDataFrame(
            rows, "k string, bucket_start timestamp, n long"
        )
        got = {
            (r.k, r.bucket_start.hour): (r.n, r.filled)
            for r in time_densify(b, "hour", dims=["k"]).collect()
        }
        # group a spans 0..3 with two gaps; group b is a single bucket
        assert got[("a", 0)] == (3, False)
        assert got[("a", 1)] == (0, True)
        assert got[("a", 2)] == (0, True)
        assert got[("a", 3)] == (2, False)
        assert got[("b", 1)] == (1, False)
        assert len(got) == 5

    def test_rejects_unknown_grain(self, spark):
        import pytest

        from kg.ops.temporal import time_densify

        b = spark.createDataFrame([], "bucket_start timestamp, n long")
        with pytest.raises(ValueError):
            time_densify(b, "fortnight")


class TestHLL:
    def test_error_bound_raw_estimator_branch(self, spark):
        from kg.ops.sketch import hll_distinct

        n_true = 5000
        df = spark.createDataFrame(
            [("g", f"value-{i}") for i in range(n_true)], "g string, v string"
        )
        p = 8  # 256 registers; raw branch engages well above 2.5m=640
        est = hll_distinct(df, ["g"], "v", p=p).first()["est_distinct"]
        # ~1.04/sqrt(m) relative error; allow 5 sigma
        assert abs(est - n_true) / n_true < 5 * 1.04 / math.sqrt(1 << p)

    def test_linear_counting_branch_small_groups(self, spark):
        from kg.ops.sketch import hll_distinct

        df = spark.createDataFrame(
            [("a", f"v{i % 17}") for i in range(100)]
            + [("b", f"v{i}") for i in range(5)],
            "g string, v string",
        )
        got = {
            r["g"]: (r["est_distinct"], r["n_registers_hit"])
            for r in hll_distinct(df, ["g"], "v", p=12).collect()
        }
        # linear counting at tiny cardinality vs m=4096 registers is
        # near-exact (no register collisions -> m*ln(m/(m-n)) ~ n)
        assert abs(got["a"][0] - 17) < 1.0 and got["a"][1] == 17
        assert abs(got["b"][0] - 5) < 1.0 and got["b"][1] == 5

    def test_merge_equals_sketch_of_union(self, spark):
        from kg.ops.sketch import (
            hll_distinct,
            hll_estimate,
            hll_merge,
            hll_registers,
        )

        rows_a = [("g", f"a{i}") for i in range(800)]
        rows_b = [("g", f"b{i}") for i in range(600)]
        # overlapping values between the two halves must count once
        rows_b += rows_a[:200]
        a = spark.createDataFrame(rows_a, "g string, v string")
        b = spark.createDataFrame(rows_b, "g string, v string")
        both = a.union(b)
        merged = hll_estimate(
            hll_merge(
                hll_registers(a, ["g"], "v", p=6),
                hll_registers(b, ["g"], "v", p=6),
                ["g"],
            ),
            ["g"],
            p=6,
        ).first()
        direct = hll_distinct(both, ["g"], "v", p=6).first()
        assert (merged["sum_scaled"], merged["est_distinct"]) == (
            direct["sum_scaled"], direct["est_distinct"]
        )

    def test_partition_and_duplicate_invariant(self, spark):
        from kg.ops.sketch import hll_distinct

        base = [("g", f"v{i}") for i in range(1000)]
        a = spark.createDataFrame(base, "g string, v string")
        b = spark.createDataFrame(base * 3, "g string, v string").repartition(
            13
        )
        ra = hll_distinct(a, ["g"], "v").first()
        rb = hll_distinct(b, ["g"], "v").first()
        assert (ra["sum_scaled"], ra["est_distinct"]) == (
            rb["sum_scaled"], rb["est_distinct"]
        )

    def test_nulls_not_counted(self, spark):
        from kg.ops.sketch import hll_distinct

        df = spark.createDataFrame(
            [("g", "x"), ("g", None), ("g", "y")], "g string, v string"
        )
        r = hll_distinct(df, ["g"], "v", p=12).first()
        assert r["n_registers_hit"] == 2


class TestChangepoint:
    def test_detects_planted_level_shift(self, spark):
        from kg.ops.events import mean_shift_changepoint

        # 48 hourly buckets: value 1.00 for the first 24, 9.00 after —
        # the CUSUM argmax must land on the last low bucket
        rows = []
        for h in range(48):
            v = 1.0 if h < 24 else 9.0
            rows.append((h, _ts(h * 60), "click", v))
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string,"
            " value double"
        )
        r = mean_shift_changepoint(events, grain="hour").first()
        assert r["n_buckets"] == 48
        assert r["cp_bucket"].hour == 23
        # dev at the true split: |48*2400 - 24*(2400+21600)| = 460800
        assert r["dev_scaled"] == 460800

    def test_tie_breaks_to_earliest_bucket(self, spark):
        from kg.ops.events import mean_shift_changepoint

        # symmetric series 1, 5, 1: splits after bucket 0 and after
        # bucket 1 tie on |3*100-1*700| = |3*600-2*700| = 400
        rows = [(0, _ts(0), "x", 1.0), (1, _ts(60), "x", 5.0),
                (2, _ts(120), "x", 1.0)]
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string,"
            " value double"
        )
        r = mean_shift_changepoint(events, grain="hour").first()
        assert r["dev_scaled"] == 400
        assert r["cp_bucket"].hour == 0

    def test_flat_series_zero_deviation(self, spark):
        from kg.ops.events import mean_shift_changepoint

        rows = [(i, _ts(i * 60), "x", 2.5) for i in range(6)]
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string,"
            " value double"
        )
        r = mean_shift_changepoint(events, grain="hour").first()
        assert r["dev_scaled"] == 0 and r["rel_dev"] == 0.0


class TestSequencePatternMatches:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
            " event_type string"
        )

    def test_runs_and_adjacency(self, spark):
        from kg.ops.events import sequence_pattern_matches

        rows = [
            (1, _ts(0), 10, "view"), (2, _ts(1), 10, "error"),
            (3, _ts(2), 10, "error"), (4, _ts(3), 10, "click"),
            (5, _ts(4), 10, "error"),
            (6, _ts(0), 20, "view"), (7, _ts(1), 20, "purchase"),
        ]
        codes = {"view": "v", "click": "c", "purchase": "p", "error": "e"}
        got = {
            r["user_id"]: (r["n_matches"], r["first_pos"], r["matches"])
            for r in sequence_pattern_matches(
                self._events(spark, rows), "ee+", codes
            ).collect()
        }
        # user 10 codes to 'veece': one 'ee' run starting at position 2
        assert got == {10: (1, 2, "ee")}

    def test_unmapped_types_do_not_break_adjacency(self, spark):
        from kg.ops.events import sequence_pattern_matches

        rows = [
            (1, _ts(0), 1, "view"), (2, _ts(1), 1, "signup"),
            (3, _ts(2), 1, "purchase"),
        ]
        # signup not coded -> sequence is 'vp', adjacency preserved
        got = sequence_pattern_matches(
            self._events(spark, rows), "vp",
            {"view": "v", "purchase": "p"},
        ).collect()
        assert len(got) == 1 and got[0]["matches"] == "vp"

    def test_nonoverlapping_left_to_right(self, spark):
        from kg.ops.events import sequence_pattern_matches

        rows = [
            (i, _ts(i), 1, "error") for i in range(5)
        ]
        got = sequence_pattern_matches(
            self._events(spark, rows), "ee", {"error": "e"}
        ).first()
        # 'eeeee' -> matches at 1-2 and 3-4; the 5th e is unpaired
        assert got["n_matches"] == 2 and got["first_pos"] == 1

    def test_order_ties_break_on_event_id(self, spark):
        from kg.ops.events import sequence_pattern_matches

        rows = [
            (2, _ts(0), 1, "click"),
            (1, _ts(0), 1, "view"),  # same ts: event_id orders v first
        ]
        got = sequence_pattern_matches(
            self._events(spark, rows), "vc", {"view": "v", "click": "c"}
        ).collect()
        assert len(got) == 1


class TestRobustOutliers:
    def test_known_median_mad_and_flags(self, spark):
        from kg.ops.events import robust_outliers

        # values 1..9 plus one wild point 1000:
        # median = 5.5, adevs around it; flags only the wild point
        rows = [(i, _ts(i), "x", float(v)) for i, v in
                enumerate(list(range(1, 10)) + [1000])]
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string,"
            " value double"
        )
        r = robust_outliers(events, k=3.5).first()
        assert r["n"] == 10
        assert r["median"] == 5.5
        # adevs: 4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5 -> MAD 2.5
        assert r["mad"] == 2.5
        assert r["n_outliers"] == 1

    def test_mean_zscore_would_mask_what_mad_catches(self, spark):
        from kg.ops.events import robust_outliers

        # two huge points inflate the stddev enough that a 3-sigma rule
        # misses them both being "typical"; MAD stays anchored
        vals = [10.0] * 20 + [10000.0, 10001.0]
        rows = [(i, _ts(i), "x", v) for i, v in enumerate(vals)]
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string,"
            " value double"
        )
        r = robust_outliers(events).first()
        assert r["mad"] == 0.0
        assert r["n_outliers"] == 2  # strict > with k*0 flags deviants

    def test_per_type_independence(self, spark):
        from kg.ops.events import robust_outliers

        rows = [(i, _ts(i), "a", float(i % 5)) for i in range(20)]
        rows += [(100 + i, _ts(i), "b", 1000.0 + (i % 3)) for i in range(9)]
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string,"
            " value double"
        )
        got = {r["event_type"]: r for r in robust_outliers(events).collect()}
        assert set(got) == {"a", "b"}
        assert got["b"]["median"] == 1001.0


class TestWinsorize:
    def test_clip_values_and_flags(self, spark):
        from kg.ops.events import winsorize

        rows = [(i, _ts(i), "x", float(v)) for i, v in
                enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])]
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string,"
            " value double"
        )
        out = winsorize(events, lo=0.1, hi=0.9).collect()
        by_val = {r["value"]: r for r in out}
        # 10 values: q10 = 1.9, q90 = 9*0.1 interp -> values 1 and 100 clip
        assert by_val[1.0]["clipped"] and by_val[1.0]["value_w"] == by_val[1.0]["v_lo"]
        assert by_val[100.0]["clipped"] and by_val[100.0]["value_w"] == by_val[100.0]["v_hi"]
        assert not by_val[5.0]["clipped"] and by_val[5.0]["value_w"] == 5.0
        # clipped rows carry EXACTLY the bound
        assert all(
            r["v_lo"] <= r["value_w"] <= r["v_hi"] for r in out
        )

    def test_validation(self, spark):
        from kg.ops.events import winsorize

        events = spark.createDataFrame(
            [(1, _ts(0), "x", 1.0)],
            "event_id long, ts timestamp, event_type string, value double",
        )
        with pytest.raises(ValueError):
            winsorize(events, lo=0.9, hi=0.1)

    def test_groups_clip_independently(self, spark):
        from kg.ops.events import winsorize

        rows = [(i, _ts(i), "a", float(i)) for i in range(10)]
        rows += [(100 + i, _ts(i), "b", 1000.0 + i) for i in range(10)]
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string,"
            " value double"
        )
        out = winsorize(events, lo=0.2, hi=0.8).collect()
        for r in out:
            if r["event_type"] == "a":
                assert r["v_hi"] < 10
            else:
                assert r["v_lo"] > 999
