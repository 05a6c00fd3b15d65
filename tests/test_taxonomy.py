"""Hearst-pattern mining (kg/ops/taxonomy.py): regex robustness on noisy
text and induce_taxonomy evidence/primary semantics — the cases the
roundtrip contract query (clean generated sentences) doesn't reach."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg.ops.taxonomy import hearst_pairs, induce_taxonomy


def _docs(spark, *texts: str):
    return spark.createDataFrame(
        [(f"u{i}", t) for i, t in enumerate(texts)], "url string, text string"
    )


def _pairs(df):
    return sorted(
        map(tuple, df.select("url", "hypo", "hyper", "pattern").collect())
    )


class TestHearstPairs:
    def test_four_patterns_multiword_and_lists(self, spark):
        got = _pairs(
            hearst_pairs(
                _docs(
                    spark,
                    "We tried drinks such as Red Wine, Diet Coke and "
                    "White Wine yesterday.",
                    "Many cities, including Berlin and Paris, grew fast.",
                    "Acme, Globex or other companies may bid.",
                    "I love cakes, especially Carrot Cake.",
                )
            )
        )
        assert got == [
            ("u0", "Diet Coke", "drinks", "such_as"),
            ("u0", "Red Wine", "drinks", "such_as"),
            ("u0", "White Wine", "drinks", "such_as"),
            ("u1", "Berlin", "cities", "including"),
            ("u1", "Paris", "cities", "including"),
            ("u2", "Acme", "companies", "and_other"),
            ("u2", "Globex", "companies", "and_other"),
            ("u3", "Carrot Cake", "cakes", "especially"),
        ]

    def test_no_false_positives_on_plain_text(self, spark):
        df = hearst_pairs(
            _docs(
                spark,
                "such as nothing capitalized follows here.",
                "lowercase and other lowercase words.",
                "No pattern in this sentence at all.",
                "Marie Curie discovered Polonium.",
            )
        )
        assert df.count() == 0

    def test_occurrences_counted_not_deduped(self, spark):
        df = hearst_pairs(
            _docs(
                spark,
                "metals such as Iron. Alloys need metals such as Iron.",
            )
        )
        assert df.count() == 2  # one per occurrence — evidence, not sets

    def test_sentence_boundary_stops_list(self, spark):
        got = _pairs(
            hearst_pairs(
                _docs(spark, "fruits such as Apple. Banana is yellow.")
            )
        )
        assert got == [("u0", "Apple", "fruits", "such_as")]


class TestInduceTaxonomy:
    def test_min_evidence_and_primary_argmax(self, spark):
        rows = (
            [("u", "Iron", "metals", "such_as")] * 3
            + [("u", "Iron", "elements", "such_as")] * 2
            + [("u", "Iron", "things", "and_other")] * 1
        )
        df = spark.createDataFrame(
            rows, "url string, hypo string, hyper string, pattern string"
        )
        got = {
            r["hyper"]: (r["n_evidence"], r["is_primary"])
            for r in induce_taxonomy(df, min_evidence=2).collect()
        }
        assert got == {"metals": (3, True), "elements": (2, False)}

    def test_primary_tie_breaks_lexicographically(self, spark):
        rows = [
            ("u", "Iron", "metals", "p"),
            ("u", "Iron", "elements", "p"),
        ]
        df = spark.createDataFrame(
            rows, "url string, hypo string, hyper string, pattern string"
        )
        got = {
            r["hyper"]: r["is_primary"]
            for r in induce_taxonomy(df, min_evidence=1).collect()
        }
        assert got == {"elements": True, "metals": False}


def test_hearst_pure_map_no_shuffle_no_python(spark):
    docs = _docs(spark, "metals such as Iron.")
    p = (
        hearst_pairs(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in p
    assert "MapInPandas" not in p and "BatchEvalPython" not in p


def test_induce_no_window_partial_agg(spark):
    df = spark.createDataFrame(
        [("u", "Iron", "metals", "p")],
        "url string, hypo string, hyper string, pattern string",
    )
    p = (
        induce_taxonomy(df, min_evidence=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in p
    assert "partial_count" in p or "HashAggregate" in p
