"""Basic-graph-pattern matching (kg/query.py)."""

from __future__ import annotations

import pytest

from kg.query import match_pattern

FACTS = [
    (1, "ceo_of", 10), (10, "located_in", 100), (1, "born_in", 100),
    (2, "ceo_of", 11), (11, "located_in", 101), (2, "born_in", 102),
    (3, "knows", 3), (4, "knows", 5),
]


@pytest.fixture(scope="module")
def facts(spark):
    return spark.createDataFrame(
        FACTS, "subj_id long, pred string, obj_id long"
    ).repartition(5)


class TestMatchPattern:
    def test_cyclic_conjunction(self, facts):
        out = match_pattern(facts, [
            ("?x", "ceo_of", "?y"),
            ("?y", "located_in", "?z"),
            ("?x", "born_in", "?z"),
        ]).select("x", "y", "z").collect()
        assert [tuple(r) for r in out] == [(1, 10, 100)]

    def test_intra_atom_repeat_is_equality(self, facts):
        out = match_pattern(facts, [("?x", "knows", "?x")]).collect()
        assert [r.x for r in out] == [3]

    def test_literal_constraints_and_var_pred(self, facts):
        out = match_pattern(facts, [(1, "?p", "?o")]).collect()
        assert sorted((r.p, r.o) for r in out) == [
            ("born_in", 100), ("ceo_of", 10)]

    def test_distinct_bindings_partition_invariant(self, spark):
        dup = spark.createDataFrame(
            FACTS + FACTS, "subj_id long, pred string, obj_id long"
        )
        out = match_pattern(dup, [("?x", "ceo_of", "?y")]).collect()
        assert len(out) == 2  # set semantics despite duplicate facts

    def test_cartesian_rejected_and_validation(self, facts):
        with pytest.raises(ValueError):
            match_pattern(facts, [("?x", "ceo_of", "?y"),
                                  ("?a", "knows", "?b")])
        with pytest.raises(ValueError):
            match_pattern(facts, [])
