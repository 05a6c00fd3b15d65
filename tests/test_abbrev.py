"""Abbreviation mining (kg/ops/abbrev.py): strict-initialism validation,
evidence rollup, and the all-JVM plan shape."""

from __future__ import annotations

from kg.ops.abbrev import abbrev_aliases, abbrev_candidates


def _docs(spark):
    return spark.createDataFrame(
        [
            ("u1", "The World Health Organization (WHO) said the "
                   "United Nations (UN) agreed."),
            ("u2", "The World Health Organization (WHO) and other bodies "
                   "met. A deep neural network (95%) is not a definition. "
                   "The North Atlantic Treaty Organization (NATO) too."),
            ("u3", "Wrong initials: the Global Trade Body (WTO) is "
                   "rejected. Single (X) too short for the shape."),
            ("u4", "Parens at start (ABC) with no words. "
                   "Hyphenated Big-Data Analytics Lab (BAL) passes."),
        ],
        "url string, text string",
    )


def test_candidates_validate_initials(spark):
    got = {
        (r.url, r.abbr, r.long_form)
        for r in abbrev_candidates(_docs(spark)).collect()
    }
    assert got == {
        ("u1", "WHO", "World Health Organization"),
        ("u1", "UN", "United Nations"),
        ("u2", "WHO", "World Health Organization"),
        ("u2", "NATO", "North Atlantic Treaty Organization"),
        ("u4", "BAL", "Big-Data Analytics Lab"),
    }


def test_aliases_rollup_counts_docs_and_refs(spark):
    rows = {
        r.abbr: (r.long_form, r.n_refs, r.n_docs)
        for r in abbrev_aliases(_docs(spark)).collect()
    }
    assert rows["WHO"] == ("World Health Organization", 2, 2)
    assert rows["UN"] == ("United Nations", 1, 1)
    # min_docs gate drops single-doc pairs
    multi = abbrev_aliases(_docs(spark), min_docs=2)
    assert [r.abbr for r in multi.collect()] == ["WHO"]


def test_candidates_plan_is_jvm_only(spark):
    p = abbrev_candidates(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in p
