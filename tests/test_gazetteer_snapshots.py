"""Versioned gazetteer snapshots: the reference's v2 stateful lifecycle
(populate -> check -> delete -> check -> reset, per
/root/reference/src/tests/test_entity_server.py:160-195 semantics) replayed
against immutable table versions."""

from __future__ import annotations

from kg.gazetteer import GazetteerSnapshots


def _docs(spark):
    return spark.createDataFrame(
        [("u1", "I want a Diet Coke and chocolate cake"),
         ("u2", "nothing here")],
        "url string, text string",
    )


def test_v2_lifecycle(spark, tmp_path):
    store = GazetteerSnapshots(spark, str(tmp_path / "gaz"))
    assert store.latest_version() == 0
    assert store.check(_docs(spark)).count() == 0  # empty dictionary

    v1 = store.populate({"Drinks": ["Diet Coke", "tea"], "Cakes": ["chocolate cake"]})
    assert v1 == 1
    got = {
        (r["matched_word"], r["entity_name"])
        for r in store.check(_docs(spark)).collect()
    }
    assert got == {("Diet Coke", "Drinks"), ("chocolate cake", "Cakes")}

    # populate REPLACES a name wholesale (server.py:156): Drinks loses tea
    store.populate({"Drinks": ["coffee"]})
    vals = {
        r["value_norm"]
        for r in store.read().where("entity_name = 'Drinks'").collect()
    }
    assert vals == {"coffee"}

    v3 = store.delete(["Cakes"])
    assert store.read(v3).where("entity_name = 'Cakes'").count() == 0
    # old versions remain readable (time travel)
    assert store.read(1).where("entity_name = 'Cakes'").count() == 1

    store.reset()
    assert store.check(_docs(spark)).count() == 0
    assert store.latest_version() == 4
