"""O18: detector-backend registry — lazy per-worker singletons keyed by
(backend, lang, minimal_mode, generation), runtime registration, reload."""

from __future__ import annotations

import pytest

import kg.backends as kb
from kg.backends import (
    RuleBackend,
    UnknownLanguageError,
    get_backend_cached,
    register_backend,
    reload_backends,
    resolve_backend,
)


def test_resolve_unknown_backend_fails_fast():
    with pytest.raises(KeyError, match="unknown detector backend"):
        resolve_backend("no-such-backend")


def test_rule_backend_unknown_lang_raises():
    with pytest.raises(UnknownLanguageError):
        RuleBackend("tlh")


def test_worker_cache_singleton_and_reload_invalidation():
    factory, gen = resolve_backend("rule")
    a = get_backend_cached("rule", factory, "en", False, gen)
    b = get_backend_cached("rule", factory, "en", False, gen)
    assert a is b  # lazy singleton per key
    c = get_backend_cached("rule", factory, "en", True, gen)
    assert c is not a  # minimal mode is part of the key
    new_gen = reload_backends()
    assert new_gen != gen
    d = get_backend_cached("rule", factory, "en", False, new_gen)
    assert d is not a  # reload -> fresh instance
    # stale generation entry evicted (memory release on model swap)
    assert ("rule", "en", False, gen) not in kb._CACHE


def test_minimal_mode_skips_heuristics_keeps_gazetteer():
    text = "Dr Jane Doe visited Acme Corporation in London."
    full = {(m.value, m.label) for m in RuleBackend("en", False).detect(text)}
    minimal = {(m.value, m.label) for m in RuleBackend("en", True).detect(text)}
    assert ("Jane Doe", "PERSON") in full  # title heuristic
    assert ("Jane Doe", "PERSON") not in minimal
    assert ("Acme Corporation", "ORG") in minimal  # gazetteer survives
    assert ("London", "GPE") in minimal


def test_backend_selection_on_executors(spark):
    from kg.stages.triples import detect_ner_mentions

    docs = spark.createDataFrame(
        [("u1", "Acme Corporation opened in London.", "en")],
        "url string, text string, lang string",
    )

    # factory + class are defined INSIDE the test so cloudpickle ships them
    # by value (the tests module is not importable on executor workers) —
    # the same route a user's custom backend module-on-the-PYTHONPATH or
    # spark-submit --py-files would take in production
    def static_factory(lang, minimal):
        class StaticBackend:
            def detect(self, text, lang="en", custom_entities=None):
                from kg.detect import Mention

                out = []
                low = text.lower()
                start = 0
                while (i := low.find("acme", start)) >= 0:
                    out.append(
                        Mention("acme", "ORG", "sys.organization", i, i + 4)
                    )
                    start = i + 4
                return out

        return StaticBackend()

    register_backend("static", static_factory)
    rule_rows = {
        (r["value"], r["label"]) for r in detect_ner_mentions(docs).collect()
    }
    static_rows = {
        (r["value"], r["label"])
        for r in detect_ner_mentions(docs, backend="static").collect()
    }
    assert ("London", "GPE") in rule_rows
    assert static_rows == {("acme", "ORG")}
    # minimal mode rides through the executor path too
    minimal_rows = {
        (r["value"], r["label"])
        for r in detect_ner_mentions(docs, minimal_mode=True).collect()
    }
    assert ("Acme Corporation", "ORG") in minimal_rows


def test_unsupported_lang_fails_the_stage(spark):
    from kg.stages.triples import detect_ner_mentions

    docs = spark.createDataFrame(
        [("u1", "some text", "tlh")], "url string, text string, lang string"
    )
    with pytest.raises(Exception, match="no detector resources"):
        detect_ner_mentions(docs).collect()


def test_eviction_is_monotonic_during_reload_rollout():
    """While old-plan and new-plan tasks interleave on a worker, a lookup
    from an OLDER generation must not evict the newer generation's entry
    (they would otherwise evict each other per batch)."""
    factory, _ = resolve_backend("rule")
    kb._CACHE.clear()
    new = get_backend_cached("rule", factory, "en", False, 7)
    old = get_backend_cached("rule", factory, "en", False, 5)  # straggler task
    assert ("rule", "en", False, 7) in kb._CACHE  # newer entry SURVIVES
    assert get_backend_cached("rule", factory, "en", False, 7) is new
    assert get_backend_cached("rule", factory, "en", False, 5) is old
    # a newer generation evicts every older one for the same (name, lang, mode)
    get_backend_cached("rule", factory, "en", False, 9)
    assert ("rule", "en", False, 5) not in kb._CACHE
    assert ("rule", "en", False, 7) not in kb._CACHE
    assert ("rule", "en", False, 9) in kb._CACHE
