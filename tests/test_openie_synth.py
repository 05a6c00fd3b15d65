"""OpenIE extractor + synthetic corpus determinism tests."""

from __future__ import annotations

from kg.openie import extract_triples
from kg.synth import expected_mentions, expected_triples, gen_pages


def test_svo_basic():
    assert extract_triples("Ada Lovelace founded Acme Corporation.") == [
        ("Ada Lovelace", "founded", "Acme Corporation")
    ]


def test_svo_article_stripping_and_multi_sentence():
    text = "The Acme Corp acquired Globex. Alan Turing was born in London."
    assert extract_triples(text) == [
        ("Acme Corp", "acquired", "Globex"),
        ("Alan Turing", "born_in", "London"),
    ]


def test_svo_garbage_guard():
    assert extract_triples("x " * 50 + "founded " + "y " * 50) == []


def test_svo_no_match():
    assert extract_triples("Nothing interesting happened on the way home") == []


def test_corpus_deterministic():
    a = gen_pages(50, seed=42)
    b = gen_pages(50, seed=42)
    assert a.equals(b)
    assert not a.equals(gen_pages(50, seed=43))


def test_goldens_nonempty():
    pages = gen_pages(300, seed=42)
    em = expected_mentions(pages)
    et = expected_triples(pages)
    assert len(em) > 50
    assert len(et) > 50
    assert set(em.columns) == {"url", "matched_word", "entity_name", "detector"}
    assert set(et.columns) == {"url", "subj", "pred", "obj"}


def test_annotate_pages_matches_unfused_operators(spark):
    """The fused single-pass annotation must equal each unfused operator
    exactly (triples, NER mentions, token pipeline)."""
    from pyspark.sql import functions as F

    from kg.stages.extract import extract_docs
    from kg.stages.triples import (
        annotate_pages,
        detect_ner_mentions,
        extract_svo_triples,
        tokenize_docs,
    )

    pages = spark.read.parquet("/root/repo/fixtures/pages_tiny.parquet").limit(30)
    ann = annotate_pages(pages).cache()

    docs = extract_docs(pages).select("url", "text", "lang")
    fused_triples = {
        tuple(r)
        for r in ann.select(
            "url", F.explode("triples").alias("t")
        ).select("url", "t.subj", "t.pred", "t.obj").collect()
    }
    unfused_triples = {
        tuple(r)
        for r in extract_svo_triples(docs).select(
            "url", "subj", "pred", "obj"
        ).collect()
    }
    assert fused_triples == unfused_triples

    fused_mentions = {
        tuple(r)
        for r in ann.select("url", F.explode("mentions").alias("m")).select(
            "url", "m.value", "m.label", "m.category", "m.start", "m.end"
        ).collect()
    }
    unfused_mentions = {tuple(r) for r in detect_ner_mentions(docs).collect()}
    assert fused_mentions == unfused_mentions

    fused_tokens = {
        (r["url"], tuple(r["tokens"])) for r in ann.select("url", "tokens").collect()
    }
    unfused_tokens = {
        (r["url"], tuple(r["tokens"]))
        for r in tokenize_docs(docs, filter_ents=True, sw_size="large").collect()
    }
    assert fused_tokens == unfused_tokens
    ann.unpersist()


class TestPolarExtraction:
    def test_negations_become_negative_facts(self):
        from kg.openie import extract_triples, extract_triples_polar

        t = ("Acme never acquired Globex. Acme acquired Initech. "
             "Bob is not the CEO of Acme. Eve does not work for Globex. "
             "Initech did not acquire Acme.")
        got = extract_triples_polar(t)
        assert got == [
            ("Acme", "acquired", "Globex", -1),
            ("Acme", "acquired", "Initech", 1),
            ("Bob", "ceo_of", "Acme", -1),
            ("Eve", "works_for", "Globex", -1),
            ("Initech", "acquired", "Acme", -1),
        ]
        # the positive extractor corrupts the first sentence instead
        assert ("Acme never", "acquired", "Globex") in extract_triples(t)

    def test_positive_arm_agrees_on_negation_free_text(self):
        from kg import synth
        from kg.openie import extract_triples, extract_triples_polar

        pages = synth.gen_pages(60, seed=11)
        for text in pages["text"]:
            pos = extract_triples(text)
            polar = extract_triples_polar(text)
            assert all(p == 1 for *_, p in polar)
            assert [(s, p, o) for s, p, o, _ in polar] == pos
