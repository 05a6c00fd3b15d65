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
