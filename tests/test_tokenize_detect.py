"""Tokenizer (O5-O9) and detector (O1-O4) semantics tests.

Ports the reference tokenizing expectations (reference:
src/tests/test_tokenizing.py:16-65) onto the deterministic backend, plus the
custom-matcher overlap-resolution rule (spacy_wrapper.py:118-153) and
category-map drop (named_entity.py; test_entity_recognition.py:85-87).
"""

from __future__ import annotations

from kg.detect import detect, match_custom_patterns, resolve_overlaps, word_tokens
from kg.tokenize import is_numberish, lemmatize, tokenize


# ---- O6: Python float() parseability, exact ----

def test_numberish_accepts_float_syntax():
    for s in ["12345", "123.45", "1e3", "+1", "-2.5", "inf", "nan", " 12 "]:
        assert is_numberish(s), s


def test_numberish_rejects():
    for s in ["1,234.50", "12a", "", "one", "12.3.4"]:
        assert not is_numberish(s), s


# ---- tokenize pipeline goldens (reference test_tokenizing.py shapes) ----

def test_tokenize_hi():
    assert tokenize("hi", filter_ents=True, sw_size="small") == ["hi"]


def test_tokenize_person_filter_keeps_rest():
    # "Fred Bloggs rules OK" -> person dropped, lemmas kept
    assert tokenize("Fred Bloggs rules OK", filter_ents=True) == ["rule", "ok"]


def test_tokenize_number_dropped():
    assert tokenize("set alarm 12345", filter_ents=True) == ["set", "alarm"]


def test_tokenize_num_fallback():
    assert tokenize("12345", filter_ents=True) == ["NUM"]
    assert tokenize("123.45", filter_ents=True) == ["NUM"]


def test_tokenize_comma_number_kept():
    # "1,234.50" is NOT float()-parseable so it survives the number filter
    assert tokenize("1,234.50", filter_ents=True) == ["1,234.50"]


def test_tokenize_person_fallback():
    assert tokenize("Fred Bloggs", filter_ents=True) == ["PERSON"]


def test_tokenize_unk_on_empty():
    assert tokenize("...", filter_ents=False) == ["UNK"]


def test_tokenize_stopword_tiers():
    text = "why is the cake here"
    small = tokenize(text, sw_size="small")
    large = tokenize(text, sw_size="large")
    xlarge = tokenize(text, sw_size="xlarge")
    assert "the" in small  # en SMALL list is empty
    assert "why" in large and "the" not in large  # wh-words survive LARGE
    assert "why" not in xlarge  # but not XLARGE


def test_lemmatize_rules():
    assert lemmatize("rules") == "rule"
    assert lemmatize("OK") == "ok"
    assert lemmatize("was") == "be"
    assert lemmatize("running") == "run"
    assert lemmatize("cities") == "city"


# ---- detector (O1/O2): category mapping + drop-unmapped ----

def test_detect_money_excludes_sign():
    ms = detect("I paid $23.79 yesterday")
    money = [m for m in ms if m.category == "sys.number"]
    assert money and money[0].value == "23.79"


def test_detect_event_dropped():
    # EVENT has no category mapping -> dropped (O2)
    ms = detect("World War 1 started long ago")
    assert all(m.label != "EVENT" for m in ms)
    # but the year-like token inside may be claimed by the EVENT span, and
    # "long ago" matches nothing — key point is no EVENT-labelled output.


def test_detect_gpe_and_person():
    ms = detect("Who is Sherlock Holmes from London")
    by_label = {m.label: m for m in ms}
    assert by_label["PERSON"].value == "Sherlock Holmes"
    assert by_label["PERSON"].category == "sys.person"
    assert by_label["GPE"].value == "London"
    assert by_label["GPE"].category == "sys.places"


def test_detect_percent_and_date():
    ms = detect("Sales rose 12.5% on 3rd May 2018")
    labels = {m.label for m in ms}
    assert "PERCENT" in labels and "DATE" in labels


# ---- O3/O4: custom matcher + overlap resolution ----

def test_custom_match_case_insensitive_tokens():
    toks = word_tokens("i drink DIET coke daily")
    cands = match_custom_patterns(toks, {"Diet Coke": "drinks"})
    assert cands == [("drinks", 2, 4)]


def test_overlap_longer_existing_wins():
    text = "Sherlock Holmes investigates"
    toks = word_tokens(text)
    existing = detect(text)  # Sherlock Holmes PERSON, 2 tokens
    cands = match_custom_patterns(toks, {"Holmes": "det"})  # 1 token candidate
    resolved = resolve_overlaps(text, existing, cands, toks)
    assert any(m.label == "PERSON" for m in resolved)
    assert all(m.label != "custom_entity" for m in resolved)


def test_overlap_tie_candidate_wins():
    text = "Sherlock Holmes investigates"
    toks = word_tokens(text)
    existing = detect(text)
    cands = match_custom_patterns(toks, {"sherlock holmes": "det"})  # same length
    resolved = resolve_overlaps(text, existing, cands, toks)
    assert any(m.label == "custom_entity" for m in resolved)
    assert all(m.label != "PERSON" for m in resolved)


def test_overlap_longer_candidate_replaces():
    text = "visit New York today"
    toks = word_tokens(text)
    existing = detect(text)  # New York GPE
    cands = match_custom_patterns(toks, {"visit new york": "trip"})  # longer
    resolved = resolve_overlaps(text, existing, cands, toks)
    assert any(m.label == "custom_entity" for m in resolved)
    assert all(m.label != "GPE" for m in resolved)
