"""Ported reference finder semantics tests (27 cases) against kg.oracle.

Direct ports of /root/reference/src/tests/test_entity_finder.py (12 tests),
test_legacy_entity_finder.py (15 tests), plus the regex-vs-value priority
cases from test_entity_server.py:109-158. These validate that the single-node
oracle reproduces the reference's pinned matching semantics; the Spark
pipeline is then tested against the oracle (tests/test_mentions_spark.py).
"""

from __future__ import annotations

import pytest

from kg.normalize import ngram_spans
from kg.oracle import (
    BadRegexError,
    build_gazetteer,
    compile_regexes,
    find_entities,
)

CAKE_VALUES = {
    "CakeSize": ["Large", "Medium", "Tiny"],
    "CakeType": ["Carrot", "Chocolate", "Coffee", "Sponge"],
    "Drinks": ["Coffee", "Beer", "Red Wine", "White Wine", "Coke", "Diet Coke"],
    "Biscuit": ["Rich Tea", "Digestive", "Chocolate"],
}

CAKE_REGEX = {"CakeSizeRegex": "^[Ll].+$", "CakeTypeRegex": "^[Cc].+$"}


def gaz():
    return build_gazetteer(CAKE_VALUES)


def rx():
    return compile_regexes(CAKE_REGEX)


# ---- shared value-matching semantics (both finder variants in the reference
# implement these identically; one oracle covers both) ----


def test_basic():
    m = find_entities("I want a Carrot cake", gaz())
    assert m["Carrot"] == ["CakeType"]


def test_no_entities():
    assert find_entities("I want a Carrot cake", build_gazetteer({})) == {}


def test_no_matches():
    assert find_entities("I want a cake", gaz()) == {}


def test_multiple_matches_deduped():
    m = find_entities("I want a Carrot cake and then more carrot cake", gaz())
    assert m["Carrot"] == ["CakeType"]


def test_substring_matches_longest_wins():
    m = find_entities("I want a Diet Coke", gaz())
    assert len(m) == 1
    assert m["Diet Coke"] == ["Drinks"]


def test_duplicate_matches_two_entities_same_word():
    m = find_entities("I want a chocolate cake and a chocolate biscuit", gaz())
    assert len(m["chocolate"]) == 2
    assert "CakeType" in m["chocolate"]
    assert "Biscuit" in m["chocolate"]


def test_multiple_value_matches():
    m = find_entities("I want a Carrot cake and then a beer to drink", gaz())
    assert m["Carrot"] == ["CakeType"]
    assert m["beer"] == ["Drinks"]


def test_case_insensitive():
    m = find_entities("I want a carrot cake", gaz())
    assert m["carrot"] == ["CakeType"]


def test_ignore_punctuation():
    m = find_entities("I want a cake, maybe carrot?", gaz())
    assert m["carrot"] == ["CakeType"]


def test_multi_word_values():
    m = find_entities("I want some red wine and a cake", gaz())
    assert m["red wine"] == ["Drinks"]


def test_delete_entity_dictionary():
    # v2 delete semantics (entity_finder.py:43-49): removing a dictionary
    # removes its matches; our snapshot equivalent is dict subtraction.
    values = dict(CAKE_VALUES)
    m = find_entities("I want a Carrot cake", build_gazetteer(values))
    assert m["Carrot"] == ["CakeType"]
    del values["CakeType"]
    assert find_entities("I want a Carrot cake", build_gazetteer(values)) == {}


def test_split_message_span_count():
    # "This is short" -> 3 words -> 6 contiguous n-gram spans
    assert len(list(ngram_spans("This is short"))) == 6


def test_span_order_and_text():
    spans = [s for _, _, s in ngram_spans("a b c")]
    assert spans == ["a", "a b", "a b c", "b", "b c", "c"]


# ---- regex semantics (legacy finder) ----


def test_regex_basic():
    m = find_entities("I want a large cake", build_gazetteer({}), rx())
    assert len(m) == 2
    assert m["large"] == ["CakeSizeRegex"]
    assert m["cake"] == ["CakeTypeRegex"]


def test_regex_and_standard():
    m = find_entities("I want a Large cake and some beer", gaz(), rx())
    assert len(m) == 3
    assert m["Large"] == ["CakeSize"]
    assert m["beer"] == ["Drinks"]
    assert m["cake"] == ["CakeTypeRegex"]


def test_regex_single_word_only():
    # regex pass never sees n-grams, only single split words
    m = find_entities("I want a Large biscuit", build_gazetteer({}), rx())
    assert len(m) == 1
    assert m["Large"] == ["CakeSizeRegex"]


def test_value_priority_over_regex():
    m = find_entities("Large", gaz(), rx())
    assert len(m) == 1
    assert m["Large"] == ["CakeSize"]


def test_regex_case_sensitive_fullmatch():
    # from test_entity_server.py:109-127: alarms value dict + [A]\d{3}$ regex
    gazetteer = build_gazetteer({"alarms": ["a210", "a211", "a212"]})
    regexes = compile_regexes({"ralarms": r"[A]\d{3}$"})
    m = find_entities("Alarm number A213", gazetteer, regexes)
    assert m["A213"] == ["ralarms"]
    # value match (case-insensitive a212) wins over regex
    m = find_entities("Alarm number A212", gazetteer, regexes)
    assert m["A212"] == ["alarms"]


def test_bad_regex_fails_fast():
    with pytest.raises(BadRegexError):
        compile_regexes({"bad": r"[a\d{3}$"})


def test_cars_and_fruits():
    # test_entity_server.py:99-107
    gazetteer = build_gazetteer(
        {"cars": ["Fiesta", "Focus", "Golf"], "fruits": ["Apple", "Banana", "Pear"]}
    )
    m = find_entities("a Focus is a type of car, an Apple is a fruit", gazetteer)
    assert m["Focus"] == ["cars"]
    assert m["Apple"] == ["fruits"]


def test_longest_fold_first_wins_ties():
    # two same-length candidates for one entity: first in span order wins
    gazetteer = build_gazetteer({"E": ["aaa", "bbb"]})
    m = find_entities("bbb then aaa", gazetteer)
    assert m == {"bbb": ["E"]}


def test_raw_vs_stripped_skip_asymmetry():
    # the skip set holds stripped surfaces; a later raw span equal to one of
    # them is skipped, but a punctuated variant is reprocessed (and folded)
    gazetteer = build_gazetteer({"E": ["carrot"]})
    m = find_entities("carrot, then carrot again", gazetteer)
    assert m == {"carrot": ["E"]}
