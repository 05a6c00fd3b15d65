"""Tokenization pipeline (O5-O9): entities -> filters -> lemma/stoplists.

Re-expresses /root/reference/src/hu_entity/spacy_wrapper.py:277-335 with the
deterministic backend. Pinned semantics:

- number filter uses Python ``float()`` parseability EXACTLY ("123.45" is a
  number; "1,234.50" is NOT; "inf"/"1e3"/"+1" are) — spacy_wrapper.py:40-45,
  pinned by tests/test_tokenizing.py:39-65.
- filter-with-fallback: if a filter removes every token but matched at least
  one, emit a single placeholder ("NUM" / "PERSON") — spacy_wrapper.py:277-293.
- lemma is lowercased+stripped; pure-symbol tokens dropped; stopword tier
  applied; empty result -> ["UNK"] — spacy_wrapper.py:295-322.
"""

from __future__ import annotations

from kg.detect import detect, word_tokens
from kg.stoplists import stoplist, symbols

__all__ = ["is_numberish", "lemmatize", "tokenize"]


def is_numberish(text: str) -> bool:
    """True iff Python float() accepts the token text (O6)."""
    try:
        float(text)
    except ValueError:
        return False
    return True


_IRREGULAR_LEMMAS = {
    "was": "be", "were": "be", "is": "be", "are": "be", "am": "be",
    "been": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do",
    "went": "go", "gone": "go", "goes": "go",
    "made": "make", "said": "say", "got": "get",
    "children": "child", "men": "man", "women": "woman", "people": "person",
    "feet": "foot", "mice": "mouse", "better": "good", "best": "good",
    "worse": "bad", "worst": "bad",
}

_VOWELS = set("aeiou")


def lemmatize(word: str) -> str:
    """Deterministic suffix-rule lemmatizer (backend detail; the reference
    delegates to spaCy's statistical lemmatizer, unavailable here)."""
    w = word.lower().strip()
    if not w or not w.isalpha():
        return w
    irr = _IRREGULAR_LEMMAS.get(w)
    if irr:
        return irr
    if len(w) > 4 and w.endswith("ies"):
        return w[:-3] + "y"
    if len(w) > 4 and w.endswith("sses"):
        return w[:-2]
    if len(w) > 3 and w.endswith("es") and w[-3] in "sxz":
        return w[:-2]
    if len(w) > 3 and w.endswith("s") and not w.endswith("ss") and not w.endswith("us"):
        return w[:-1]
    if len(w) > 5 and w.endswith("ing") and w[-4] not in _VOWELS:
        stem = w[:-3]
        if len(stem) > 2 and stem[-1] == stem[-2]:  # running -> run
            stem = stem[:-1]
        return stem
    if len(w) > 4 and w.endswith("ed") and w[-3] not in _VOWELS:
        stem = w[:-2]
        if len(stem) > 2 and stem[-1] == stem[-2]:
            stem = stem[:-1]
        return stem
    return w


def tokenize(
    text: str,
    filter_ents: bool = False,
    sw_size: str = "small",
    lang: str = "en",
    custom_entities: dict[str, str] | None = None,
) -> list[str]:
    """Full tokenize pipeline (O5). Returns the final token strings."""
    tokens = word_tokens(text)
    mentions = detect(text, lang, custom_entities)

    person_spans = [
        (m.tok_start, m.tok_end) for m in mentions if m.category == "sys.person"
    ]

    items: list[tuple[str, bool]] = [
        (t.text, any(s <= k < e for s, e in person_spans))
        for k, t in enumerate(tokens)
    ]

    if filter_ents:
        # number filter with NUM fallback (O6+O7)
        kept = [it for it in items if not is_numberish(it[0])]
        if not kept and len(kept) != len(items):
            kept = [("NUM", False)]
        items = kept
        # person filter with PERSON fallback (O7)
        kept = [it for it in items if not it[1]]
        if not kept and len(kept) != len(items):
            kept = [("PERSON", False)]
        items = kept

    # lemma + symbol + stopword passes (O8)
    sym = symbols(lang)
    sw = stoplist(lang, sw_size)
    out = []
    for word, _ in items:
        lemma = lemmatize(word) if word not in ("NUM", "PERSON") else word
        if lemma in sym:
            continue
        if lemma in sw:
            continue
        out.append(lemma)
    if not out:
        return ["UNK"]
    return out
