"""Deterministic pattern-based OpenIE triple extraction (SVO).

The reference has no triple extraction — this operator is mandated by the
north rule (BASELINE.json: "dependency-pattern OpenIE triple extraction").
With no dependency parser available (SURVEY.md §7), the extractor is a
deterministic surface-pattern SVO matcher over sentences. It is ONE pure
function shared by the single-node oracle and the Spark mapInPandas stage, so
Spark-vs-oracle triple P/R is 1.0 by construction on agreeing inputs; the
0.95 gate then measures pipeline wiring, not extractor drift.
"""

from __future__ import annotations

import re

__all__ = ["extract_triples", "split_sentences", "PREDICATE_PATTERNS"]

_SENT_SPLIT = re.compile(r"[.!?\n]+")

# (predicate, verb-phrase regex). Applied in order; first match per sentence
# per predicate. Arguments are trimmed of leading articles and punctuation.
PREDICATE_PATTERNS: list[tuple[str, re.Pattern]] = [
    ("founded", re.compile(r"^(.{1,80}?)\s+founded\s+(.{1,80})$")),
    ("acquired", re.compile(r"^(.{1,80}?)\s+acquired\s+(.{1,80})$")),
    ("located_in", re.compile(r"^(.{1,80}?)\s+is\s+located\s+in\s+(.{1,80})$")),
    ("works_for", re.compile(r"^(.{1,80}?)\s+works\s+for\s+(.{1,80})$")),
    ("born_in", re.compile(r"^(.{1,80}?)\s+was\s+born\s+in\s+(.{1,80})$")),
    ("ceo_of", re.compile(r"^(.{1,80}?)\s+is\s+the\s+CEO\s+of\s+(.{1,80})$")),
    ("part_of", re.compile(r"^(.{1,80}?)\s+is\s+part\s+of\s+(.{1,80})$")),
    ("produces", re.compile(r"^(.{1,80}?)\s+produces\s+(.{1,80})$")),
]

# literal substring each pattern requires (prefilter; the regex is
# authoritative — bare words only, since the patterns' \s+ admits any
# whitespace around them)
_KEYWORDS: dict[str, str] = {
    "founded": "founded",
    "acquired": "acquired",
    "located_in": "located",
    "works_for": "works",
    "born_in": "born",
    "ceo_of": "CEO",
    "part_of": "part",
    "produces": "produces",
}

_ARTICLES = re.compile(r"^(?:the|a|an)\s+", re.IGNORECASE)
_TRIM = re.compile(r"^[\s\"'.,;:()\[\]]+|[\s\"'.,;:()\[\]]+$")


def _clean_arg(arg: str) -> str:
    arg = _TRIM.sub("", arg)
    arg = _ARTICLES.sub("", arg)
    arg = _TRIM.sub("", arg)
    return arg


def split_sentences(text: str) -> list[str]:
    return [s.strip() for s in _SENT_SPLIT.split(text) if s.strip()]


def extract_triples(text: str, max_arg_words: int = 6) -> list[tuple[str, str, str]]:
    """Return (subj, pred, obj) triples found in ``text``, in sentence order.

    Both arguments must be non-empty and at most ``max_arg_words`` whitespace
    words after cleaning, else the match is discarded (garbage guard).
    """
    out: list[tuple[str, str, str]] = []
    for sentence in split_sentences(text):
        for pred, rx in PREDICATE_PATTERNS:
            # literal-keyword prefilter: every pattern requires its verb
            # substring, and `in` is ~10x cheaper than a regex attempt —
            # most sentences carry no predicate (measured ~2x on the
            # extractor; semantics unchanged, the regex still decides)
            if _KEYWORDS[pred] not in sentence:
                continue
            m = rx.match(sentence)
            if not m:
                continue
            subj = _clean_arg(m.group(1))
            obj = _clean_arg(m.group(2))
            if not subj or not obj:
                continue
            if len(subj.split()) > max_arg_words or len(obj.split()) > max_arg_words:
                continue
            out.append((subj, pred, obj))
    return out


# Negated verb-phrase shapes per predicate. The POSITIVE patterns' lazy
# subject capture means "X never acquired Y" would otherwise match with
# subj = "X never" — a corrupted positive assertion; polarity-aware
# extraction intercepts the negation FIRST and emits a negative fact the
# conflict-resolution layer can weigh instead.
NEGATION_PATTERNS: list[tuple[str, re.Pattern]] = [
    ("founded",
     re.compile(r"^(.{1,80}?)\s+never\s+founded\s+(.{1,80})$")),
    ("acquired",
     re.compile(
         r"^(.{1,80}?)\s+(?:never\s+acquired|did\s+not\s+acquire)"
         r"\s+(.{1,80})$")),
    ("located_in",
     re.compile(r"^(.{1,80}?)\s+is\s+not\s+located\s+in\s+(.{1,80})$")),
    ("works_for",
     re.compile(r"^(.{1,80}?)\s+does\s+not\s+work\s+for\s+(.{1,80})$")),
    ("born_in",
     re.compile(r"^(.{1,80}?)\s+was\s+not\s+born\s+in\s+(.{1,80})$")),
    ("ceo_of",
     re.compile(r"^(.{1,80}?)\s+is\s+not\s+the\s+CEO\s+of\s+(.{1,80})$")),
    ("part_of",
     re.compile(r"^(.{1,80}?)\s+is\s+not\s+part\s+of\s+(.{1,80})$")),
    ("produces",
     re.compile(r"^(.{1,80}?)\s+does\s+not\s+produce\s+(.{1,80})$")),
]


def extract_triples_polar(
    text: str, max_arg_words: int = 6
) -> list[tuple[str, str, str, int]]:
    """Polarity-aware variant of :func:`extract_triples`: returns
    (subj, pred, obj, polarity) with polarity -1 for negated assertions
    and +1 for positive ones. Negative patterns are tried FIRST per
    (sentence, predicate); a sentence whose predicate matched negatively
    is never re-matched positively for that predicate (other predicates
    in the same sentence still run). The positive arm is byte-identical
    to extract_triples — on negation-free text the two agree exactly
    (pinned in tests)."""
    out: list[tuple[str, str, str, int]] = []
    for sentence in split_sentences(text):
        negated: set[str] = set()
        for pred, rx in NEGATION_PATTERNS:
            m = rx.match(sentence)
            if not m:
                continue
            subj = _clean_arg(m.group(1))
            obj = _clean_arg(m.group(2))
            if not subj or not obj:
                continue
            if (len(subj.split()) > max_arg_words
                    or len(obj.split()) > max_arg_words):
                continue
            negated.add(pred)
            out.append((subj, pred, obj, -1))
        for pred, rx in PREDICATE_PATTERNS:
            if pred in negated or _KEYWORDS[pred] not in sentence:
                continue
            m = rx.match(sentence)
            if not m:
                continue
            subj = _clean_arg(m.group(1))
            obj = _clean_arg(m.group(2))
            if not subj or not obj:
                continue
            if (len(subj.split()) > max_arg_words
                    or len(obj.split()) > max_arg_words):
                continue
            out.append((subj, pred, obj, 1))
    return out
