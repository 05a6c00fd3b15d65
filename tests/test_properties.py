"""Property-based tests (SURVEY.md §5c): seeded hypothesis over the
single-node oracle for the invariants the reference's suite pins by
example, plus a randomized Spark-vs-oracle fuzz batch.

Invariants:
- longest-match-wins: the surface the fold picks for an entity is at least
  as long as every other candidate surface of that entity in the text.
- value-over-regex priority: a clean word (strip(w) == w) that the value
  pass matched never appears as a regex match.
- case invariance: gazetteer matching is case-insensitive — perturbing
  letter case changes matched surfaces only up to case.
- Spark == oracle on random corpora (one batched job per seed).
"""

from __future__ import annotations

import random
import re
import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kg.normalize import ngram_spans, strip_punct
from kg.oracle import build_gazetteer, compile_regexes, find_entities, find_entities_rows

WORD = st.text(alphabet="abcdef", min_size=1, max_size=5)
PUNCTY_WORD = st.builds(
    lambda w, pre, post: pre + w + post,
    WORD,
    st.sampled_from(["", "(", '"', ""]),
    st.sampled_from(["", ".", ",", "!", ""]),
)
TEXT = st.lists(PUNCTY_WORD, min_size=0, max_size=25).map(" ".join)
PHRASE = st.lists(WORD, min_size=1, max_size=2).map(" ".join)
GAZ = st.dictionaries(
    st.sampled_from(["E1", "E2", "E3"]), st.lists(PHRASE, min_size=1, max_size=4),
    min_size=1, max_size=3,
)


@settings(max_examples=150, deadline=None)
@given(text=TEXT, raw_gaz=GAZ)
def test_longest_match_wins(text, raw_gaz):
    gaz = build_gazetteer(raw_gaz)
    result = find_entities(text, gaz)
    # candidate surfaces per entity, recomputed independently
    cands: dict[str, list[str]] = {name: [] for name in gaz}
    for _i, _j, span in ngram_spans(text):
        surface = strip_punct(span)
        for name, values in gaz.items():
            if surface.lower() in values:
                cands[name].append(surface)
    for surface, names in result.items():
        for name in names:
            assert all(len(surface) >= len(c) for c in cands[name]), (
                surface, name, cands[name],
            )


@settings(max_examples=150, deadline=None)
@given(text=TEXT, raw_gaz=GAZ)
def test_value_over_regex_priority(text, raw_gaz):
    gaz = build_gazetteer(raw_gaz)
    rx = compile_regexes({"ANY": r".+"})  # matches every non-consumed word
    rows = find_entities_rows(text, gaz, rx)
    regex_words = {w for w, _n, det in rows if det == "regex"}
    value_surfaces = set(find_entities(text, gaz))
    # The reference skip-set tests the RAW word against STRIPPED matched
    # surfaces (entity_finder.py:77,84) — priority is therefore observable
    # only for a clean word (raw == stripped) whose stripped surface no
    # OTHER raw token also produces: a punctuated sibling ("a." next to "a")
    # is NOT consumed and legitimately re-emits the same stripped surface
    # through the regex pass.
    words = text.split()
    for w_raw in words:
        if (
            strip_punct(w_raw) == w_raw
            and w_raw in value_surfaces
            and not any(o != w_raw and strip_punct(o) == w_raw for o in words)
        ):
            assert w_raw not in regex_words  # priority holds for clean words


@settings(max_examples=150, deadline=None)
@given(text=TEXT, raw_gaz=GAZ, seed=st.integers(0, 2**16))
def test_gazetteer_case_invariance(text, raw_gaz, seed):
    rng = random.Random(seed)
    flipped = "".join(
        c.upper() if c.isalpha() and rng.random() < 0.5 else c for c in text
    )
    gaz = build_gazetteer(raw_gaz)
    a = {s.lower() for s in find_entities(text, gaz)}
    b = {s.lower() for s in find_entities(flipped, gaz)}
    assert a == b


@settings(max_examples=100, deadline=None)
@given(pattern=st.text(alphabet="ab[(\\+*?", min_size=1, max_size=6))
def test_bad_regex_always_raises_badregex(pattern):
    from kg.oracle import BadRegexError

    try:
        re.compile(pattern)
        valid = True
    except re.error:
        valid = False
    if valid:
        compile_regexes({"P": pattern})
    else:
        with pytest.raises(BadRegexError):
            compile_regexes({"P": pattern})


@settings(max_examples=200, deadline=None)
@given(html=st.text(alphabet="<>/ab cp=\"'&#;!-x\n\t", min_size=0, max_size=200))
def test_extract_text_never_crashes_and_is_deterministic(html):
    from kg.textextract import extract_text

    out1 = extract_text(html)
    out2 = extract_text(html.encode("utf-8"))
    assert isinstance(out1, str)
    assert out1 == out2  # str and bytes paths agree; repeated calls agree


def test_extract_text_handles_malformed_real_shapes():
    from kg.textextract import extract_text

    cases = [
        b"<p>unclosed paragraph",
        b"<p>a<p>b</p>",  # auto-nesting
        b"<P>UPPER</P>",
        b"<p>ent &amp; ity &#65;</p>",
        b"<script><p>not text</p></script><p>yes</p>",
        b"\xff\xfe garbage <p>ok</p>",  # invalid utf-8 prefix
        b"<table><tr><td>cell</td></tr></table>",
        b"<!-- comment --><p>after</p>",
        b"",
    ]
    for c in cases:
        out = extract_text(c)
        assert isinstance(out, str)
    assert extract_text(b"<script><p>not text</p></script><p>yes</p>") == "yes"
    assert extract_text(b"<p>ent &amp; ity &#65;</p>") == "ent & ity A"
    assert extract_text(b"<p>unclosed paragraph") == "unclosed paragraph"


UNICODE_CHARS = "abÉéÑñßİıΣσç台 .,!"
UNI_GAZ = {"E": ["éñ", "ß", "İb", "σa", "台"]}


@pytest.mark.parametrize("seed", [5, 11])
def test_spark_matches_oracle_on_unicode_corpus(spark, seed):
    """lower()/btrim() casing and punctuation semantics agree between the
    JVM plan and Python oracle on non-ASCII text (İ, ß, Σ/σ, CJK)."""
    from kg.stages.mentions import detect_mentions, gazetteer_dim

    rng = random.Random(seed)
    texts = [
        "".join(rng.choice(UNICODE_CHARS) for _ in range(rng.randint(0, 30)))
        for _ in range(200)
    ]
    sdf = spark.createDataFrame(
        [(f"u{i}", t) for i, t in enumerate(texts)], "url string, text string"
    )
    got = sorted(
        map(tuple, detect_mentions(sdf, gazetteer_dim(spark, UNI_GAZ), None)
            .toPandas()[["url", "matched_word", "entity_name"]].values)
    )
    g = build_gazetteer(UNI_GAZ)
    want = sorted(
        (f"u{i}", w, n)
        for i, t in enumerate(texts)
        for w, n, _d in find_entities_rows(t, g, None)
    )
    assert got == want


# ---- randomized Spark-vs-oracle fuzz (one batched job per seed) ----

FUZZ_GAZ = {
    "Drinks": ["coffee", "diet coke", "tea"],
    "Cakes": ["chocolate cake", "cake"],
    "Overlap": ["s4d", "qq zz"],
}
FUZZ_RX = {"SWord": r"^s.+$", "Digits": r"^\d+$"}


def _random_text(rng: random.Random) -> str:
    vocab = (
        ["coffee", "Diet", "Coke", "diet", "coke", "tea", "chocolate", "cake",
         "s4d", "qq", "zz", "sun", "123", "45a"]
        + ["".join(rng.choices("abcs", k=rng.randint(1, 4))) for _ in range(6)]
    )
    words = []
    for _ in range(rng.randint(0, 20)):
        w = rng.choice(vocab)
        if rng.random() < 0.25:
            w = rng.choice("(\"'") + w
        if rng.random() < 0.25:
            w = w + rng.choice(".,!?;")
        if rng.random() < 0.3:
            w = w.upper() if rng.random() < 0.5 else w.capitalize()
        words.append(w)
    return " ".join(words)


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_spark_matches_oracle_on_random_corpus(spark, seed):
    from kg.stages.mentions import detect_mentions, gazetteer_dim, regex_dim

    rng = random.Random(seed)
    docs_rows = [(f"u{i}", _random_text(rng)) for i in range(40)]
    gaz_oracle = build_gazetteer(FUZZ_GAZ)
    rx_oracle = compile_regexes(FUZZ_RX)
    want = sorted(
        (url, w, n, d)
        for url, text in docs_rows
        for w, n, d in find_entities_rows(text, gaz_oracle, rx_oracle)
    )
    sdf = spark.createDataFrame(docs_rows, "url string, text string")
    got = detect_mentions(
        sdf, gazetteer_dim(spark, FUZZ_GAZ), regex_dim(spark, FUZZ_RX)
    ).toPandas()
    got_rows = sorted(
        map(tuple, got[["url", "matched_word", "entity_name", "detector"]].values)
    )
    assert got_rows == want


@pytest.mark.parametrize("seed", [11, 47])
def test_chunk_layout_reconstructs_any_corpus(spark, seed):
    """Fuzz the chunk arithmetic: for random doc lengths and random
    (chunk_len, overlap), the chunks of every doc tile its token stream —
    starts advance by exactly stride, every token is covered, and
    re-assembling [chunk[:stride] ... + last chunk] reproduces the doc."""
    from kg.ops.curation import chunk_documents

    rng = random.Random(seed)
    chunk_len = rng.randint(2, 12)
    overlap = rng.randint(0, chunk_len - 1)
    stride = chunk_len - overlap
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(rng.randint(0, 40))))
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_len=chunk_len, overlap=overlap)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in rows:
        toks = text.split()
        chunks = sorted(by_doc.get(doc_id, []), key=lambda r: r["chunk_id"])
        if not toks:
            assert chunks == []
            continue
        assert [c["start_tok"] for c in chunks] == [
            i * stride for i in range(len(chunks))
        ]
        rebuilt: list[str] = []
        for c in chunks[:-1]:
            rebuilt += c["chunk_text"].split()[:stride]
        rebuilt += chunks[-1]["chunk_text"].split()
        start_last = chunks[-1]["start_tok"]
        assert rebuilt[:start_last] == toks[:start_last]
        assert rebuilt[start_last:] == toks[start_last:]
        # full coverage and nothing beyond the doc
        assert chunks[-1]["start_tok"] + chunks[-1]["n_tokens"] == len(toks)


@pytest.mark.parametrize("seed", [11, 23])
def test_transitive_closure_matches_python_bfs(spark, seed):
    """infer_transitive == min-depth BFS closure computed in Python, on
    random sparse digraphs (cycles, hubs, dead ends included)."""
    from kg.reason import infer_transitive

    rng = random.Random(seed)
    n = 30
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(60)}
    max_depth = 4
    facts = spark.createDataFrame(
        [(a, "p", b) for a, b in sorted(edges)],
        "subj_id long, pred string, obj_id long",
    ).repartition(7)
    got = {
        (r.subj_id, r.obj_id): r.depth
        for r in infer_transitive(facts, "p", max_depth).collect()
    }
    # python BFS per source, bounded depth, derived self-pairs dropped
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    want: dict[tuple[int, int], int] = {}
    for (a, b) in edges:
        want[(a, b)] = 1
    for src in range(n):
        seen = {src: 0}
        frontier = [src]
        for d in range(1, max_depth + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, []):
                    if v not in seen:
                        seen[v] = d
                        nxt.append(v)
            frontier = nxt
        for v, d in seen.items():
            if d >= 1 and v != src and (src, v) not in want:
                want[(src, v)] = d
    # asserted edges always depth 1; BFS may find a longer-first path,
    # min() semantics: take the min of asserted (1) and BFS depth
    assert got == want


@pytest.mark.parametrize("seed", [7])
def test_pattern_match_equals_bruteforce(spark, seed):
    from itertools import product

    from kg.query import match_pattern

    rng = random.Random(seed)
    preds = ["p", "q", "r"]
    facts = {
        (rng.randrange(8), rng.choice(preds), rng.randrange(8))
        for _ in range(40)
    }
    sdf = spark.createDataFrame(
        sorted(facts), "subj_id long, pred string, obj_id long"
    ).repartition(5)
    pattern = [("?x", "p", "?y"), ("?y", "q", "?z"), ("?x", "?w", "?z")]
    got = sorted(
        (r.x, r.y, r.z, r.w)
        for r in match_pattern(sdf, pattern).collect()
    )
    want = sorted({
        (s1, o1, o2, p3)
        for (s1, p1, o1), (s2, p2, o2), (s3, p3, o3) in product(
            facts, facts, facts)
        if p1 == "p" and p2 == "q" and s2 == o1
        and s3 == s1 and o3 == o2
    })
    assert got == want and len(want) > 0
