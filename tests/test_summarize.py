"""Per-doc TextRank extractive summarization (kg/ops/summarize.py):
python-replay cross-check of the array-local recurrence, edge cases,
and the zero-shuffle plan guarantee."""

from __future__ import annotations

import re


def _replay(text, n_keep=2, iterations=4, d=0.85, max_sentences=24):
    marked = re.sub(r"([.!?])\s+", "\\1\x01", text)
    sents = [s.strip() for s in marked.split("\x01") if s.strip()]
    sents = sents[:max_sentences]
    if not sents:
        return []
    toks = [sorted(set(t for t in s.lower().split() if t)) for s in sents]
    n = len(sents)
    w = [
        [
            0.0
            if i == j or not (set(toks[i]) | set(toks[j]))
            else len(set(toks[i]) & set(toks[j]))
            / len(set(toks[i]) | set(toks[j]))
            for j in range(n)
        ]
        for i in range(n)
    ]
    o = [sum(row) for row in w]
    r = [1.0 / n] * n
    for _ in range(iterations):
        r = [
            (1 - d) / n
            + d
            * sum(
                w[j][i] / o[j] * r[j] for j in range(n) if o[j] > 0
            )
            for i in range(n)
        ]
    order = sorted(range(n), key=lambda i: (-r[i], i))[:n_keep]
    return [(i, sents[i], round(r[i], 6)) for i in order]


CORPUS = [
    (1, "Spark joins tables fast. Spark joins tables at scale. "
        "The cat sat quietly. Spark tables join well."),
    (2, "One sentence only"),
    (3, ""),
    (4, "Alpha beta. Alpha beta! Gamma delta? Alpha beta gamma."),
    (5, "a b c? c d e. e f a! b d f. a a a."),
]


class TestTextrankSummary:
    def test_matches_python_replay(self, spark):
        from kg.ops.summarize import textrank_summary

        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        got = {
            (r.doc_id, r.sent_idx): (r.sentence, r.rank)
            for r in textrank_summary(docs, n_keep=2).collect()
        }
        want = {}
        for did, text in CORPUS:
            for i, sent, rank in _replay(text, n_keep=2):
                want[(did, i)] = (sent, rank)
        assert set(got) == set(want)
        for k, (sent, rank) in want.items():
            assert got[k][0] == sent
            assert abs(got[k][1] - rank) < 1e-9

    def test_zero_shuffle_plan(self, spark):
        from kg.ops.summarize import textrank_summary

        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        plan = textrank_summary(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure narrow map end-to-end

    def test_max_sentences_caps_work(self, spark):
        from kg.ops.summarize import textrank_summary

        long_doc = ". ".join(f"w{i} common" for i in range(100)) + "."
        docs = spark.createDataFrame(
            [(9, long_doc)], "doc_id long, text string"
        )
        rows = textrank_summary(docs, n_keep=3, max_sentences=10).collect()
        assert all(r.sent_idx < 10 for r in rows)
