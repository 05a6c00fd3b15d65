"""Hearst-pattern taxonomy mining: lexico-syntactic is_a harvesting from
raw text (Hearst 1992 — "NPs such as NP", "NP and other NPs", …), the
classic KG-construction source of subclass/instance edges. The mined
(hypo, hyper) edges feed the same subclass_of ontology dims the RDFS-lite
entailment ops (kg/reason.py) consume, closing the loop: text → taxonomy
→ type inference.

Reference scope note: the reference service matches entities against
hand-maintained dictionaries (entity_recogniser's trie finder); this is
the web-scale generalization that MINES the dictionary/taxonomy instead
of requiring it up front.

Scale shape:
- ``hearst_pairs`` is a PURE MAP — one regexp_extract_all pass per
  pattern over the text column (4 patterns → 4 array projections over
  the same scan, unioned), list NPs split/exploded with array functions.
  No Python, no shuffle; output keeps the scan partitioning.
- ``induce_taxonomy`` is one partial-agged groupBy on (hypo, hyper) plus
  one dim-sized groupBy on hypo for the primary-hypernym argmax (struct
  min — no window, fully combinable map-side).

NP approximation is deliberately shallow (capitalized token sequences):
at crawl scale a chunker would be a Python-side cost on every byte of
the corpus; the shallow pattern has the precision Hearst patterns are
known for, and the evidence threshold handles the tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["HEARST_PATTERNS", "hearst_pairs", "induce_taxonomy"]

# Capitalized token sequence ("Red Wine", "Diet Coke"); hyphen/digit
# interior chars allowed ("B-52", "Area51").
_NP = r"[A-Z][A-Za-z0-9-]*(?: [A-Z][A-Za-z0-9-]*)*"
# "A", "A and B", "A, B and C", "A, B or C"
_LIST = rf"{_NP}(?:, {_NP})*(?:,? (?:and|or) {_NP})?"
# Splitter that inverts _LIST back into its member NPs.
_SPLIT = r",? (?:and|or) |, "

# (name, regex, hyper_group, list_group)
HEARST_PATTERNS: list[tuple[str, str, int, int]] = [
    ("such_as", rf"\b([a-z]+) such as ({_LIST})", 1, 2),
    ("including", rf"\b([a-z]+),? including ({_LIST})", 1, 2),
    ("and_other", rf"\b({_LIST}),? (?:and|or) other ([a-z]+)\b", 2, 1),
    ("especially", rf"\b([a-z]+),? especially ({_LIST})", 1, 2),
]


def hearst_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "url"
) -> DataFrame:
    """One row per (doc, pattern occurrence, list member):
    (url, hypo, hyper, pattern). A doc contributes one row per hyponym
    PER OCCURRENCE — repeated assertions are evidence, and
    ``induce_taxonomy`` counts them.

    Pure map: per pattern, two regexp_extract_all calls (hyper group,
    list group) give parallel arrays zipped positionally with
    ``transform``; the list splits on the same grammar that built it.
    """
    outs = []
    for name, rx, hg, lg in HEARST_PATTERNS:
        hypers = F.regexp_extract_all(F.col(text_col), F.lit(rx), F.lit(hg))
        lists = F.regexp_extract_all(F.col(text_col), F.lit(rx), F.lit(lg))
        matches = F.transform(
            hypers,
            lambda h, i: F.struct(
                h.alias("hyper"), F.element_at(lists, i + 1).alias("lst")
            ),
        )
        outs.append(
            docs.select(
                F.col(id_col).alias("url"), F.explode(matches).alias("m")
            )
            .select(
                "url",
                F.col("m.hyper").alias("hyper"),
                F.explode(F.split(F.col("m.lst"), _SPLIT)).alias("hypo"),
            )
            .where(F.col("hypo") != "")
            .select("url", "hypo", "hyper", F.lit(name).alias("pattern"))
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def induce_taxonomy(
    pairs: DataFrame, min_evidence: int = 2
) -> DataFrame:
    """Aggregate mined pairs into evidence-counted taxonomy edges:
    (hypo, hyper, n_evidence, is_primary). Edges below ``min_evidence``
    occurrences are dropped FIRST; among the kept edges, each hyponym's
    primary hypernym is the evidence argmax (ties → lexicographically
    smallest hyper, so reruns are stable).

    No window functions: the argmax is min(struct(-n, hyper)) — fully
    partial-aggregable — joined back on the hypo key.
    """
    counts = (
        pairs.groupBy("hypo", "hyper")
        .agg(F.count(F.lit(1)).alias("n_evidence"))
        .where(F.col("n_evidence") >= min_evidence)
    )
    key = F.struct(
        (-F.col("n_evidence")).alias("negn"), F.col("hyper").alias("hyper")
    )
    best = counts.groupBy("hypo").agg(F.min(key).alias("_best"))
    return (
        counts.join(best, "hypo")
        .select(
            "hypo", "hyper", "n_evidence",
            (key == F.col("_best")).alias("is_primary"),
        )
    )
