"""Abbreviation mining: "Long Form (ABBR)" definition harvesting — the
Schwartz–Hearst (PSB 2003) pattern family, restricted to the strict
initialism rule so the validation is a pure column expression both
engines replay identically. Mined (abbr → long form) pairs are alias
evidence: they enrich the same gazetteer/alias dims the linker consumes,
beside the anchor-text aliases (kg/ops/weblinks.py) and Hearst is_a
edges (kg/ops/taxonomy.py).

Reference scope note: the reference service looks aliases up in a
hand-maintained dictionary (/root/reference/src/hu_entity/
entity_finder.py:20-41); this op MINES the dictionary from the corpus
instead.

Scale shape:
- ``abbrev_candidates`` is a PURE MAP: two regexp_extract_all calls
  (window group, abbr group) zipped positionally, exploded, validated
  with array expressions (slice last-k words, initials concat, compare).
  No Python, no shuffle; output keeps the scan partitioning.
- ``abbrev_aliases`` is ONE partial-aggregable groupBy on the
  (long_norm, abbr) pair — corpus-sized input, alias-vocabulary-sized
  output.

Validation rule (strict initialism — deliberately narrower than full
Schwartz–Hearst inner-character matching, which needs a per-candidate
backward scan): the abbreviation's characters must equal the upper-cased
initials of the last len(abbr) words before the parenthesis. This keeps
precision high ("World Health Organization (WHO)" passes, "deep neural
network (95%)" never captures) and the whole check inside whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["abbrev_candidates", "abbrev_aliases", "ABBREV_PATTERN"]

# Up to 6 space-separated words (letters first char; & - digits interior)
# immediately before a parenthesized 2-6 char uppercase token.
ABBREV_PATTERN = (
    r"((?:[A-Za-z][A-Za-z0-9&-]* ){1,6})\(([A-Z][A-Z0-9]{1,5})\)"
)


def abbrev_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """One row per validated definition occurrence: (url, abbr,
    long_form). The regex captures a greedy window of up to 6 words
    before "(ABBR)"; the long form is the window's last len(abbr) words,
    kept only when their initials spell the abbreviation
    (case-insensitive). Repeated definitions in one doc stay repeated —
    they are evidence for ``abbrev_aliases``.
    """
    windows = F.regexp_extract_all(F.col(text_col), F.lit(ABBREV_PATTERN), 1)
    abbrs = F.regexp_extract_all(F.col(text_col), F.lit(ABBREV_PATTERN), 2)
    cand = (
        docs.select(
            F.col(id_col).alias("url"),
            F.explode(F.arrays_zip(windows.alias("w"), abbrs.alias("a")))
            .alias("m"),
        )
        .select(
            "url",
            F.split(F.trim(F.col("m.w")), " ").alias("words"),
            F.col("m.a").alias("abbr"),
        )
        .withColumn("k", F.length("abbr"))
    )
    longw = F.slice(
        F.col("words"), F.size("words") - F.col("k") + 1, F.col("k")
    )
    initials = F.upper(
        F.array_join(F.transform(longw, lambda w: F.substring(w, 1, 1)), "")
    )
    return (
        cand.where(F.size("words") >= F.col("k"))
        .withColumn("long_form", F.array_join(longw, " "))
        .where(initials == F.col("abbr"))
        .select("url", "abbr", "long_form")
    )


def abbrev_aliases(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    min_docs: int = 1,
) -> DataFrame:
    """Corpus-level alias dictionary rows: (abbr, long_norm, long_form,
    n_refs, n_docs) — one groupBy on the pair key; ``long_form`` is the
    lexicographically-first original-case surface (deterministic
    sample). ``min_docs`` gates on independent documents, the same
    evidence discipline as web_anchor_aliases.
    """
    c = abbrev_candidates(docs, text_col, id_col)
    return (
        c.groupBy(
            "abbr", F.lower(F.col("long_form")).alias("long_norm")
        )
        .agg(
            F.min("long_form").alias("long_form"),
            F.count("*").alias("n_refs"),
            F.countDistinct("url").alias("n_docs"),
        )
        .where(F.col("n_docs") >= min_docs)
    )
