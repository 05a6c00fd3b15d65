"""RDF N-Triples serialization of the materialized KG — the interchange
sink a standing graph needs beyond its parquet tables.

The reference returns matches as per-request JSON
(/root/reference/src/hu_entity/server.py:130-137) and never materializes
a graph; the north rule's final step is "(subj, pred, obj) triple
materialization into partitioned graph tables". Partitioned parquet is
the engine-internal form (run_pipeline); this module adds the standard
EXTERNAL form — W3C N-Triples lines — so any RDF store / SPARQL engine
can load the result.

Everything is a pure column projection (concat + literal replace
chains): no shuffle, no UDF, whole-stage codegen end to end, and the
text sink inherits the upstream partitioning — at 10^12 facts the export
is scan-bound. Escaping is implemented with enumerated literal
``replace`` chains (not a per-char codec) so the DuckDB oracle replays
it exactly:

- IRIs: the characters N-Triples forbids inside ``<...>`` (space, <, >,
  ", {, }, |, ^, `, \\, tab/newline/CR) are percent-encoded; backslash
  first so later encodings aren't double-escaped.
- String literals: the five ECHAR escapes (\\\\, \\", \\n, \\r, \\t).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["iri_escape", "literal_escape", "ntriples", "write_ntriples"]

# (char, percent-encoding) — backslash MUST come first
_IRI_ENC = [
    ("\\", "%5C"),
    (" ", "%20"),
    ("\t", "%09"),
    ("\n", "%0A"),
    ("\r", "%0D"),
    ("<", "%3C"),
    (">", "%3E"),
    ('"', "%22"),
    ("{", "%7B"),
    ("}", "%7D"),
    ("|", "%7C"),
    ("^", "%5E"),
    ("`", "%60"),
]

# N-Triples ECHAR escapes for string literals — backslash first
_LIT_ENC = [
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
]


def _chain(col: Column, pairs: list[tuple[str, str]]) -> Column:
    for ch, enc in pairs:
        col = F.replace(col, F.lit(ch), F.lit(enc))
    return col


def iri_escape(col: Column) -> Column:
    """Percent-encode the characters N-Triples forbids inside <...>."""
    return _chain(col.cast("string"), _IRI_ENC)


def literal_escape(col: Column) -> Column:
    """Apply the five N-Triples ECHAR escapes to a string literal."""
    return _chain(col.cast("string"), _LIT_ENC)


def ntriples(
    facts: DataFrame,
    base_iri: str = "http://kg.local/",
    subj_col: str = "subj_id",
    pred_col: str = "pred",
    obj_col: str = "obj_id",
    obj_is_literal: bool = False,
) -> DataFrame:
    """Serialize facts to N-Triples: input columns pass through, plus a
    ``line`` column ``<{base}e/subj> <{base}p/pred> <{base}e/obj> .``
    (or ``"obj"`` as an escaped string literal when ``obj_is_literal``).

    Null subjects/objects are dropped — N-Triples has no null term. Pure
    projection: no shuffle, no UDF; write with :func:`write_ntriples`.
    """
    out = facts.where(
        F.col(subj_col).isNotNull() & F.col(obj_col).isNotNull()
    )
    subj = F.concat(
        F.lit(f"<{base_iri}e/"), iri_escape(F.col(subj_col)), F.lit(">")
    )
    pred = F.concat(
        F.lit(f"<{base_iri}p/"), iri_escape(F.col(pred_col)), F.lit(">")
    )
    if obj_is_literal:
        obj = F.concat(
            F.lit('"'), literal_escape(F.col(obj_col)), F.lit('"')
        )
    else:
        obj = F.concat(
            F.lit(f"<{base_iri}e/"), iri_escape(F.col(obj_col)), F.lit(">")
        )
    return out.withColumn(
        "line", F.concat_ws(" ", subj, pred, obj, F.lit("."))
    )


def write_ntriples(lines: DataFrame, path: str, mode: str = "error") -> None:
    """Sink the ``line`` column as a text dataset (one fact per line; a
    directory of part files any RDF loader can cat together). The write
    preserves upstream partitioning — no extra shuffle."""
    lines.select("line").write.mode(mode).text(path)
