"""KG consumption: SPARQL-style basic-graph-pattern matching over the
materialized fact table.

The reference answers one HTTP request at a time
(/root/reference/src/hu_entity/server.py:60); a standing KG's consumers
ask conjunctive questions — "CEOs of orgs located where they were born"
— which are exactly basic graph patterns (a conjunction of triple atoms
sharing variables). This is deliberately NOT a query language: a pattern
is a Python list of atoms, and the translation to DataFrame joins is the
whole implementation, so Catalyst (join reordering, broadcast promotion,
AQE skew splits) IS the query optimizer.

Scale shape: one equi-join per atom after the first, keyed on whatever
variables the atom shares with the bindings built so far (callers order
atoms most-selective-first, but AQE/CBO may reorder); literal
subject/pred/object constraints become pushed-down filters on the fact
scan — each atom reads only its slice of a pred-partitioned fact table
(run_pipeline writes facts partitioned by pred for exactly this).
Variable-only cross atoms (no shared variable) are rejected rather than
silently planning a cartesian product.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["match_pattern"]

_ROLES = ("subj_id", "pred", "obj_id")


def _is_var(term) -> bool:  # noqa: ANN001
    return isinstance(term, str) and term.startswith("?")


def match_pattern(
    facts: DataFrame,
    pattern: Sequence[tuple],
) -> DataFrame:
    """Match a conjunction of (subj, pred, obj) atoms against
    facts(subj_id, pred, obj_id); terms starting with '?' are variables,
    anything else is a literal constraint (entity id for subj/obj, pred
    string for pred). Returns DISTINCT variable bindings, one column per
    variable (set semantics — deterministic under any partitioning).

    A variable repeated INSIDE one atom constrains equality (e.g.
    (?x, knows, ?x)); across atoms it joins. Every atom after the first
    must share at least one variable with the atoms before it.
    """
    if not pattern:
        raise ValueError("empty pattern")
    out: DataFrame | None = None
    bound: set[str] = set()
    for i, atom in enumerate(pattern):
        if len(atom) != 3:
            raise ValueError(f"atom {i} is not a triple: {atom!r}")
        t = facts.select(*_ROLES)
        # literal constraints filter; variables project/rename
        proj = []
        seen_in_atom: dict[str, str] = {}
        for role, term in zip(_ROLES, atom):
            if _is_var(term):
                if term in seen_in_atom:  # intra-atom repeat: equality
                    t = t.where(F.col(role) == F.col(seen_in_atom[term]))
                else:
                    seen_in_atom[term] = role
                    proj.append(F.col(role).alias(term[1:]))
            else:
                t = t.where(F.col(role) == F.lit(term))
        step = t.select(*proj)
        if out is None:
            out = step
            bound = set(seen_in_atom)
        else:
            shared = [v[1:] for v in seen_in_atom if v in bound]
            if not shared:
                raise ValueError(
                    f"atom {i} shares no variable with previous atoms "
                    "(would be a cartesian product)"
                )
            out = out.join(step, shared)
            bound |= set(seen_in_atom)
    return out.distinct()
