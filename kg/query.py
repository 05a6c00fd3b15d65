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

__all__ = ["match_pattern", "match_path"]

_ROLES = ("subj_id", "pred", "obj_id")


def _is_var(term) -> bool:  # noqa: ANN001
    return isinstance(term, str) and term.startswith("?")


def _atom_step(facts: DataFrame, atom: tuple, i: int):
    """One BGP atom -> (projected DataFrame, bare variable names)."""
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
    return t.select(*proj), {v[1:] for v in seen_in_atom}


def match_pattern(
    facts: DataFrame,
    pattern: Sequence[tuple],
    optional: Sequence[tuple] = (),
    anti: Sequence[tuple] = (),
) -> DataFrame:
    """Match a conjunction of (subj, pred, obj) atoms against
    facts(subj_id, pred, obj_id); terms starting with '?' are variables,
    anything else is a literal constraint (entity id for subj/obj, pred
    string for pred). Returns DISTINCT variable bindings, one column per
    variable (set semantics — deterministic under any partitioning).

    A variable repeated INSIDE one atom constrains equality (e.g.
    (?x, knows, ?x)); across atoms it joins. Every atom after the first
    must share at least one variable with the atoms before it.

    ``optional``: SPARQL OPTIONAL blocks of one atom each — a LEFT join:
    bindings that match extend with the atom's new variables, bindings
    that don't survive with nulls. Applied after the required pattern,
    in order (each may chain on variables an earlier optional bound).

    ``anti``: SPARQL FILTER NOT EXISTS atoms — a left-anti join on the
    shared variables, applied LAST (after optionals, per SPARQL group
    semantics); variables private to an anti atom are existential and
    never appear in the output.

    Scale shape unchanged: every optional/anti atom is one more keyed
    equi-join on its pred-pruned fact slice — no new shuffle family, and
    AQE still broadcasts selective slices.
    """
    if not pattern:
        raise ValueError("empty pattern")
    out: DataFrame | None = None
    bound: set[str] = set()
    for i, atom in enumerate(pattern):
        step, atom_vars = _atom_step(facts, atom, i)
        if out is None:
            out = step
            bound = atom_vars
        else:
            shared = sorted(atom_vars & bound)
            if not shared:
                raise ValueError(
                    f"atom {i} shares no variable with previous atoms "
                    "(would be a cartesian product)"
                )
            out = out.join(step, shared)
            bound |= atom_vars
    for i, atom in enumerate(optional):
        step, atom_vars = _atom_step(facts, atom, i)
        shared = sorted(atom_vars & bound)
        if not shared:
            raise ValueError(
                f"optional atom {i} shares no variable with the pattern "
                "(would be a cartesian product)"
            )
        out = out.join(step, shared, "left")
        bound |= atom_vars
    for i, atom in enumerate(anti):
        step, atom_vars = _atom_step(facts, atom, i)
        shared = sorted(atom_vars & bound)
        if not shared:
            raise ValueError(
                f"anti atom {i} shares no variable with the pattern "
                "(nothing to filter on)"
            )
        out = out.join(step.select(*shared).distinct(), shared, "left_anti")
    return out.distinct()


def match_path(
    facts: DataFrame,
    path: Sequence,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """SPARQL-style property-path evaluation over facts(subj_id, pred,
    obj_id): DISTINCT (src, dst) pairs connected by the whole path.
    Each step is one of

    - ``"p"``            — one forward hop via predicate p,
    - ``("inv", "p")``   — one inverse hop (object to subject),
    - ``("+", "p", d)``  — bounded transitive closure p+ (1..d hops,
      via :func:`kg.reason.infer_transitive` — semi-naive, frontier-only
      joins).

    Scale shape: one equi-join per step, each hop table pre-filtered to
    its predicate (pred-partition pruning applies on a pred-partitioned
    fact store), DISTINCT after every step so bindings stay a set and a
    diamond-shaped graph can't multiply rows through later joins. No
    cartesian path exists (every join is keyed on the running binding).
    """
    if not path:
        raise ValueError("empty path")
    from kg.reason import infer_transitive

    pairs: DataFrame | None = None
    for i, step in enumerate(path):
        if isinstance(step, str):
            hop = facts.where(F.col("pred") == step).select(
                F.col("subj_id").alias("_a"), F.col("obj_id").alias("_b")
            )
        elif step[0] == "inv":
            hop = facts.where(F.col("pred") == step[1]).select(
                F.col("obj_id").alias("_a"), F.col("subj_id").alias("_b")
            )
        elif step[0] == "+":
            hop = infer_transitive(
                facts, pred=step[1], max_depth=int(step[2])
            ).select(
                F.col("subj_id").alias("_a"), F.col("obj_id").alias("_b")
            )
        else:
            raise ValueError(f"step {i} not recognized: {step!r}")
        hop = hop.distinct()
        if pairs is None:
            pairs = hop.select(
                F.col("_a").alias(src_col), F.col("_b").alias("_cur")
            )
        else:
            pairs = (
                pairs.join(hop, pairs["_cur"] == hop["_a"])
                .select(src_col, F.col("_b").alias("_cur"))
            )
        pairs = pairs.distinct()
    return pairs.select(src_col, F.col("_cur").alias(dst_col))
