"""Entity salience + entity-linking training contexts over gazetteer
occurrences.

The reference service answers "which entities appear on this page"
(/root/reference/src/hu_entity/named_entity.py:25-42 — a flat NamedEntity
list per request, no notion of how IMPORTANT each entity is to the page).
A KG built from 10^12 pages needs the next two derivatives of that same
match set:

- :func:`mention_salience` — per (doc, entity) importance, the standard
  aboutness signal (frequency share within the doc + earliness of first
  mention) used to weight fact evidence and rank entity profiles;
- :func:`mention_contexts` — (left-context, mention, right-context) word
  windows around each first occurrence, the training-example shape an
  entity-linking / NER model consumes.

Both are built on the SAME candidate machinery as the mention detectors
(kg/stages/mentions.py): the gated n-gram span explosion and the
broadcast gazetteer-dim join, so the planning bounds (``plan_gazetteer``)
and the huge-dictionary regime (``broadcast_dim=False`` -> AQE-planned
shuffle join) carry over unchanged.

Scale shapes:
- gazetteer_occurrences: gated explosion (spans only at dictionary first
  words) -> broadcast dim join; no shuffle at all — output is
  occurrence-grain and flows straight into the consumer's aggregation.
- mention_salience: ONE partial-aggregable groupBy on (id, entity), then
  a window over id and an id-keyed join against the per-doc word counts —
  the window and the join reuse one HashPartitioning(id) exchange of
  (entity-grain, tiny) rows. The docs text column is scanned twice (spans
  + word counts); the explosion scan dominates, and on a real deployment
  the per-doc word count is a stored column (kg/ops/textstats.token_stats)
  passed via ``doc_words=``.
- mention_contexts: groupBy (id, entity, surface) for first occurrences,
  then an id-keyed join back to the words array and pure slice/join
  expressions — one match-grain shuffle plus the join exchange; the
  context windows are array-local (whole-stage codegen, no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kg.normalize import PUNCT
from kg.stages.mentions import GazetteerPlan, ngram_spans_df, plan_gazetteer

__all__ = [
    "gazetteer_occurrences",
    "mention_salience",
    "mention_contexts",
]


def _words(col: str = "text"):
    return F.filter(F.split(F.col(col), r"\s+"), lambda x: x != F.lit(""))


def gazetteer_occurrences(
    docs: DataFrame,
    gazetteer: DataFrame,
    max_words: int | None = None,
    id_col: str = "url",
    plan: GazetteerPlan | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """EVERY gazetteer occurrence with word positions:
    (id_col, entity_name, surface, start, end).

    Unlike the detectors' longest-match winners this keeps all raw
    matches — the occurrence-grain input salience and context extraction
    aggregate over. The dim is deduped to distinct (entity_name,
    value_norm) so two aliases normalizing identically count once.
    """
    if plan is None:
        plan = plan_gazetteer(gazetteer)
    if max_words is None:
        max_words = plan.max_words
    spans = ngram_spans_df(docs, max_words, id_col, start_words=plan.gate)
    normalized = spans.select(
        id_col,
        "start",
        "end",
        F.btrim(F.col("span"), F.lit(PUNCT)).alias("surface"),
    ).withColumn("key", F.lower("surface"))
    dim = (
        gazetteer.select(F.col("value_norm").alias("key"), "entity_name")
        .distinct()
    )
    joined = normalized.join(F.broadcast(dim) if broadcast_dim else dim, "key")
    return joined.select(id_col, "entity_name", "surface", "start", "end")


def mention_salience(
    docs: DataFrame,
    gazetteer: DataFrame,
    max_words: int | None = None,
    id_col: str = "url",
    plan: GazetteerPlan | None = None,
    broadcast_dim: bool = True,
    w_share: float = 0.6,
    w_early: float = 0.4,
    doc_words: DataFrame | None = None,
) -> DataFrame:
    """Per-(doc, entity) salience:
    ``round(w_share * mention_share + w_early * earliness, 4)`` where
    mention_share = this entity's occurrences / all gazetteer occurrences
    in the doc, and earliness = 1 - first_start / doc_word_count (a lead
    mention scores ~w_share + w_early, a single trailing mention ~0).

    Output: (id_col, entity_name, n_mentions, first_start, salience).

    ``doc_words``: optional precomputed (id_col, n_words) — pass it when
    word counts are already a stored column to skip the second text scan.
    """
    occ = gazetteer_occurrences(
        docs, gazetteer, max_words, id_col, plan, broadcast_dim
    )
    per = occ.groupBy(id_col, "entity_name").agg(
        F.count("*").cast("long").alias("n_mentions"),
        F.min("start").cast("long").alias("first_start"),
    )
    if doc_words is None:
        doc_words = docs.select(
            id_col, F.size(_words("text")).alias("n_words")
        ).where(F.col("n_words") > 0)
    shared = F.sum("n_mentions").over(Window.partitionBy(id_col))
    return (
        per.withColumn("doc_mentions", shared)
        .join(doc_words, id_col)
        .select(
            id_col,
            "entity_name",
            "n_mentions",
            "first_start",
            F.round(
                F.lit(w_share) * (F.col("n_mentions") / F.col("doc_mentions"))
                + F.lit(w_early)
                * (F.lit(1.0) - F.col("first_start") / F.col("n_words")),
                4,
            ).alias("salience"),
        )
    )


def mention_contexts(
    docs: DataFrame,
    gazetteer: DataFrame,
    k: int = 3,
    max_words: int | None = None,
    id_col: str = "url",
    plan: GazetteerPlan | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Entity-linking training examples: the FIRST occurrence of each
    distinct (doc, entity, surface) candidate with up to ``k`` words of
    context on each side (clipped at doc edges).

    Output: (id_col, entity_name, surface, start, ctx_left, ctx_right) —
    start is the 0-based word index of the mention's first word.

    First-occurrence-per-candidate matches the detectors' `firsts` grain
    (kg/stages/mentions.py detect_gazetteer_mentions), so one example per
    candidate the winners fold would consider.
    """
    occ = gazetteer_occurrences(
        docs, gazetteer, max_words, id_col, plan, broadcast_dim
    )
    firsts = occ.groupBy(id_col, "entity_name", "surface").agg(
        F.min(F.struct("start", "end")).alias("pos")
    )
    words = docs.select(id_col, _words("text").alias("_w"))
    s, e = F.col("pos.start"), F.col("pos.end")
    left_start = F.greatest(s - F.lit(k), F.lit(0)) + F.lit(1)
    return (
        firsts.join(words, id_col)
        .select(
            id_col,
            "entity_name",
            "surface",
            s.cast("long").alias("start"),
            F.array_join(
                F.slice(F.col("_w"), left_start, F.least(F.lit(k), s)), " "
            ).alias("ctx_left"),
            F.array_join(
                F.slice(
                    F.col("_w"),
                    e + F.lit(2),
                    F.least(F.lit(k), F.size("_w") - e - F.lit(1)),
                ),
                " ",
            ).alias("ctx_right"),
        )
    )
