"""Stage 2: dictionary + regex mention detection, fully relational.

Re-expresses the reference's find-entities semantics (oracle: kg/oracle.py;
reference behavior pinned at /root/reference/src/hu_entity/
legacy_entity_finder.py:53-122) as DataFrame algebra — no Python in the hot
path at all; every operator here is JVM-side / whole-stage-codegen:

  docs --split--> word arrays
       --transform/flatten/explode--> n-gram spans (capped at the longest
            dictionary phrase: a span longer than any value can never match,
            so the reference's O(n^2) span generation collapses to O(n*L))
       --btrim+lower--> normalized span key
       --BROADCAST hash join--> gazetteer dim  (the trie-membership analogue)
       --groupBy(url, entity) max_by(len, -pos)--> longest-match winners
  words --LEFT ANTI join value-matched surfaces--> value-over-regex priority
       --broadcast regex dim + regexp_like fullmatch--> regex mentions
  union --> mentions(url, matched_word, entity_name, detector)

Scale notes:
- gazetteer and regex dims are broadcast (F.broadcast) — the fact side never
  shuffles for the join.
- the only shuffles are the two aggregations keyed by (url, ...) — both are
  partial-aggregated map-side first (Catalyst HashAggregate pairs).
- span explosion is bounded: rows_out <= words_per_doc * max_phrase_words.
- AQE skew-join handles hot normalized values (e.g. "coffee" at 30% of docs).

Semantics notes (vs the oracle, tested in tests/test_mentions_spark.py):
- candidate dedup keeps the first (start, end) occurrence per distinct
  (url, entity, surface) — equivalent to the reference's words_matched-set
  skip for identical repeats (entity_finder.py:77,84).
- winner = max by (char length, then earliest first occurrence) — the
  reference's first-wins-ties fold (entity_finder.py:64-69).
- regex matching is CASE-SENSITIVE fullmatch on the punctuation-stripped
  single word; fullmatch == RLIKE with '^(?:...)$' wrapping. Patterns are
  validated with re.compile on the driver first (fail-fast, the HTTP-400
  analogue at server.py:124-128). Dialect caveat: patterns execute under
  Java regex on the JVM; the fixture patterns are dialect-neutral.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kg.normalize import PUNCT
from kg.oracle import BadRegexError

MENTIONS_SCHEMA = "url string, matched_word string, entity_name string, detector string"


@dataclass(frozen=True)
class GazetteerPlan:
    """Driver-side planning inputs derived from a gazetteer dim, computed
    ONCE PER DIM (``plan_gazetteer``) and passed to any number of
    ``detect_mentions`` / ``detect_gazetteer_mentions`` calls.

    On a real cluster the dictionary is per-job state: planning it per call
    re-runs the (bounded) planning aggregation and its driver round-trip on
    every query over the same dim — measured ~1s of fixed cost per call on
    the bench corpus (VERDICT r2). Callers that pass ``plan=`` skip that
    entirely; the per-call path (plan=None) remains for one-shot use.
    """

    max_words: int
    first_words: tuple[str, ...]
    overflowed: bool

    @property
    def gate(self) -> list[str] | None:
        """Start-word gate, or None when the dim overflowed _GATE_LIMIT."""
        if self.first_words and not self.overflowed:
            return list(self.first_words)
        return None


def plan_gazetteer(gazetteer: DataFrame) -> GazetteerPlan:
    """ONE bounded driver round-trip -> reusable GazetteerPlan."""
    max_words, first_words, overflowed = _dim_planning_inputs(gazetteer)
    return GazetteerPlan(max_words, tuple(first_words), overflowed)


def gazetteer_dim(spark: SparkSession, entities: dict[str, list[str]]) -> DataFrame:
    """Flatten {entity_name: [values]} into the broadcastable gazetteer dim
    (entity_name, value, value_norm). Normal form = lower then strip-punct
    ends, matching kg.normalize.norm_value."""
    rows = [(n, v) for n, values in entities.items() for v in values]
    df = spark.createDataFrame(rows, "entity_name string, value string")
    return df.select(
        "entity_name",
        "value",
        F.btrim(F.lower("value"), F.lit(PUNCT)).alias("value_norm"),
        F.size(F.split(F.btrim(F.lower("value"), F.lit(PUNCT)), r"\s+")).alias(
            "n_words"
        ),
    )


def regex_dim(spark: SparkSession, regex_entities: dict[str, str]) -> DataFrame:
    """Validate (fail fast on bad patterns) and build the regex dim."""
    for name, pattern in regex_entities.items():
        try:
            re.compile(pattern)
        except re.error as exc:
            raise BadRegexError(f"invalid regex for entity {name!r}: {exc}") from exc
    return regex_dim_from_df_rows(spark, list(regex_entities.items()))


def regex_dim_from_df_rows(spark, rows):  # noqa: ANN001
    if not rows:
        return spark.createDataFrame([], "entity_name string, pattern string")
    return spark.createDataFrame(rows, "entity_name string, pattern string")


def _words_col(text: str | Column = "text") -> Column:
    """Python str.split() equivalent: split on whitespace runs, drop empties."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, r"\s+"), lambda x: x != F.lit(""))


def ngram_spans_df(
    docs: DataFrame,
    max_words: int,
    id_col: str = "url",
    start_words: list[str] | None = None,
) -> DataFrame:
    """Explode contiguous word n-grams up to ``max_words`` per doc.

    Output: (id_col, start, end, span). Entirely built-in array functions —
    transform/sequence/slice/flatten stay inside whole-stage codegen.

    ``start_words``: optional start-position gate — spans are generated ONLY
    at positions whose fully-normalized word is in the set. Passing the
    distinct (normalized) FIRST words of the gazetteer phrases is
    semantics-preserving: a span can only match a phrase whose first word
    it starts with (if leftstrip(w) == g then fullstrip(w) == fullstrip(g),
    so the full-strip superset test never drops a true match). This prunes
    the explosion BEFORE the join instead of after it.

    PERF: the words array is materialized as a column BEFORE the nested
    transform. If the filter(split(...)) expression itself is referenced
    inside the inner lambda, Catalyst re-evaluates the split per emitted
    span — measured ~30x slower on the sf0.1 corpus.
    """
    src = docs.select(id_col, _words_col("text").alias("_w"))
    w = F.col("_w")
    if start_words is None:
        starts = F.sequence(F.lit(0), F.size(w) - 1)
    else:
        starts = F.filter(
            F.sequence(F.lit(0), F.size(w) - 1),
            lambda i: F.btrim(
                F.lower(F.element_at(w, i + 1)), F.lit(PUNCT)
            ).isin(*start_words),
        )
    spans = F.flatten(
        F.transform(
            starts,
            lambda i: F.transform(
                F.sequence(i, F.least(F.size(w) - 1, i + F.lit(max_words - 1))),
                lambda j: F.struct(
                    i.alias("start"),
                    j.alias("end"),
                    F.array_join(F.slice(w, i + 1, j - i + 1), " ").alias("span"),
                ),
            ),
        )
    )
    return (
        src.where(F.size(w) > 0)
        .select(id_col, F.explode(spans).alias("sp"))
        .select(id_col, "sp.start", "sp.end", "sp.span")
    )


#: start-word gates larger than this skip the isin literal (plan bloat) and
#: rely on the broadcast join alone
_GATE_LIMIT = 512


def _dim_planning_inputs(gazetteer: DataFrame) -> tuple[int, list[str], bool]:
    """(max_phrase_words, sorted distinct first words truncated to
    _GATE_LIMIT, overflowed?) in ONE driver round-trip with bounded result
    size. Scale-regime guard for the round-1 full collect of value_norm
    (VERDICT r01 finding 5): the dim may exceed broadcast-small when callers
    use the salted-dim path."""
    first_word = F.btrim(
        F.element_at(F.split(F.col("value_norm"), r"\s+"), 1), F.lit(PUNCT)
    )
    n_words = (
        F.col("n_words")
        if "n_words" in gazetteer.columns
        else F.size(F.split(F.col("value_norm"), r"\s+"))
    )
    row = gazetteer.agg(
        F.max(n_words).alias("mw"),
        F.slice(
            F.sort_array(
                F.collect_set(
                    F.when(first_word != F.lit(""), first_word)
                )
            ),
            1,
            _GATE_LIMIT + 1,
        ).alias("fw"),
    ).first()
    max_words = int(row["mw"]) if row["mw"] is not None else 1
    fw = list(row["fw"] or [])
    return max(max_words, 1), fw[:_GATE_LIMIT], len(fw) > _GATE_LIMIT


def detect_gazetteer_mentions(
    docs: DataFrame,
    gazetteer: DataFrame,
    max_words: int | None = None,
    id_col: str = "url",
    share_scan: bool = True,
    cache_handles: list | None = None,
    broadcast_dim: bool = True,
    plan: GazetteerPlan | None = None,
    co_partition: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Value-entity pass. Returns (winners, matched_surfaces).

    ``broadcast_dim=False`` is the huge-dictionary regime: the dim join is
    left to Catalyst/AQE (shuffled hash or sort-merge with skew-join
    splitting) instead of forcing a broadcast that would not fit. The
    planning aggregation is already bounded either way
    (_dim_planning_inputs), so nothing else changes.

    ``plan``: precomputed :class:`GazetteerPlan` (plan_gazetteer) — skips
    the per-call planning aggregation; per-job state on a real cluster.

    ``co_partition=True``: hash-repartition the docs by ``id_col`` BEFORE
    the span explosion. Every downstream clustering requirement (the firsts
    candidate dedup on (id, entity, surface), the winners fold on
    (id, entity), the matched-surfaces distinct on (id, surface) and the
    regex anti-join on (id, word)) is then satisfied by the same
    HashPartitioning(id): Catalyst elides ALL their exchanges and the whole
    mentions tree shuffles exactly once — the docs — instead of shuffling
    match-sized intermediates three times. This is the in-plan equivalent
    of storing docs bucketed by url hash; when the input scan already
    provides that partitioning, leave it False and the aggregation
    exchanges still elide.

    winners: (url, matched_word, entity_name) after the longest-match fold.
    matched_surfaces: distinct (url, surface) of ALL value matches pre-fold —
    the words_matched set the regex pass anti-joins against.

    ``cache_handles``: pass a list to receive any DataFrame this call
    persists (the shared ``firsts`` subtree) so long-lived sessions can
    ``unpersist()`` after materializing both consumers — otherwise repeated
    calls accumulate cached relations until LRU eviction.
    """
    # ONE driver round-trip for all dim-derived planning inputs (max phrase
    # width + the start-word gate), with BOUNDED transfer: the aggregation
    # returns at most _GATE_LIMIT+1 first words regardless of dim size, so a
    # multi-million-row alias dictionary never round-trips its values to the
    # driver (the distinct-first-word set is reduced executor-side by the
    # partial-aggregated collect_set; only the sliced prefix is shipped).
    # A precomputed plan skips even that.
    if plan is None:
        plan = plan_gazetteer(gazetteer)
    if max_words is None:
        max_words = plan.max_words
    # start-position gate: the distinct normalized first words of the
    # dictionary phrases. Inlined as an isin literal while small; for very
    # large alias dictionaries skip the gate — the broadcast join does the
    # filtering and the literal would bloat the plan.
    gate = plan.gate
    if co_partition:
        docs = docs.repartition(F.col(id_col))
    spans = ngram_spans_df(docs, max_words, id_col, start_words=gate)
    normalized = spans.select(
        id_col,
        "start",
        "end",
        F.btrim(F.col("span"), F.lit(PUNCT)).alias("surface"),
    ).withColumn("key", F.lower("surface"))

    dim = gazetteer.select(F.col("value_norm").alias("key"), "entity_name")
    joined = normalized.join(
        F.broadcast(dim) if broadcast_dim else dim, "key"
    )

    # first occurrence per distinct candidate, then longest-match fold:
    # max by (length, earliest start, earliest end) == first-wins-ties.
    firsts = joined.groupBy(id_col, "entity_name", "surface").agg(
        F.min(F.struct("start", "end")).alias("pos")
    )
    # The winners fold and the words_matched set are two consumers of the
    # span-join subtree; without sharing, each recomputes the explosion.
    # share_scan=True (default) persists `firsts` — O(matches), ~25x smaller
    # than the explosion — with MEMORY_AND_DISK: no synchronization barrier
    # (unlike checkpoint: measured 15.5s vs 6.8s at local[32]), both
    # branches read cached partitions, spills gracefully under executor
    # memory pressure. Measured best-of-three strategies at local[8]/200k
    # docs: persist 19.0s, localCheckpoint 20.7s, recompute 29.5s. The
    # cached table is LRU-evicted; callers building the plan in a tight
    # loop can pass share_scan=False to avoid cache churn (recompute wins
    # anyway when cores greatly outnumber the span-pass cost).
    if share_scan:
        from pyspark import StorageLevel

        firsts = firsts.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_handles is not None:
            cache_handles.append(firsts)
    # words_matched set == distinct matched surfaces (entity_finder.py:77,84)
    matched_surfaces = firsts.select(id_col, "surface").distinct()
    winners = firsts.groupBy(id_col, "entity_name").agg(
        F.max_by(
            F.col("surface"),
            F.struct(
                F.length("surface").alias("l"),
                (-F.col("pos.start")).alias("ns"),
                (-F.col("pos.end")).alias("ne"),
            ),
        ).alias("matched_word")
    )
    return winners.select(id_col, "matched_word", "entity_name"), matched_surfaces


def detect_regex_mentions(
    docs: DataFrame,
    regexes: DataFrame | list,
    matched_surfaces: DataFrame,
    id_col: str = "url",
) -> DataFrame:
    """Regex-entity pass: single words only, case-sensitive fullmatch on the
    stripped surface, skipping raw words already value-matched (O13+O14).

    Plan shape: regex-filter FIRST (map-side, cheap rejection of the vast
    majority of words), distinct + anti-join only the matches — the distinct
    shuffle then carries matched rows only, not the whole corpus word list.
    """
    # the regex dim is small by construction (driver-validated patterns):
    # inline each as a LITERAL rlike so the match runs compiled inside
    # whole-stage codegen — a column-valued pattern is interpreted per row.
    # ALL patterns are evaluated in ONE scan of the exploded word list (an
    # array of CASE WHENs, nulls compacted away, matches exploded): a
    # union-of-filtered-branches plan re-runs the word explosion once per
    # pattern — measured ~3x slower at 3 patterns on the bench corpus.
    pats = (
        regexes
        if isinstance(regexes, list)
        else regexes.select("entity_name", "pattern").collect()
    )
    if not pats:
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} string, matched_word string, entity_name string"
        )
    words = docs.select(id_col, F.explode(_words_col("text")).alias("word"))
    stripped = words.withColumn("matched_word", F.btrim(F.col("word"), F.lit(PUNCT)))
    matched_names = F.array_compact(
        F.array(*[
            # fullmatch == RLIKE with the pattern wrapped in ^(?:...)$
            F.when(
                F.col("matched_word").rlike(f"^(?:{r['pattern']})$"),
                F.lit(r["entity_name"]),
            )
            for r in pats
        ])
    )
    hits = stripped.select(
        id_col, "word", "matched_word", F.explode(matched_names).alias("entity_name")
    ).distinct()
    # value-over-regex priority: the RAW word is tested against the stripped
    # value-matched surfaces (reference's words_matched asymmetry)
    eligible = hits.join(
        matched_surfaces.withColumnRenamed("surface", "word"),
        [id_col, "word"],
        "left_anti",
    )
    return eligible.select(id_col, "matched_word", "entity_name").distinct()


def detect_mentions(
    docs: DataFrame,
    gazetteer: DataFrame,
    regexes: DataFrame | None = None,
    id_col: str = "url",
    share_scan: bool = True,
    cache_handles: list | None = None,
    broadcast_dim: bool = True,
    plan: GazetteerPlan | None = None,
    co_partition: bool = False,
) -> DataFrame:
    """Full mention detection: gazetteer winners UNION regex matches, with
    value-over-regex priority. Output matches kg.oracle.find_entities_rows.
    ``cache_handles``/``broadcast_dim``/``plan``/``co_partition``: see
    detect_gazetteer_mentions. With co_partition the single docs
    repartition is shared by the gazetteer AND regex passes (ReuseExchange:
    both branches read the same shuffle output), so the full
    dictionary+regex tree still shuffles the corpus exactly once."""
    if co_partition:
        docs = docs.repartition(F.col(id_col))
    winners, matched_surfaces = detect_gazetteer_mentions(
        docs, gazetteer, id_col=id_col, share_scan=share_scan,
        cache_handles=cache_handles, broadcast_dim=broadcast_dim,
        plan=plan,
    )
    gaz = winners.withColumn("detector", F.lit("gazetteer"))
    # one driver round-trip for the (small) regex dim; an .isEmpty() probe
    # would be a second one
    pats = (
        regexes.select("entity_name", "pattern").collect()
        if regexes is not None
        else []
    )
    if not pats:
        return gaz.select(id_col, "matched_word", "entity_name", "detector")
    rx = detect_regex_mentions(docs, pats, matched_surfaces, id_col).withColumn(
        "detector", F.lit("regex")
    )
    return gaz.unionByName(rx).select(id_col, "matched_word", "entity_name", "detector")
