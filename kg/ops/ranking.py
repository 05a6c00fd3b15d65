"""Lexical ranking over the corpus: vocabulary construction, TF-IDF
term weighting, and BM25 retrieval.

These are the retrieval-side counterparts of the dedup/quality ladder —
a 100-TB webtext engine needs them both to curate (salient-term
extraction, vocab pruning) and to serve (BM25 candidate generation for
entity-linking / RAG-style lookups). The reference exposes only
per-request NER (/root/reference/src/hu_entity/server.py); these
generalize its corpus to a queryable index.

Everything is built-in column expressions plus shuffles Catalyst plans
itself — no Python in the hot path — and each operator has a
line-for-line ANSI-SQL oracle in __spark_entry__.oracle_sql.

Scale shapes:
- postings (the shared substrate): explode(words) -> groupBy(doc, term)
  with partial aggregation. One corpus shuffle; everything downstream
  reuses it.
- vocab: one further partial-agged groupBy(term) + a global top-V
  (takeOrdered-style: V is small, the sort is on the aggregated vocab,
  never the corpus).
- tfidf_topk: postings ⋈ broadcast(df-per-term) — document frequencies
  are vocabulary-sized, tiny next to postings — then a per-doc window
  that reuses the postings partitioning.
- bm25: the query term list is a literal broadcast filter, so the
  postings scan prunes to |query| terms before any shuffle; per-doc
  scoring is then an aggregation over a few rows per doc.

Float determinism: idf/scores are computed in IEEE double from exact
ints with ln(), and rounded to 6 places — reproducible across Spark and
DuckDB (both use the platform libm-quality log on doubles).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["postings", "corpus_vocab", "tfidf_topk", "bm25_search",
           "positional_postings", "phrase_search", "near_search",
           "cooccurrence_edges", "textrank_keywords",
           "rake_keyphrases", "RAKE_STOPWORDS", "induce_stopwords"]


def postings(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc, term, tf) postings list: lowercase whitespace tokens.

    The one corpus-sized shuffle of this module; vocab/tfidf/bm25 all
    derive from it.
    """
    words = F.filter(
        F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit("")
    )
    return (
        docs.select(F.col(id_col).alias("doc"), F.explode(words).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count("*").alias("tf"))
    )


def corpus_vocab(
    docs: DataFrame, top_v: int = 1000, id_col: str = "doc_id"
) -> DataFrame:
    """Top-``top_v`` vocabulary by collection frequency: (term, cf, df),
    deterministic tie-break on the term itself.

    The global rank runs on the aggregated term table (|vocab| rows),
    not the corpus; at 100 TB that table is millions of rows — a single
    window over it is fine, and the corpus itself never re-shuffles.
    """
    p = postings(docs, id_col)
    terms = p.groupBy("term").agg(
        F.sum("tf").cast("long").alias("cf"),
        F.count("*").cast("long").alias("df"),
    )
    w = Window.orderBy(F.col("cf").desc(), F.col("term"))
    return (
        terms.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_v)
        .select("term", "cf", "df", F.col("rank").cast("long").alias("rank"))
    )


def _idf(df_col, n_docs: int):
    # BM25-style smoothed idf: ln((N - df + 0.5) / (df + 0.5) + 1) —
    # always positive, standard Lucene form
    return F.log(
        (F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
        + F.lit(1.0)
    )


def tfidf_topk(
    docs: DataFrame, k: int = 5, id_col: str = "doc_id"
) -> DataFrame:
    """Top-``k`` salient terms per document by tf·idf
    (idf = ln((N+1)/(df+1)) + 1, the smoothed sklearn form), ties broken
    by term. Returns (doc, term, tf, score, pos).
    """
    n_docs = docs.count()
    p = postings(docs, id_col)
    dfreq = p.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.lit(float(n_docs) + 1.0)) / (F.col("df") + F.lit(1.0))
    ) + F.lit(1.0)
    scored = p.join(F.broadcast(dfreq), "term").select(
        "doc",
        "term",
        "tf",
        F.round(F.col("tf") * idf, 6).alias("score"),
    )
    w = Window.partitionBy("doc").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select("doc", "term", "tf", "score", F.col("pos").cast("long"))
    )


def bm25_search(
    docs: DataFrame,
    query_terms: Sequence[str],
    top_n: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranking of documents against a bag of query terms.

    Returns the ``top_n`` (doc, score, n_hits) rows, score rounded to 6
    places, ties broken by doc id. The postings scan is pruned to the
    query's terms by a literal isin filter BEFORE any shuffle, so the
    per-query cost is proportional to the query terms' posting lists,
    not the corpus.
    """
    qs = sorted(set(query_terms))
    p = postings(docs, id_col)
    # corpus stats: N and average doc length (in whitespace tokens) —
    # two scalar aggregates, computed once per query batch in practice
    lens = p.groupBy("doc").agg(F.sum("tf").alias("dl"))
    n_docs = docs.count()
    avgdl = lens.agg(F.avg("dl")).first()[0] or 1.0  # empty corpus guard

    hits = p.where(F.col("term").isin(qs))
    dfreq = hits.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(lens, "doc")
        .select(
            "doc",
            "term",
            (
                _idf(F.col("df"), n_docs)
                * (F.col("tf") * (F.lit(k1) + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.lit(float(avgdl))
                    )
                )
            ).alias("s"),
        )
    )
    agg = scored.groupBy("doc").agg(
        F.round(F.sum("s"), 6).alias("score"),
        F.count("*").cast("long").alias("n_hits"),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select("doc", "score", "n_hits", F.col("rank").cast("long"))
    )


def positional_postings(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc, term, pos) positional postings: lowercase whitespace tokens
    with their 0-based word position — the index shape phrase and
    proximity queries need (BM25's (doc, term, tf) substrate cannot see
    adjacency). Pure map (posexplode), no shuffle; phrase_search joins
    it per query term."""
    words = F.filter(
        F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit("")
    )
    return docs.select(
        F.col(id_col).alias("doc"), F.posexplode(words).alias("pos", "term")
    )


def phrase_search(
    docs: DataFrame, phrase: str, id_col: str = "doc_id"
) -> DataFrame:
    """Exact phrase retrieval: documents containing the (lowercased,
    whitespace-tokenized) words of ``phrase`` CONSECUTIVELY. Returns
    (doc, first_pos, n_occurrences) — first_pos is the 0-based word
    position of the earliest occurrence.

    Plan: the positional postings are filtered to the |phrase| query
    terms BEFORE any shuffle (a literal isin prunes the corpus at the
    scan), then one equi-join per subsequent term on
    (doc, pos - offset) — adjacency as a join key, never a string scan
    over full documents. k-1 joins for a k-word phrase, each on
    corpus-pruned inputs; the final rollup is one partial-agged groupBy
    per doc.
    """
    terms = [w for w in phrase.lower().split() if w]
    if not terms:
        raise ValueError("empty phrase")
    pp = positional_postings(docs, id_col)
    pruned = pp.where(F.col("term").isin(terms))
    cur = pruned.where(F.col("term") == terms[0]).select(
        "doc", F.col("pos").alias("start")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = pruned.where(F.col("term") == t).select(
            "doc", (F.col("pos") - i).alias("start")
        )
        cur = cur.join(nxt, ["doc", "start"])
    return cur.groupBy("doc").agg(
        F.min("start").cast("long").alias("first_pos"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
    )


def cooccurrence_edges(docs: DataFrame, window: int = 2) -> DataFrame:
    """Undirected word co-occurrence edges ``(a, b, wt)``: tokens at
    most ``window`` positions apart in the same document, pair order
    normalized (a = least, b = greatest), self-pairs dropped, wt =
    corpus-wide pair count.

    Scale shape: pair generation is ARRAY-LOCAL (nested transform over
    token positions — a pure JVM map emitting <= window pairs per
    token, no positional self-join), so the only shuffle is ONE
    partial-aggregable groupBy on the pair key. The output is
    vocabulary²-bounded, corpus-size-independent."""
    if window < 1:
        raise ValueError("window must be >= 1")
    words = F.filter(
        F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit("")
    )
    el = lambda i: F.element_at(F.col("_w"), i + 1)  # noqa: E731
    n = F.size(F.col("_w"))
    pairs = F.when(
        n >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.transform(
                    F.sequence(i + 1, F.least(i + window, n - 1)),
                    lambda j: F.struct(
                        F.least(el(i), el(j)).alias("a"),
                        F.greatest(el(i), el(j)).alias("b"),
                    ),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        docs.select(words.alias("_w"))
        .select(F.explode(pairs).alias("_p"))
        .where(F.col("_p.a") != F.col("_p.b"))
        .groupBy(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("double").alias("wt"))
    )


def textrank_keywords(
    docs: DataFrame,
    window: int = 2,
    iterations: int = 6,
    damping: float = 0.85,
) -> DataFrame:
    """TextRank keyword scoring (Mihalcea & Tarau 2004): rank every
    corpus term by weighted PageRank over the word co-occurrence graph
    — the unsupervised keyphrase/salience signal beside tf-idf (which
    scores per-doc; TextRank scores the vocabulary globally, feeding
    stopword induction and gazetteer seeding). Returns (term, rank).

    Composition, not new machinery: :func:`cooccurrence_edges` (one
    corpus shuffle) -> symmetrized edge list -> kg.graphstats.pagerank
    with ``weight_col`` (rank split proportional to co-occurrence
    count). The iteration cost is over the vocab-sized graph, never the
    corpus — at 100 TB the co-occurrence table is millions of rows
    while the corpus is billions, so the power iterations run on a dim.
    """
    from kg.graphstats import pagerank
    from kg.session import materialize

    # materialize the vocab^2-bounded pair table: pagerank() consumes
    # its edge input several times (node set, out-weight normalization,
    # weight validation) and each reference would otherwise re-run the
    # corpus-sized pair scan
    co = materialize(cooccurrence_edges(docs, window=window))
    edges = co.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "wt"
    ).unionByName(
        co.select(F.col("b").alias("src"), F.col("a").alias("dst"), "wt")
    )
    pr = pagerank(
        edges, iterations=iterations, damping=damping, weight_col="wt"
    )
    return pr.select(F.col("node").alias("term"), "rank")


#: delimiter words for RAKE candidate phrases — a fixed literal list so
#: the Spark regex and the DuckDB oracle build the IDENTICAL pattern
RAKE_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "from", "has", "have", "in", "is", "it", "its", "of", "on", "or",
    "that", "the", "this", "to", "was", "were", "will", "with",
)


def _rake_split_pattern() -> str:
    """Regex splitting lowercase text into candidate phrases: stopword
    tokens (word-boundary anchored) and punctuation runs both delimit.
    RE2-safe (no lookarounds), shared verbatim with the oracle."""
    alts = "|".join(RAKE_STOPWORDS)
    return r"\b(?:" + alts + r")\b|[^a-z0-9\s]+"


def rake_keyphrases(
    docs: DataFrame,
    top_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal stopword/punctuation-free runs; each word scores
    deg(w)/freq(w) over the DOCUMENT (deg = total length of phrases
    containing w, freq = occurrences), and a phrase scores the sum of
    its words\' scores. Returns (id_col, phrase_idx, phrase, score) —
    the ``top_k`` phrases per doc, score rounded to 6, ties -> earlier
    phrase. The per-doc complement of corpus-global textrank_keywords.

    Scale shape: ANOTHER pure map — phrase split, the per-doc word
    stats, phrase scoring, and the top-k pick are all array algebra
    inside one projection (let-binding idiom from kg/ops/summarize.py;
    no Exchange, pinned). Per-row cost O(P*W) with P phrases and W
    distinct words, both bounded by doc length. The oracle evaluates
    the SAME definition relationally (unnest + GROUP BY + join), a
    genuinely different strategy."""
    split_pat = _rake_split_pattern()
    phrases_expr = F.filter(
        F.transform(
            F.split(F.regexp_replace(F.lower(F.col(text_col)),
                                     split_pat, chr(1)), chr(1), -1),
            lambda p: F.trim(F.regexp_replace(p, r"\s+", " ")),
        ),
        lambda p: p != F.lit(""),
    )

    def _result(phrases):
        pwords = F.transform(
            phrases,
            lambda p: F.filter(
                F.split(p, " ", -1), lambda x: x != F.lit("")
            ),
        )

        def _with_words(pw):
            allw = F.array_distinct(F.flatten(pw))

            def _scored(words):
                # per distinct word: freq = occurrences across phrases,
                # deg = sum of containing-phrase lengths per occurrence
                stats = F.transform(
                    words,
                    lambda wrd: F.struct(
                        wrd.alias("w"),
                        F.aggregate(
                            pw, F.lit(0),
                            lambda acc, ph: acc
                            + F.size(F.filter(ph, lambda x: x == wrd)),
                        ).alias("freq"),
                        F.aggregate(
                            pw, F.lit(0),
                            lambda acc, ph: acc
                            + F.size(F.filter(ph, lambda x: x == wrd))
                            * F.size(ph),
                        ).alias("deg"),
                    ),
                )

                def _phrase_scores(st):
                    return F.transform(
                        F.sequence(F.lit(0), F.size(pw) - 1),
                        lambda i: F.struct(
                            (-F.aggregate(
                                F.element_at(pw, i + 1), F.lit(0.0),
                                lambda acc, wrd: acc
                                + F.element_at(
                                    F.filter(st, lambda s: s["w"] == wrd),
                                    1,
                                )["deg"].cast("double")
                                / F.element_at(
                                    F.filter(st, lambda s: s["w"] == wrd),
                                    1,
                                )["freq"].cast("double"),
                            )).alias("nscore"),
                            i.cast("int").alias("pidx"),
                        ),
                    )

                return F.element_at(
                    F.transform(F.array(stats), _phrase_scores), 1
                )

            return F.element_at(
                F.transform(F.array(allw), _scored), 1
            )

        return F.element_at(
            F.transform(F.array(pwords), _with_words), 1
        )

    base = docs.select(
        F.col(id_col), phrases_expr.alias("_ph")
    ).where(F.size("_ph") > 0)
    # total expression: stage fusion can evaluate the projection before
    # the size filter, so the empty-phrase branch must not error
    scores = F.when(
        F.size(F.col("_ph")) > 0, _result(F.col("_ph"))
    ).otherwise(F.array().cast("array<struct<nscore:double,pidx:int>>"))
    base = base.withColumn(
        "_sc", F.slice(F.array_sort(scores), 1, top_k)
    )
    return base.select(
        id_col, F.explode("_sc").alias("_p"), "_ph"
    ).select(
        id_col,
        F.col("_p.pidx").cast("int").alias("phrase_idx"),
        F.element_at("_ph", F.col("_p.pidx") + 1).alias("phrase"),
        F.round(-F.col("_p.nscore"), 6).alias("score"),
    )


def induce_stopwords(
    docs: DataFrame,
    max_df_ratio: float = 0.5,
    min_docs: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-driven stopword induction: terms whose document-frequency
    ratio exceeds ``max_df_ratio`` (they appear in more than that share
    of documents) are function-word candidates — the language-agnostic
    way to seed the tokenizer stoplists (kg/stoplists.py ships
    hand-curated tiers for 6 languages; a new language or domain corpus
    induces its own tier from this table). Returns
    (term, df, df_ratio, cf) sorted nowhere (callers rank); min_docs
    guards tiny corpora where one doc makes every term "frequent".

    Scale shape: reuses the postings substrate (one corpus shuffle),
    then one vocabulary-sized groupBy + a literal threshold filter —
    the corpus never re-shuffles."""
    n_docs = docs.count()
    p = postings(docs, id_col)
    stats = p.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    ratio = F.col("df") / F.lit(float(n_docs))
    return stats.where(
        (ratio > max_df_ratio) & (F.col("df") >= min_docs)
    ).select(
        "term", "df", F.round(ratio, 6).alias("df_ratio"), "cf"
    )


def near_search(
    docs: DataFrame,
    terms: "list[str] | tuple[str, ...]",
    window: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Unordered proximity retrieval (the NEAR operator): documents where
    an occurrence of ``terms[0]`` has an occurrence of EVERY other query
    term within ±``window`` word positions. Returns
    (doc, n_anchors, first_anchor) — anchor = a qualifying occurrence of
    the first term, first_anchor its earliest 0-based position. The
    missing rung between :func:`bm25_search` (bag of words) and
    :func:`phrase_search` (exact adjacency): "transformer NEAR/8
    attention" ranks co-located discussion without requiring the exact
    phrase.

    Plan: postings are pruned to the query terms AT THE SCAN (literal
    isin, like phrase_search); each non-anchor term then left-semi joins
    the anchors through a BUCKETED band join — both sides key on
    (doc, floor(pos / window)) with the anchor exploded to its 3
    adjacent buckets, so the range predicate |pos_i - pos_a| <= window
    rides on an EQUI join (the events_range_join trick; no
    BroadcastNestedLoopJoin ever). k-1 semi joins on corpus-pruned
    inputs + one partial-agged rollup.
    """
    qs = [t.lower() for t in terms if t]
    if not qs:
        raise ValueError("empty term list")
    w = int(window)
    if w < 1:
        raise ValueError("window must be >= 1")
    pp = positional_postings(docs, id_col)
    pruned = pp.where(F.col("term").isin(qs))
    anchors = pruned.where(F.col("term") == qs[0]).select(
        "doc", F.col("pos").alias("apos")
    )
    for t in qs[1:]:
        others = pruned.where(F.col("term") == t).select(
            "doc",
            F.col("pos").alias("opos"),
            F.floor(F.col("pos") / w).alias("bkt"),
        )
        probe = anchors.select(
            "doc",
            "apos",
            F.explode(
                F.array(
                    F.floor(F.col("apos") / w) - 1,
                    F.floor(F.col("apos") / w),
                    F.floor(F.col("apos") / w) + 1,
                )
            ).alias("bkt"),
        )
        hits = (
            probe.join(others, ["doc", "bkt"])
            .where(F.abs(F.col("opos") - F.col("apos")) <= w)
            .select("doc", "apos")
            .distinct()
        )
        anchors = hits
    return anchors.groupBy("doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.min("apos").cast("long").alias("first_anchor"),
    )
