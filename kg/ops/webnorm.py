"""Web-corpus URL normalization — the canonical-url operator every
Common-Crawl-style dedup/linking pipeline needs before grouping by url
(two crawls of the same page differ in case, default ports, fragments and
tracking parameters).

Normalization (deterministic, dialect-neutral regex so the DuckDB oracle
can replay it verbatim):
  1. strip the #fragment
  2. lowercase scheme and host (path/query case is preserved — it is
     significant on most servers)
  3. drop default ports (:80 for http, :443 for https)
  4. drop tracking query parameters (utm_*, gclid, fbclid); drop the '?'
     entirely if nothing survives
  5. strip one trailing '/' from a non-root path

All built-in string expressions — JVM-side, whole-stage codegen, a pure
map at any scale (no shuffle, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_urls",
    "resolve_redirects",
    "url_templates",
    "canonical_clusters",
    "blocklist_filter",
    "TRACKING_PARAM_RE",
]

#: query params dropped as tracking noise (anchored per param)
TRACKING_PARAM_RE = "^(utm_[^=]*|gclid|fbclid)(=.*)?$"

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def _norm_expr(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    path = F.regexp_extract(url, _URL_RE, 3)
    query = F.regexp_extract(url, _URL_RE, 4)  # includes leading '?', or ''

    host_raw = F.lower(F.regexp_extract(url, _URL_RE, 2))
    host = (
        F.when(
            (scheme == "http") & host_raw.rlike(":80$"),
            F.substring(host_raw, 1, F.length(host_raw) - 3),
        )
        .when(
            (scheme == "https") & host_raw.rlike(":443$"),
            F.substring(host_raw, 1, F.length(host_raw) - 4),
        )
        .otherwise(host_raw)
    )

    kept_params = F.filter(
        F.split(F.substring(query, 2, 1 << 20), "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
    )
    query_norm = F.when(
        F.size(kept_params) > 0,
        F.concat(F.lit("?"), F.array_join(kept_params, "&")),
    ).otherwise(F.lit(""))

    path_norm = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)

    return F.when(
        scheme == "", url  # not a parseable absolute URL: pass through
    ).otherwise(
        F.concat(scheme, F.lit("://"), host, path_norm, query_norm)
    )


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``url_norm`` (plus parsed ``host``) to ``df``."""
    url = F.col(url_col)
    return df.withColumn("url_norm", _norm_expr(url)).withColumn(
        "host",
        F.lower(F.regexp_extract(F.col("url_norm"), _URL_RE, 2)),
    )


def resolve_redirects(
    redirects: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    max_hops: int = 32,
) -> DataFrame:
    """Resolve HTTP redirect chains to their terminal (canonical) URL —
    the step between URL normalization and url-keyed dedup/linking when
    the crawl carries a redirect edge table.

    The map is made functional first (self-loops dropped; duplicate srcs
    collapse to the MIN dst — deterministic). A src is resolved when its
    chain reaches a url with no outgoing redirect in <= ``max_hops``
    hops; cycles and over-budget chains come back resolved=false with
    NULL target/hops. Returns one row per functional src:
    (src, target, hops, resolved).

    Scale shape: pointer doubling — each round composes the current
    mapping with itself (one equi self-join), so chains of length up to
    max_hops collapse in ceil(log2(max_hops)) rounds, not max_hops
    sequential joins; every round is one shuffle co-partitioned on the
    join key, with a materialize barrier (web redirect graphs are a few
    % the size of the crawl, so the per-round table is cheap). The
    DuckDB oracle walks the same map with a bounded recursive CTE — a
    different algorithm, a genuine cross-check.
    """
    import math

    from kg.session import materialize

    base = materialize(
        redirects.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src")
        .agg(F.min("dst").alias("nxt"))
    )
    cur = base.select("src", "nxt", F.lit(1).cast("long").alias("h"))
    rounds = max(1, math.ceil(math.log2(max(max_hops, 2))))
    for _ in range(rounds):
        jump = cur.select(
            F.col("src").alias("j_src"),
            F.col("nxt").alias("j_nxt"),
            F.col("h").alias("j_h"),
        )
        cur = materialize(
            cur.join(jump, cur["nxt"] == jump["j_src"], "left").select(
                "src",
                F.coalesce("j_nxt", "nxt").alias("nxt"),
                (F.col("h") + F.coalesce("j_h", F.lit(0))).alias("h"),
            )
        )
    terminal = cur.join(
        base.select(F.col("src").alias("t_src")),
        cur["nxt"] == F.col("t_src"),
        "left",
    )
    ok = F.col("t_src").isNull() & (F.col("h") <= max_hops)
    return terminal.select(
        "src",
        F.when(ok, F.col("nxt")).alias("target"),
        F.when(ok, F.col("h")).cast("long").alias("hops"),
        ok.alias("resolved"),
    )


#: template rules (applied in order): long hex runs first (they contain
#: digits), then digit runs. Kept to two dialect-neutral regexes so the
#: DuckDB oracle replays them verbatim.
TEMPLATE_HEX_RE = "[0-9a-fA-F]{8,}"
TEMPLATE_NUM_RE = "[0-9]+"


def url_templates(
    df: DataFrame,
    url_col: str = "url",
    min_count: int = 1,
) -> DataFrame:
    """Mine structural URL templates: host + path with long hex runs
    (>= 8 chars — session ids, uuids, content hashes) replaced by ``{h}``
    and digit runs by ``{n}``. Returns one row per template with
    ``n_urls`` (distinct URLs matching it) and ``sample_url`` (the
    lexicographic min — deterministic).

    Crawl use: the crawler-trap / pagination detector. A template whose
    n_urls explodes (calendar pages, faceted search, session-id mirrors)
    marks URLs that should be frontier-throttled or collapsed before
    fetch — at 10^12-document scale, trap templates are where crawl
    budget dies. Downstream, templates are also the unit for per-section
    quality stats (one news site's /video/{n} vs /article/{n}).

    Scale shape: template derivation is a pure JVM regex map (no Python,
    no shuffle); the rollup is ONE partial-aggregated groupBy on the
    template key. Distinct-URL counting uses count(DISTINCT url) — two-
    phase hash aggregation, no window. Skew note: a mega-template (one
    host's {n} pages at 10^9 URLs) lands on one reducer only for its
    final count; partial aggregation has already collapsed each map
    partition to one row per template, so the reduce-side row count is
    bounded by template cardinality, not URL count.
    """
    url = F.col(url_col)
    host = F.lower(F.regexp_extract(url, _URL_RE, 2))
    path = F.regexp_extract(url, _URL_RE, 3)
    templated = F.regexp_replace(
        F.regexp_replace(path, TEMPLATE_HEX_RE, "{h}"),
        TEMPLATE_NUM_RE,
        "{n}",
    )
    tpl = F.concat(
        host, F.when(templated == "", F.lit("/")).otherwise(templated)
    )
    return (
        df.select(url.alias("_url"), tpl.alias("template"))
        .where(F.col("_url").isNotNull() & (F.col("template") != ""))
        .groupBy("template")
        .agg(
            F.countDistinct("_url").cast("long").alias("n_urls"),
            F.min("_url").alias("sample_url"),
        )
        .where(F.col("n_urls") >= int(min_count))
    )


def canonical_clusters(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_hops: int = 8,
) -> DataFrame:
    """rel=canonical dedup clustering: pages declaring a canonical link
    collapse onto their terminal representative — the markup-declared
    twin of redirect resolution, and the third leg of URL identity
    (normalize → redirects → canonical). One row per page:
    (url_norm, canonical_norm, hops, resolved); pages without a
    canonical pointer are their own representative (hops 0). Chains
    (A→B, B→C) resolve through :func:`resolve_redirects`'s pointer
    doubling; cycles come back resolved=false with the page itself as a
    safe fallback representative.

    Scale shape: head-channel extraction is the pure-map
    page_metadata pass; canonical edges are a few % of the crawl, so
    the doubling rounds run on a small edge table; the final attach is
    ONE left join from pages to the resolved map on the normalized key.
    """
    from kg.ops.structured import page_metadata

    meta = page_metadata(pages, url_col=url_col, html_col=html_col)
    m = normalize_urls(meta.select("url", "canonical"), "url").select(
        "url_norm", "canonical"
    )
    edges = normalize_urls(
        m.where(F.col("canonical").isNotNull()).select(
            F.col("url_norm").alias("src"), F.col("canonical").alias("url")
        ),
        "url",
    ).select("src", F.col("url_norm").alias("dst"))
    resolved = resolve_redirects(edges, "src", "dst", max_hops=max_hops)
    return (
        m.select("url_norm")
        .join(
            resolved.select(
                F.col("src").alias("url_norm"), "target", "hops", "resolved"
            ),
            "url_norm",
            "left",
        )
        .select(
            "url_norm",
            F.coalesce("target", "url_norm").alias("canonical_norm"),
            F.coalesce("hops", F.lit(0)).cast("long").alias("hops"),
            F.coalesce("resolved", F.lit(True)).alias("resolved"),
        )
    )


def blocklist_filter(
    pages: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Domain-suffix blocklist filter — the first gate of every web-scale
    ingest (UT1/adult-domain lists, spam/ad hosts): a page is blocked
    when its host IS a blocked domain or is a SUBDOMAIN of one
    (``ads.tracker.test`` blocks ``cdn.ads.tracker.test`` but not
    ``notads.tracker.test`` — label-boundary matching, never substring).

    ``blocklist``: (domain STRING) dim, lowercase registrable domains.
    Returns one row per page: (url, host, blocked, matched_rule) where
    matched_rule is the LONGEST (most-specific) matching blocked suffix,
    NULL when unblocked.

    Scale shape: each host explodes to its <= label-count suffixes (a
    bounded pure map), which BROADCAST-equi-join the blocklist dim
    (millions of domains still broadcast — domains are short strings);
    the per-url longest-match rollup runs on MATCHED rows only (the
    blocked subset, dim-like in a healthy crawl) and joined back with
    NO forced hint — AQE broadcasts it while it is dim-sized and falls
    back to a shuffle join on url if a poisoned crawl makes the blocked
    subset corpus-sized (an unconditional broadcast hint here would be
    a driver OOM in exactly that failure mode — ADVICE r4); the verdict
    per page is unchanged either way."""
    url = F.col(url_col)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, _URL_RE, 2)), ":[0-9]+$", ""
    )
    labels = F.split(host, r"\.")
    suffixes = F.when(
        host != "",
        F.transform(
            F.sequence(F.lit(0), F.size(labels) - 1),
            lambda i: F.array_join(
                F.slice(labels, i + 1, F.size(labels) - i), "."
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = pages.select(url.alias("url"), host.alias("host"),
                        suffixes.alias("_sfx"))
    bl = blocklist.select(F.lower(F.col("domain")).alias("_dom")).distinct()
    matched = (
        base.select("url", F.explode("_sfx").alias("_sfx1"))
        .join(F.broadcast(bl), F.col("_sfx1") == F.col("_dom"))
        .groupBy("url")
        .agg(F.max_by("_dom", F.length("_dom")).alias("matched_rule"))
    )
    return (
        base.select("url", "host")
        .join(matched, "url", "left")
        .select(
            "url",
            "host",
            F.col("matched_rule").isNotNull().alias("blocked"),
            "matched_rule",
        )
    )
