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

__all__ = ["normalize_urls", "TRACKING_PARAM_RE"]

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
