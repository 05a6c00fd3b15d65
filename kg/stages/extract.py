"""Stage 1: pages(url, warc_ts, html, text?, lang) -> docs(url, text, lang, ...).

HTML-to-text runs as an Arrow-batched ``mapInPandas`` over the SAME pure
function the oracle uses (kg.textextract.extract_text), so per-url output is
byte-identical to the single-node reference by construction
(BASELINE.json input_hint).

Scale notes:
- the stage reads ONLY (url, html, lang) — column pruning keeps the scan from
  dragging `text` (and anything else) through the UDF; at 100 TB the html
  column dominates and nothing else should be materialized here.
- no shuffle: extraction is embarrassingly parallel. Partition sizing is
  inherited from the scan (spark.sql.files.maxPartitionBytes); pages with
  multi-MB html bodies are why maxRecordsPerBatch stays moderate (2048).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg.textextract import extract_text

DOCS_COLUMNS = "url string, text string, lang string, n_chars int, extract_sha1 string"


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts = [extract_text(h) for h in pdf["html"]]
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "text": texts,
                "lang": pdf["lang"],
                "n_chars": pd.array([len(t) for t in texts], dtype="int32"),
                "extract_sha1": [
                    hashlib.sha1(t.encode("utf-8")).hexdigest() for t in texts
                ],
            }
        )


def _make_extract_batches_safe(capture_metrics: bool):
    def _extract_batches_safe(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from kg.errors import format_error

        cols = ["url", "text", "lang", "n_chars", "extract_sha1", "error"]
        if capture_metrics:
            cols.append("peak_mb")
        for pdf in batches:
            rows = []
            for url, html, lang in zip(pdf["url"], pdf["html"], pdf["lang"]):
                try:
                    t = extract_text(html)
                    rows.append(
                        (url, t, lang, len(t),
                         hashlib.sha1(t.encode("utf-8")).hexdigest(), None)
                    )
                except Exception as exc:  # noqa: BLE001 — O21: row fails, job survives
                    rows.append((url, None, lang, None, None, format_error(exc)))
            if capture_metrics:
                from kg.stages.triples import _worker_peak_mb

                peak = _worker_peak_mb()
                rows = [r + (peak,) for r in rows]
            yield pd.DataFrame(rows, columns=cols)

    return _extract_batches_safe


def extract_docs(
    pages: DataFrame,
    capture_errors: bool = False,
    capture_metrics: bool = False,
) -> DataFrame:
    """pages -> docs. Only url/html/lang are read from the input.

    ``capture_errors=True`` (O21): per-row exceptions become an ``error``
    column instead of failing the stage — split with kg.errors.split_errors.
    The built-in extractor is total (extract_text never raises), so this path
    matters for pluggable extractors and malformed inputs of the wrong type.
    ``capture_metrics=True`` (O23): per-batch in-stage worker ``peak_mb``
    column (implies the capture row path; see kg/checkpoint.py).
    """
    pruned = pages.select("url", "html", "lang")
    if capture_errors or capture_metrics:
        schema = (
            DOCS_COLUMNS
            + ", error string"
            + (", peak_mb double" if capture_metrics else "")
        )
        return pruned.mapInPandas(
            _make_extract_batches_safe(capture_metrics), schema=schema
        )
    return pruned.mapInPandas(_extract_batches, schema=DOCS_COLUMNS)


def verify_extraction(pages: DataFrame) -> DataFrame:
    """Byte-identity audit: rows where UDF extraction != the golden `text`
    column. Empty result == invariant holds. Cheap enough to run per-round
    at test SF; at production SF run on a sampled bucket."""
    docs = extract_docs(pages)
    golden = pages.select("url", F.col("text").alias("golden_text"))
    return (
        docs.join(golden, "url")
        .where(F.col("text") != F.col("golden_text"))
        .select("url", "text", "golden_text")
    )
