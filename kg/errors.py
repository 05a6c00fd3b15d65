"""O21: per-partition error capture — exceptions become rows, not job aborts.

The reference turns any handler exception into an HTTP 500 with a traceback
and keeps serving (/root/reference/src/hu_entity/server.py:209-222). The
Spark analogue: one malformed page among 10^12 must NOT fail the stage, so
capture-enabled stages wrap their per-row work in try/except inside the
Arrow batch loop and emit an ``error`` column (null on success). The caller
splits the stream:

    docs_raw = extract_docs(pages, capture_errors=True)
    docs, errs = split_errors(docs_raw, stage="extract")

``errs`` has ERRORS_SCHEMA (url, stage, error) — append it to the run's
``_errors`` table next to lineage/metrics. Both outputs are filters over one
mapInPandas subtree: persist the raw frame (or write it once and split from
the written table, as CheckpointedPipeline does for its stage outputs) when
both sides are consumed, otherwise the extraction runs twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ERRORS_SCHEMA", "format_error", "split_errors"]

ERRORS_SCHEMA = "url string, stage string, error string"


def format_error(exc: BaseException) -> str:
    """Deterministic one-line rendering (type + message): the errors table
    is oracle-checked, so no tracebacks/addresses."""
    return f"{type(exc).__name__}: {exc}"


def split_errors(
    df: DataFrame, stage: str, id_col: str = "url"
) -> tuple[DataFrame, DataFrame]:
    """Split a capture-enabled stage output on its ``error`` column into
    (ok_rows_without_error_col, errors_table). A ``peak_mb`` in-stage
    metrics column (capture_metrics) is bookkeeping, not payload — dropped
    from the ok side alongside ``error``."""
    ok = df.where(F.col("error").isNull()).drop("error", "peak_mb")
    errs = df.where(F.col("error").isNotNull()).select(
        F.col(id_col).cast("string").alias("url"),
        F.lit(stage).alias("stage"),
        "error",
    )
    return ok, errs
