"""Single-pass table profiling — the ingest-QA report a 100-TB pipeline
runs before trusting a new crawl drop: per-column null counts, distinct
cardinality, numeric range/mean, string length stats.

The reference service validates its inputs per request
(/root/reference/src/hu_entity/server.py request handling); at batch scale
the equivalent is a profile of the whole table, computed in ONE job.

Scale shape: every statistic is a partial-aggregable scalar, so the whole
profile is a single aggregation pass over the table — one map stage, one
1-row reduce, no shuffle of the data itself. Distinct counts default to
HyperLogLog (approx_count_distinct, mergeable sketches, same single pass);
``exact_distinct=True`` switches to exact count(DISTINCT) per column —
one expand + shuffle per column, contract/test use only. The wide 1-row
result is reshaped to one row per column with a stack() — driver-side
cost only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_table"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One row per profiled column:
    (column, dtype, n_rows, n_nulls, n_distinct,
     min_num, max_num, mean_num,      -- numeric columns, else NULL
     min_len, max_len, avg_len)       -- string columns, else NULL

    Numeric extremes/means stay in their native double type (no
    cross-engine string formatting); string columns are profiled by
    LENGTH, which is total-order stable and collation-free.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else [f.name for f in df.schema.fields]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = fields[c]
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__nulls")
        )
        if exact_distinct:
            aggs.append(F.countDistinct(col).alias(f"{c}__dist"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"{c}__dist"))
        if isinstance(dt, _NUMERIC):
            d = col.cast("double")
            aggs.append(F.min(d).alias(f"{c}__min"))
            aggs.append(F.max(d).alias(f"{c}__max"))
            aggs.append(F.avg(d).alias(f"{c}__mean"))
        elif isinstance(dt, T.StringType):
            ln = F.length(col).cast("double")
            aggs.append(F.min(ln).alias(f"{c}__minl"))
            aggs.append(F.max(ln).alias(f"{c}__maxl"))
            aggs.append(F.avg(ln).alias(f"{c}__avgl"))
    wide = df.agg(*aggs)

    def _maybe(name: str):
        return F.col(name) if name in wide.columns else F.lit(None).cast(
            "double"
        )

    rows = []
    for c in cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(fields[c].simpleString()).alias("dtype"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
                F.col(f"{c}__dist").cast("long").alias("n_distinct"),
                _maybe(f"{c}__min").alias("min_num"),
                _maybe(f"{c}__max").alias("max_num"),
                F.round(_maybe(f"{c}__mean"), 6).alias("mean_num"),
                _maybe(f"{c}__minl").cast("long").alias("min_len"),
                _maybe(f"{c}__maxl").cast("long").alias("max_len"),
                F.round(_maybe(f"{c}__avgl"), 6).alias("avg_len"),
            )
        )
    return wide.select(
        F.explode(F.array(*rows)).alias("p")
    ).select("p.*")
