"""Dense-ID assignment without a single-reducer global window.

``assign_dense_ids`` gives every row a 0-based contiguous id following the
lexicographic order of its key columns — the primitive that turns
canonicalized entity strings into the integer ids an embedding trainer
needs (and, generally, replaces ``row_number() OVER (ORDER BY ...)``,
whose single unpartitioned window funnels the whole table through ONE
reducer and caps out around one executor's memory).

Plan (the classic two-phase enumeration):

1. range-repartition by the keys + sort within partitions, materialized
   once (barrier — both later passes must observe the identical
   partitioning, and repartitionByRange's boundary sampling must not run
   twice);
2. per-partition counts -> cumulative offsets: ONE tiny aggregation
   (#partitions rows) collected to the driver;
3. an Arrow-batched enumerator adds offset[pid] + local ordinal while
   streaming each partition in its sorted order — O(1) state per
   partition, no global sort, no single reducer.

The result equals ``row_number() OVER (ORDER BY keys) - 1`` (the DuckDB
oracle) whenever the key tuples are unique; with duplicate keys the ids
are still dense and deterministic up to the tie order within a key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg.session import materialize

__all__ = ["assign_dense_ids"]


def assign_dense_ids(
    df: DataFrame,
    key_cols: list[str],
    id_name: str = "dense_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """(all input columns, id_name): dense 0-based ids in key order."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    n_parts = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    parted = materialize(
        df.repartitionByRange(n_parts, *key_cols)
        .sortWithinPartitions(*key_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = {
        r["_pid"]: r["c"]
        for r in parted.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bc = df.sparkSession.sparkContext.broadcast(offsets)
    out_schema = parted.drop("_pid").schema.add(id_name, "long")

    def enumerate_partition(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            off = bc.value[int(pdf["_pid"].iloc[0])]
            out = pdf.drop(columns=["_pid"])
            out[id_name] = range(off + seen, off + seen + len(pdf))
            seen += len(pdf)
            yield out

    return parted.mapInPandas(enumerate_partition, out_schema)
