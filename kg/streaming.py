"""Structured Streaming wrapper over the batch stages.

The KG pipeline is stateless per page until linking, so the streaming story
is thin by design (SURVEY.md §1.2): the same detection/extraction plans run
under ``readStream`` unchanged; watermarking only matters for the windowed
mention-rate aggregation below. Use ``Trigger.AvailableNow`` (or
``trigger(availableNow=True)``) for catch-up batch runs over a growing
Iceberg/parquet landing zone, with exactly-once sinks via checkpointLocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_pages_stream(
    spark: SparkSession, path: str, schema: str | None = None,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """File-source stream of pages parquet dropped into ``path``."""
    if schema is None:
        schema = (
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_triples(pages_stream: DataFrame) -> DataFrame:
    """Streaming triples: the identical fused batch plan under readStream."""
    from kg.stages.triples import extract_triples_from_pages

    return extract_triples_from_pages(pages_stream)


def stream_mention_rates(
    pages_stream: DataFrame,
    gazetteer: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed mention-candidate counts per entity with late-data handling:
    watermark on warc_ts bounds state; late pages beyond it are dropped.

    Uses the span-join directly (ONE stateful aggregation — the batch
    longest-match fold is a second chained aggregation, which streaming
    append mode restricts; rates don't need the fold)."""
    from kg.normalize import PUNCT
    from kg.stages.extract import extract_docs
    from kg.stages.mentions import ngram_spans_df

    docs = extract_docs(pages_stream.select("url", "html", "lang"))
    with_ts = docs.join(pages_stream.select("url", "warc_ts"), "url")
    spans = ngram_spans_df(with_ts.select("url", "text"), max_words=2)
    keyed = spans.withColumn(
        "key", F.lower(F.btrim(F.col("span"), F.lit(PUNCT)))
    ).join(
        F.broadcast(gazetteer.select(F.col("value_norm").alias("key"), "entity_name")),
        "key",
    )
    timed = keyed.join(pages_stream.select("url", "warc_ts"), "url")
    return (
        timed.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "entity_name")
        .agg(F.count("*").alias("n_mentions"))
        .select("w.start", "w.end", "entity_name", "n_mentions")
    )


def run_stream_to_parquet(
    stream_df: DataFrame, out_path: str, checkpoint: str,
    available_now: bool = True,
):
    """Start the stream with an exactly-once parquet sink; availableNow
    processes the current backlog then stops (the resumable-batch shape)."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
