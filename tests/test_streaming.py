"""Structured Streaming wrapper: availableNow catch-up over a file landing
zone produces the same triples as the batch path, exactly-once via the
checkpointLocation; windowed mention rates run one stateful aggregation."""

from __future__ import annotations

import pytest

from kg import synth
from kg.stages.mentions import gazetteer_dim
from kg.stages.triples import extract_triples_from_pages
from kg.streaming import (
    read_pages_stream,
    run_stream_to_parquet,
    stream_mention_rates,
    stream_triples,
)


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    synth.gen_pages(80, seed=42).to_parquet(str(d / "batch1.parquet"), index=False)
    synth.gen_pages(40, seed=99).to_parquet(str(d / "batch2.parquet"), index=False)
    return str(d)


def test_stream_triples_equals_batch(spark, landing, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_pages_stream(spark, landing)
    q = run_stream_to_parquet(stream_triples(stream), out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out).select("url", "subj", "pred", "obj")
    batch = extract_triples_from_pages(spark.read.parquet(landing)).select(
        "url", "subj", "pred", "obj"
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in batch.collect()}

    # exactly-once: restarting over the same checkpoint adds nothing
    q2 = run_stream_to_parquet(
        stream_triples(read_pages_stream(spark, landing)), out, ckpt
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == got.count()


def test_stream_mention_rates_runs(spark, landing, tmp_path):
    gaz = gazetteer_dim(spark, synth.GAZETTEER_DATA)
    rates = stream_mention_rates(
        read_pages_stream(spark, landing), gaz, window="10 minutes",
        watermark="5 minutes",
    )
    q = (
        rates.writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt2")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from rates").collect()
    # append mode only emits windows closed by the watermark; with a bounded
    # availableNow run the final windows may be withheld — structural check:
    assert {c for c in spark.table("rates").columns} == {
        "start", "end", "entity_name", "n_mentions"
    }
    assert all(r["n_mentions"] > 0 for r in rows)
