"""O21: per-partition error capture — a poisoned page lands an errors row
and the stage completes instead of aborting the job."""

from __future__ import annotations

import pytest

from kg.errors import split_errors
from kg.stages.extract import extract_docs
from kg.stages.triples import detect_ner_mentions


@pytest.fixture(scope="module")
def poisoned_docs(spark):
    return spark.createDataFrame(
        [
            ("u1", "Acme Corporation opened in London.", "en"),
            ("poison://1", "some text", "tlh"),  # unsupported lang -> raises
            ("u2", "Paris is in France.", "en"),
        ],
        "url string, text string, lang string",
    )


def test_poisoned_doc_becomes_error_row_not_job_abort(spark, poisoned_docs):
    raw = detect_ner_mentions(poisoned_docs, capture_errors=True)
    ok, errs = split_errors(raw, stage="ner_mentions")
    err_rows = errs.collect()
    assert len(err_rows) == 1
    assert err_rows[0]["url"] == "poison://1"
    assert err_rows[0]["stage"] == "ner_mentions"
    assert err_rows[0]["error"].startswith("UnknownLanguageError:")
    # the good docs are fully processed
    ok_urls = {r["url"] for r in ok.collect()}
    assert "u1" in ok_urls and "u2" in ok_urls and "poison://1" not in ok_urls


def test_without_capture_the_stage_fails(spark, poisoned_docs):
    with pytest.raises(Exception, match="no detector resources"):
        detect_ner_mentions(poisoned_docs).collect()


def test_capture_matches_plain_path_on_clean_input(spark, poisoned_docs):
    clean = poisoned_docs.where("lang = 'en'")
    plain = {tuple(r) for r in detect_ner_mentions(clean).collect()}
    ok, errs = split_errors(
        detect_ner_mentions(clean, capture_errors=True), stage="ner_mentions"
    )
    assert errs.isEmpty()
    assert {tuple(r) for r in ok.collect()} == plain


def test_extract_capture_passthrough(spark):
    pages = spark.createDataFrame(
        [("u1", b"<p>hello world</p>", "en")],
        "url string, html binary, lang string",
    )
    ok, errs = split_errors(
        extract_docs(pages, capture_errors=True), stage="extract"
    )
    assert errs.isEmpty()
    got = ok.collect()[0]
    assert got["text"] == "hello world"
    assert got["n_chars"] == 11


def test_pipeline_routes_captured_errors_to_errors_table(spark, poisoned_docs, tmp_path):
    from kg.checkpoint import CheckpointedPipeline, add_bucket

    base = str(tmp_path / "pipe")
    bucketed = add_bucket(poisoned_docs, 4)
    pipe = CheckpointedPipeline(spark, base, n_buckets=4)
    out = pipe.run_stage(
        "ner", bucketed,
        lambda df: detect_ner_mentions(df, capture_errors=True).join(
            df.select("url", "url_hash_bucket"), "url"
        ),
    )
    # stage table is clean: no poison row, no bookkeeping columns
    assert "error" not in out.columns and "has_error" not in out.columns
    assert {r["url"] for r in out.select("url").distinct().collect()} == {"u1", "u2"}
    errs = pipe.read_errors().collect()
    assert len(errs) == 1
    assert errs[0]["url"] == "poison://1" and errs[0]["stage"] == "ner"
    assert errs[0]["error"].startswith("UnknownLanguageError:")
    # lineage n_out counts clean rows only
    lineage = pipe.read_lineage().toPandas()
    assert lineage["n_out"].sum() == out.count()


def test_resume_does_not_reappend_prior_runs_errors(spark, poisoned_docs, tmp_path):
    from pyspark.sql import functions as F

    from kg.checkpoint import CheckpointedPipeline, add_bucket

    base = str(tmp_path / "pipe2")
    bucketed = add_bucket(poisoned_docs, 4)
    poison_bucket = bucketed.where("url = 'poison://1'").first()["url_hash_bucket"]
    fn = lambda df: detect_ner_mentions(df, capture_errors=True).join(  # noqa: E731
        df.select("url", "url_hash_bucket"), "url"
    )
    pipe = CheckpointedPipeline(spark, base, n_buckets=4)
    pipe.run_stage(
        "ner", bucketed.where(F.col("url_hash_bucket") == poison_bucket), fn
    )
    assert pipe.read_errors().count() == 1
    # fresh pipeline resumes over the full input: only the remaining buckets
    # run, and the already-logged poison row must NOT be appended again
    pipe2 = CheckpointedPipeline(spark, base, n_buckets=4)
    pipe2.run_stage("ner", bucketed, fn)
    assert pipe2.read_errors().count() == 1
