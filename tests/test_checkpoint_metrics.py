"""Checkpoint resume (exactly-once) + lineage/metrics contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_text_recognition_spark.extraction import checkpoint, metrics
from ocr_text_recognition_spark.io_pandas import pandas_to_spark


def test_kill_and_resume_exactly_once(spark, small_corpus, tmp_path):
    docs_pd, media_pd, golden_pd = small_corpus
    docs = pandas_to_spark(spark, docs_pd, "documents")
    media = pandas_to_spark(spark, media_pd, "media")
    out, ledger = str(tmp_path / "out"), str(tmp_path / "ledger")

    # "crash" after the first wave
    first = checkpoint.run_with_checkpoints(
        spark, docs, media, out, ledger, n_buckets=8, buckets_per_wave=3, max_waves=1
    )
    assert len(first) == 3
    assert checkpoint.completed_buckets(spark, ledger) == set(first)

    # resume must process exactly the remaining buckets
    rest = checkpoint.run_with_checkpoints(
        spark, docs, media, out, ledger, n_buckets=8, buckets_per_wave=3
    )
    assert sorted(first + rest) == list(range(8))

    # a second resume is a no-op
    again = checkpoint.run_with_checkpoints(
        spark, docs, media, out, ledger, n_buckets=8, buckets_per_wave=3
    )
    assert again == []

    # output equals golden exactly-once (no dup doc_ids, full coverage)
    result = checkpoint.read_output(spark, out)
    assert result.count() == len(docs_pd)
    assert result.select("doc_id").distinct().count() == len(docs_pd)
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in result.collect()
    }
    want = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for _, r in golden_pd.iterrows()
    }
    assert got == want


def test_partition_metrics_totals(spark, small_corpus):
    docs_pd, media_pd, golden_pd = small_corpus
    golden = pandas_to_spark(spark, golden_pd, "documents")
    m = metrics.partition_metrics(golden, run_id="t1")
    agg = m.agg(
        F.sum("docs").alias("docs"),
        F.sum("spans").alias("spans"),
        F.sum("chars_decoded").alias("chars"),
        F.sum("media_spans").alias("media"),
    ).collect()[0]
    want_spans = int(golden_pd["spans"].map(len).sum())
    want_chars = sum(len(s["text"]) for _, r in golden_pd.iterrows() for s in r["spans"])
    want_media = sum(s["kind"] == "media" for _, r in golden_pd.iterrows() for s in r["spans"])
    assert (agg["docs"], agg["spans"], agg["chars"], agg["media"]) == (
        len(golden_pd),
        want_spans,
        want_chars,
        want_media,
    )


def test_cer_zero_on_exact_match(spark, small_corpus):
    _, _, golden_pd = small_corpus
    golden = pandas_to_spark(spark, golden_pd, "documents")
    cer = metrics.cer_vs_reference(golden, golden)
    assert cer.agg(F.max("cer")).collect()[0][0] == 0.0


def test_cer_detects_divergence(spark):
    from ocr_text_recognition_spark.schemas import DOCUMENTS_SCHEMA

    a = spark.createDataFrame([("d1", [("text", "abcd", "", 0)])], DOCUMENTS_SCHEMA)
    b = spark.createDataFrame([("d1", [("text", "abXd", "", 0)])], DOCUMENTS_SCHEMA)
    (row,) = metrics.cer_vs_reference(a, b).collect()
    assert abs(row["cer"] - 0.25) < 1e-9


def test_partition_metrics_rates(spark, small_corpus):
    """spans/sec + elapsed are per-partition (north star: lineage includes
    throughput) and positive wherever spans were processed."""
    _, _, golden_pd = small_corpus
    golden = pandas_to_spark(spark, golden_pd, "documents")
    rows = metrics.partition_metrics(golden, run_id="t2").collect()
    assert all(r["elapsed_sec"] > 0 for r in rows)
    assert all(r["spans_per_sec"] > 0 for r in rows if r["spans"] > 0)
