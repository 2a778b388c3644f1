"""Span-sequence equality — the north-rule invariant (BASELINE.json:15).

The Spark pipeline must reproduce the plain-numpy golden path exactly:
per document, (kind, text, media_ref, order) of every span.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_text_recognition_spark.extraction.pipeline import (
    explode_spans,
    reassemble_spans,
    run_extraction,
)
from ocr_text_recognition_spark.io_pandas import pandas_to_spark


def _as_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def test_span_sequence_equality(spark, small_corpus):
    docs_pd, media_pd, golden_pd = small_corpus
    docs = pandas_to_spark(spark, docs_pd, "documents")
    media = pandas_to_spark(spark, media_pd, "media")

    got = {r["doc_id"]: _as_tuples(r["spans"]) for r in run_extraction(spark, docs, media).collect()}
    want = {r["doc_id"]: _as_tuples(r["spans"]) for _, r in golden_pd.iterrows()}

    assert set(got) == set(want)
    bad = [d for d in want if got[d] != want[d]]
    assert not bad, f"{len(bad)} docs mismatch, first: {bad[:1]}"


def test_reassembly_is_salt_invariant(spark, small_corpus):
    """Same output regardless of salt fan-out — salting is a physical
    choice, never a semantic one."""
    docs_pd, media_pd, _ = small_corpus
    docs = pandas_to_spark(spark, docs_pd.head(10), "documents")
    ex = explode_spans(docs).withColumn("text", F.coalesce("text", F.lit("")))
    one = {r["doc_id"]: _as_tuples(r["spans"]) for r in reassemble_spans(ex, n_salt=1).collect()}
    many = {r["doc_id"]: _as_tuples(r["spans"]) for r in reassemble_spans(ex, n_salt=32).collect()}
    assert one == many


def test_offsets_strictly_ordered(spark, small_corpus):
    docs_pd, media_pd, _ = small_corpus
    docs = pandas_to_spark(spark, docs_pd, "documents")
    media = pandas_to_spark(spark, media_pd, "media")
    out = run_extraction(spark, docs, media)
    disorder = out.select(
        F.exists(
            F.zip_with(
                F.slice("spans", 1, F.size("spans") - 1),
                F.slice("spans", 2, F.size("spans") - 1),
                lambda a, b: a["offset"] >= b["offset"],
            ),
            lambda x: x,
        ).alias("bad")
    ).filter("bad")
    assert disorder.count() == 0


def test_missing_media_ref_yields_empty_text(spark):
    from ocr_text_recognition_spark.schemas import DOCUMENTS_SCHEMA, MEDIA_SCHEMA

    docs = spark.createDataFrame(
        [("d1", [("media", "", "nope", 0), ("text", "<p>some real content here</p>", "", 1)])],
        DOCUMENTS_SCHEMA,
    )
    media = spark.createDataFrame([], MEDIA_SCHEMA)
    (row,) = run_extraction(spark, docs, media).collect()
    assert _as_tuples(row["spans"]) == [
        ("media", "", "nope", 0),
        ("text", "some real content here", "", 1),
    ]


def test_preprocess_kwargs_flow_to_media_udf(spark, small_corpus):
    """run_extraction(preprocess_kwargs={'binarizer': 'adaptive'}) must
    apply the adaptive chain inside the Arrow UDF: per-ref output equals
    the plain-Python kernel called with the same kwargs."""
    from ocr_text_recognition_spark.extraction.pipeline import run_extraction
    from ocr_text_recognition_spark.io_pandas import pandas_to_spark
    from ocr_text_recognition_spark.kernel import reference_kernel

    docs_pd, media_pd, _ = small_corpus
    docs = pandas_to_spark(spark, docs_pd, "documents")
    media = pandas_to_spark(spark, media_pd, "media")
    out = run_extraction(
        spark, docs, media, preprocess_kwargs={"binarizer": "adaptive"}
    ).collect()

    media_bytes = dict(zip(media_pd["media_ref"], media_pd["content"]))
    want_cache = {}
    for r in out:
        for s in r["spans"]:
            if s["kind"] != "media":
                continue
            ref = s["media_ref"]
            if ref not in want_cache:
                want_cache[ref] = reference_kernel.recognize_media_bytes(
                    media_bytes.get(ref), binarizer="adaptive"
                )
            assert s["text"] == want_cache[ref], ref
    assert want_cache, "corpus contained no media spans"
