"""The distributed extraction pipeline (SURVEY.md §3.4).

    read documents(doc_id, spans)                [scan; columns pruned]
      -> posexplode_outer(spans)                 [narrow]
      -> branch on kind:
           text      -> extract_main_text_udf    [Arrow batches]
           media|pdf -> distinct (kind, media_ref)  [dedup: each distinct
                        join media on media_ref      payload processed ONCE]
                        extract_ref_udf (dispatch: OCR kernel | layout parse)
                        join results back
      -> unionByName
      -> salted two-phase reassembly:            [explicit skew handling]
           groupBy(doc_id, salt) partial collect
           groupBy(doc_id) flatten + sort_array(offset)
      -> documents(doc_id, spans) out

Scale notes (the design target is 10^12 docs / 100 TB):
- The media join shuffles on media_ref; at scale both sides are bucketed
  on media_ref so the join is co-located (sources.write_bucketed /
  read_bucketed; the zero-Exchange plan is pinned in
  tests/test_plans.py::test_bucketed_join_no_shuffle). The distinct()
  before the join collapses popular refs BEFORE the expensive kernel
  runs — the kernel cost is O(distinct images), not O(media spans).
- Reassembly is the one unavoidable shuffle on doc_id. A media-heavy doc
  (the skew knob, BASELINE.json:6) would bottleneck a single reducer, so
  phase 1 collects partial span lists per (doc_id, salt) and phase 2
  merges n_salt small lists per doc — explicit salting, not AQE-dependent.
- Span order NEVER relies on row order: sort_array on offset is the last
  step before emitting (the core correctness invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_text_recognition_spark.extraction.udfs import (
    extract_main_text_udf,
    extract_ref_udf,
    recognize_media_udf,
)

DEFAULT_N_SALT = 8

# Spark's stock scan/shuffle sizing targets byte-bound analytics
# (128 MiB splits, 64 MiB post-shuffle partitions). The extraction job is
# COMPUTE-bound per row — a 200-byte media_ref row costs ~4 ms of kernel
# CPU — so byte-sized defaults under-split small-to-medium inputs: a
# 6 MiB documents file becomes a 1-task scan and AQE coalesces the
# post-kernel union stage to 2-3 tasks no matter the core count
# (profiled: scripts/profile_gate.py; the stage-49 serialization in
# BENCH/gate_attempts_r5.md attempt 6). These are the stock defaults we
# clamp back to at scale.
_DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024
_DEFAULT_ADVISORY_BYTES = 64 * 1024 * 1024


def extraction_session_conf(input_bytes: int, cores: int) -> dict[str, str]:
    """Job-level session conf for an extraction run over ``input_bytes``
    of input on ``cores`` parallel slots.

    Targets >= 4 scan splits per slot and keeps post-shuffle partitions
    proportionally small, clamped to Spark's stock values — so on a real
    multi-TB table every knob lands back on the default and this helper
    is a no-op; it only matters when the input is small relative to the
    cluster (exactly the benchmark/CI regime, where the stock byte
    thresholds serialize compute-heavy stages).

    Pass the result as ``get_spark(extra_conf=...)`` (or ``--conf`` on
    spark-submit) BEFORE creating the session: file-split sizes are read
    at scan planning time.
    """
    target_splits = max(cores * 4, 1)
    split = min(max(input_bytes // target_splits, 1 << 20), _DEFAULT_MAX_PARTITION_BYTES)
    return {
        "spark.sql.files.maxPartitionBytes": str(split),
        # open-cost padding packs small files into one split; scale it
        # with the split size or a multi-file corpus re-collapses.
        "spark.sql.files.openCostInBytes": str(max(split // 16, 64 * 1024)),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            min(max(split // 2, 1 << 20), _DEFAULT_ADVISORY_BYTES)
        ),
    }


def explode_spans(docs: DataFrame) -> DataFrame:
    """documents -> one row per span (doc_id, kind, text, media_ref, offset)."""
    return docs.select(
        "doc_id",
        F.explode("spans").alias("span"),
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def recognize_distinct_media(
    spans_media: DataFrame,
    media: DataFrame,
    parallelism: int | None = None,
    kernel_udf=recognize_media_udf,
) -> DataFrame:
    """(media_ref) -> (media_ref, text): run the kernel once per distinct ref.

    The distinct() is the map-side-combine analog for the expensive UDF —
    popular images (shared headers, logos, re-hosted scans) are recognized
    once regardless of how many spans reference them.

    The explicit repartition after distinct() is load-bearing: the ref list
    is bytes-tiny but each ref costs real kernel CPU, so AQE's
    byte-size-based partition coalescing would collapse the UDF stage onto
    one task. Partitions here must be sized by COMPUTE, not bytes.
    """
    if parallelism is None:
        parallelism = spans_media.sparkSession.sparkContext.defaultParallelism * 2
    distinct_refs = spans_media.select("media_ref").distinct()
    # Repartition the payloads (post-join, pre-UDF) so the fan-out holds for
    # every join strategy AQE might pick.
    payloads = distinct_refs.join(media, "media_ref", "left").repartition(parallelism)
    return payloads.select(
        "media_ref",
        kernel_udf(F.col("content")).alias("text"),
    )


def reassemble_spans(extracted: DataFrame, n_salt: int = DEFAULT_N_SALT) -> DataFrame:
    """(doc_id, kind, text, media_ref, offset) -> (doc_id, spans) with spans
    sorted by offset. Two-phase salted aggregation so one media-heavy doc
    cannot pin a single reducer."""
    partial = (
        extracted.withColumn("salt", F.pmod(F.hash("offset"), F.lit(n_salt)))
        .groupBy("doc_id", "salt")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("offset"), F.col("kind"), F.col("text"), F.col("media_ref")
                )
            ).alias("part")
        )
    )
    return (
        partial.groupBy("doc_id")
        .agg(F.flatten(F.collect_list("part")).alias("unordered"))
        .select(
            "doc_id",
            F.transform(
                F.array_sort("unordered"),  # struct sort: offset is field 1
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )


def run_extraction(
    spark: SparkSession,
    docs: DataFrame,
    media: DataFrame,
    n_salt: int = DEFAULT_N_SALT,
    persist_media_locators: bool = True,
    input_partitions: int | None = None,
    preprocess_kwargs: dict | None = None,
    kernel_parallelism: int | None = None,
) -> DataFrame:
    """Full pipeline: documents + media -> extracted documents.

    Returns a DataFrame with the same (doc_id, spans) shape as the input,
    where every span's text has been replaced by its extraction result.

    ``persist_media_locators``: the media-span locator frame (doc_id,
    media_ref, offset — NO payloads, so it is tiny relative to the corpus)
    feeds two consumers (the distinct-ref recognition input and the
    join-back); caching it keeps the documents table at two scans instead
    of three. Disable if even the locator set exceeds cluster cache+disk.

    ``input_partitions``: explicit doc_id-hash repartition of the input
    (the SURVEY §3.4 'repartition by salted doc_id hash' stage). Leave None
    when the source is already well-split (bucketed Iceberg / many files);
    set it when reading few fat files so the UDF stages fan out.

    ``preprocess_kwargs``: kernel preprocessing overrides shipped into the
    media UDF (e.g. {'binarizer': 'adaptive', 'rotate_portrait': True}
    for photographed/scanned corpora); None keeps the default Otsu chain.

    ``kernel_parallelism``: partition count for the kernel-UDF stage
    (default 2x defaultParallelism). Per-image kernel cost varies ~4x
    with image size, so finer partitions trade a little per-task overhead
    against straggler tail; raise toward 4x cores when the corpus mixes
    very small and very large images.
    """
    if input_partitions:
        docs = docs.repartition(input_partitions, "doc_id")
    spans = explode_spans(docs)

    spans_text = spans.filter(F.col("kind") == "text").select(
        "doc_id",
        "kind",
        extract_main_text_udf(F.col("text")).alias("text"),
        "media_ref",
        "offset",
    )

    # kind='media' (OCR kernel) and kind='pdf' (layout parse) share ONE
    # distinct-ref pass: refs are deduped per (kind, media_ref), payloads
    # joined once, and extract_ref_udf dispatches per kind inside the Arrow
    # batch — one documents scan and one join-back for both modalities.
    spans_ref = spans.filter(F.col("kind").isin("media", "pdf")).select(
        "doc_id", "kind", "media_ref", "offset"
    )
    if persist_media_locators:
        spans_ref = spans_ref.persist()
    if kernel_parallelism is None:
        parallelism = spark.sparkContext.defaultParallelism * 2
    elif kernel_parallelism >= 1:
        parallelism = kernel_parallelism
    else:
        raise ValueError(f"kernel_parallelism must be >= 1, got {kernel_parallelism}")
    distinct_refs = spans_ref.select("kind", "media_ref").distinct()
    # Repartition the payloads (post-join, pre-UDF): partitions must be
    # sized by kernel COMPUTE, not bytes, or AQE coalesces the UDF stage.
    payloads = distinct_refs.join(media, "media_ref", "left").repartition(parallelism)
    if preprocess_kwargs:
        from ocr_text_recognition_spark.extraction.udfs import make_extract_ref_udf

        ref_udf = make_extract_ref_udf(**preprocess_kwargs)
    else:
        ref_udf = extract_ref_udf
    ref_text = payloads.select(
        "kind",
        "media_ref",
        ref_udf(F.col("kind"), F.col("content")).alias("text"),
    )
    spans_ref_out = spans_ref.join(ref_text, ["kind", "media_ref"], "left").select(
        "doc_id",
        "kind",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        "media_ref",
        "offset",
    )

    extracted = spans_text.unionByName(spans_ref_out)
    return reassemble_spans(extracted, n_salt=n_salt)


def run_extraction_demo(n_docs: int = 30, seed: int = 42) -> None:
    """Self-contained smoke run: generate corpus, run pipeline, assert
    span-sequence equality vs the plain-numpy golden path. Used by the
    project verify skill."""
    from ocr_text_recognition_spark import corpus
    from ocr_text_recognition_spark.io_pandas import pandas_to_spark
    from ocr_text_recognition_spark.session import get_spark

    spark = get_spark("extraction_demo")
    docs_pd, media_pd = corpus.make_corpus(n_docs, seed=seed)
    golden_pd = corpus.make_golden(docs_pd, media_pd)

    docs = pandas_to_spark(spark, docs_pd, "documents")
    media = pandas_to_spark(spark, media_pd, "media")
    result = run_extraction(spark, docs, media).collect()

    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in result
    }
    want = {
        row["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]]
        for _, row in golden_pd.iterrows()
    }
    assert set(got) == set(want), "doc_id set mismatch"
    mismatches = [d for d in want if got[d] != want[d]]
    assert not mismatches, f"span mismatch in {len(mismatches)} docs, e.g. {mismatches[:3]}"
    print(f"OK: span-sequence equality on {len(want)} docs ({sum(len(v) for v in want.values())} spans)")
