"""Partition-level checkpointing + idempotent resume (SURVEY.md §4.2 item 2).

The unit of work is a doc_id hash bucket. Output is laid out as
``out_dir/bucket=N/`` (one directory per bucket, written atomically by
Spark's committer); a ledger parquet records completed buckets. Resume
anti-joins the ledger and reprocesses only missing buckets. Because bucket
directories are overwritten whole and the ledger is appended only AFTER a
bucket's output commits, a crash between the two reprocesses that bucket —
deterministic kernel + whole-directory overwrite = exactly-once output.

On a real cluster the ledger lives in an Iceberg table and the output in an
Iceberg-partitioned table (overwritePartitions); the parquet-directory
layout here keeps identical semantics without the Iceberg runtime jar
(SURVEY.md §7 risk item).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_text_recognition_spark.extraction.pipeline import run_extraction

DEFAULT_N_BUCKETS = 16


def bucket_of(doc_id_col, n_buckets: int):
    return F.pmod(F.xxhash64(doc_id_col), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, ledger_dir: str) -> set[int]:
    if not os.path.isdir(ledger_dir) or not any(
        f.endswith(".parquet") for _, _, fs in os.walk(ledger_dir) for f in fs
    ):
        return set()
    return {
        r["bucket"] for r in spark.read.parquet(ledger_dir).select("bucket").distinct().collect()
    }


def run_with_checkpoints(
    spark: SparkSession,
    docs: DataFrame,
    media: DataFrame,
    out_dir: str,
    ledger_dir: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
    buckets_per_wave: int = 4,
    max_waves: int | None = None,
    run_id: str | None = None,
    preprocess_kwargs: dict | None = None,
) -> list[int]:
    """Process the corpus bucket-wave by bucket-wave, checkpointing each.

    ``max_waves`` exists for kill/resume tests (process only the first K
    waves, then 'crash'). Returns the buckets processed this invocation.

    Concurrency contract: the ledger append is a separate write AFTER the
    bucket output commit, so a crash between them is safe (the bucket is
    simply reprocessed; dynamic partition overwrite makes the redo
    idempotent). TWO resumed drivers running concurrently can both pick
    an unledgered bucket and double-process it — also safe (idempotent
    output, duplicate ledger rows deduped by ``completed_buckets``'s
    distinct) but wasteful; deployments that need single-writer semantics
    should fence on ``run_id`` (e.g. a ledger precondition or a lock
    service) before starting a wave.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    done = completed_buckets(spark, ledger_dir)
    todo = [b for b in range(n_buckets) if b not in done]
    waves = [todo[i : i + buckets_per_wave] for i in range(0, len(todo), buckets_per_wave)]
    if max_waves is not None:
        waves = waves[:max_waves]

    docs_b = docs.withColumn("bucket", bucket_of(F.col("doc_id"), n_buckets))
    processed: list[int] = []
    for wave in waves:
        wave_docs = docs_b.filter(F.col("bucket").isin(wave))
        result = run_extraction(
            spark, wave_docs.drop("bucket"), media, preprocess_kwargs=preprocess_kwargs
        ).withColumn("bucket", bucket_of(F.col("doc_id"), n_buckets))
        # Whole-directory overwrite per bucket == idempotent re-run.
        (
            result.repartition("bucket")
            .write.partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(out_dir)
        )
        # Ledger append happens strictly after the output commit.
        ledger_rows = [
            (int(b), run_id, float(time.time())) for b in wave
        ]
        spark.createDataFrame(
            ledger_rows, "bucket int, run_id string, completed_at double"
        ).coalesce(1).write.mode("append").parquet(ledger_dir)
        processed.extend(wave)
    return processed


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir).drop("bucket")
