"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what a cluster deployment sets per-job:
AQE on (runtime re-plan + skew-join splitting), Arrow transfers on
(all kernel UDFs are pandas/Arrow batched), shuffle partitions sized
to the parallelism level instead of the 200 default, and a capped
Arrow batch size so decoded-image batches fit executor memory
(SURVEY.md §4.2 item 4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Images decode to ~W*H bytes each; keep Arrow batches small enough that a
# batch of decoded ndarrays stays well under executor memory at 100 TB scale.
ARROW_MAX_RECORDS_PER_BATCH = 256


def get_spark(
    app_name: str = "ocr_text_recognition_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` controls local parallelism (``local[cores]``); on a real
    cluster the master comes from spark-submit and this arg is ignored.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Spark 4.1's checksummed checkpoint writer (ChecksumCheckpoint-
        # FileManager) can deadlock a state-store delta commit: the task
        # blocks forever in createWithChecksum -> awaitResult on the
        # background checksum future (observed wedging applyInPandasWith-
        # State commits on local disk). The checksum is an integrity belt
        # for remote object-store checkpoints; disable it by default and
        # let deployments that want it re-enable via extra_conf.
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    )
    # Only force a master when none is configured (spark-submit wins).
    if not os.environ.get("SPARK_MASTER") and "SPARK_SUBMIT" not in os.environ:
        builder = builder.master(f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
