"""Terminal sinks (SURVEY.md §2.1) — one interface over the reference's
export paths:

- text sink        <- save_text_to_file (/root/reference/src/services/file_service.py:32-56)
- CSV sink         <- export_to_csv (table_ocr_service.py:489-506), UTF-8, header
- JSON sink        <- export_to_json records (table_ocr_service.py:508-525)
- grades JSON sink <- export_to_json_format (enhanced_table_ocr_service.py:595-617)
- TSV (clipboard)  <- dataframe_to_clipboard_format (table_ocr_service.py:555-565)
- Excel edge sink  <- export_to_excel (table_ocr_service.py:527-553): no native
  Spark writer; collected per-doc results go through pandas (documented edge
  sink, only valid for dimension-sized outputs)
- parquet/output   <- the engine's own scale path (partitioned, overwritable)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_text(df: DataFrame, path: str, text_col: str = "text") -> None:
    df.select(F.col(text_col).cast("string")).write.mode("overwrite").text(path)


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("encoding", "UTF-8")
        .csv(path)
    )


def write_tsv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("sep", "\t")
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 100_000,
) -> None:
    """Corpus-scale parquet writer. ``maxRecordsPerFile`` bounds per-task
    output files: without it a 100 TB job emits whatever each task holds —
    unsplittable multi-GB giants from fat partitions alongside metadata-
    pressure confetti from thin ones. Optional ``partition_by`` gives
    downstream readers partition pruning (see
    tests/test_plans.py::test_partitioned_table_scan_prunes)."""
    w = df.write.mode("overwrite").option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_grades_json(cells_long: DataFrame, path: str) -> None:
    """Nested {grades:[{subject, grades:[...]}]} documents, one JSON text
    line per doc (the reference's grades document shape, D7)."""
    from ocr_text_recognition_spark.operators.tableops import grades_json

    grades_json(cells_long).select("grades_json").write.mode("overwrite").text(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by).option("partitionOverwriteMode", "dynamic")
    w.parquet(path)


def to_excel_edge(df: DataFrame, path: str, max_rows: int = 100_000) -> bool:
    """Edge sink: collect and write xlsx. Prefers pandas+openpyxl when
    installed; otherwise the stdlib writer (ocr_text_recognition_spark.xlsx)
    emits the same one-sheet file, so the positive path works in bare
    containers. Returns False only when the result exceeds max_rows (this
    sink is for dimension-sized exports; the scale path is parquet)."""
    if df.limit(max_rows + 1).count() > max_rows:
        return False
    try:
        import openpyxl  # noqa: F401

        df.toPandas().to_excel(path, index=False)
    except ImportError:
        from ocr_text_recognition_spark.xlsx import write_xlsx

        write_xlsx(path, df.columns, [tuple(r) for r in df.collect()])
    return True
