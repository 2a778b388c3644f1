"""Gap-sessionization — the reference's most interesting relational
semantics (SURVEY.md §2.5): consecutive items whose ordering-gap exceeds a
threshold start a new session. Covers:

- token row-grouping by y-gap (threshold 20 px,
  /root/reference/src/services/table_ocr_service.py:260-282; 30 px EasyOCR
  path :398-420)
- 1-D DBSCAN row clustering with min_samples=1 (eps=20,
  /root/reference/src/services/enhanced_table_ocr_service.py:283-302) —
  equivalent to gap-sessionization, which lets the engine drop sklearn
- scanline merge (<10 px, table_ocr_service.py:176-188)
- event-time sessionization over the events stream table (the same window
  shape applied to timestamps)

All are the classic lag + conditional cumulative-sum window: one shuffle on
the partition key, no UDFs, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gap_sessionize(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    gap: Column | float,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign 0-based session ids within each partition: a new session
    starts when order_col jumps by MORE than ``gap`` from the previous row.
    """
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    prev = F.lag(order_col).over(w)
    is_new = F.when(prev.isNull(), F.lit(0)).when(
        (F.col(order_col) - prev) > gap, F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(session_col, F.sum(is_new).over(w))


def tokens_to_grid(
    tokens: DataFrame,
    doc_col: str = "doc_id",
    y_col: str = "top",
    x_col: str = "left",
    y_gap: float = 20,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Token boxes -> (row_idx, col_idx) grid positions, the reference's
    _group_text_into_table: sort by (top, left), y-gap sessionize rows,
    sort each row by left. ``tie_cols`` adds deterministic tie-breaks for
    inputs where (left, top) may repeat within a row."""
    with_rows = gap_sessionize(tokens, [doc_col], y_col, y_gap, session_col="row_idx")
    w_col = Window.partitionBy(doc_col, "row_idx").orderBy(x_col, y_col, *(tie_cols or []))
    return with_rows.withColumn("col_idx", F.row_number().over(w_col) - 1)
