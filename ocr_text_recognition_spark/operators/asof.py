"""As-of join — the time-series operator Spark's DataFrame API lacks.

For every left row, attach the most recent right row with
``right.ts <= left.ts`` for the same key (LEFT semantics: unmatched left
rows survive with nulls), matching DuckDB's ``ASOF LEFT JOIN``.

Implementation is the scalable union+window form, NOT a range join:
tag both sides, union, and per key take the running ``last(right payload,
ignorenulls)`` in (ts, side) order — right rows sort before left rows at
equal timestamps so a same-instant right row is visible. One shuffle
(the per-key window), no range-condition join explosion, no broadcast
requirement on either side. A skewed key skews the window partition the
same way it would skew any per-key operator; the key here is typically a
user/session id with bounded per-key row counts.

Determinism requires the right side unique per (key, ts) — the same
contract DuckDB's ASOF JOIN has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Left as-of join. Output columns: every left column, then every
    right column except ``key`` prefixed ``asof_`` (null when no right
    row precedes the left row for that key)."""
    lpay = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    rcols = [c for c in right.columns if c != key]
    rpay = F.struct(*[F.col(c).alias(f"asof_{c}") for c in rcols]).alias("_r")
    ltype = left.select(lpay).schema[0].dataType
    rtype = right.select(rpay).schema[0].dataType

    l2 = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        lpay,
        F.lit(None).cast(rtype).alias("_r"),
    )
    r2 = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(ltype).alias("_l"),
        rpay,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l2.unionByName(r2)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select("_l.*", "_m.*")
    )
