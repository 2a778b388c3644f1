"""Time-series regularization — calendar resampling with forward fill.

Event streams arrive irregularly; most downstream analytics (retention
curves, per-day joins, feature windows for training) want one row per
(key, day) on a dense calendar with the last observation carried
forward. This is the gap-fill operator warehouses call ``RESAMPLE`` /
``date_spine + LOCF``.

Shape, chosen for scale:

- the per-(key, day) "last observation" reduces each key-day's events
  to one row FIRST (row_number over (ts desc, tiebreak desc) — the
  deterministic twin of ``max_by``), so the calendar join is
  day-granular, never event-granular;
- the dense calendar comes from ``sequence(min_day, max_day)`` per key
  — a narrow generate-and-explode, no driver-side date loop, bounded
  by span not by row count;
- the forward fill is ``last(value, ignorenulls=True)`` over an
  unbounded-preceding row frame per key — one partition per key, fine
  while per-key day spans are bounded (they are: spans are days, not
  events); multi-year spans at extreme key cardinality would
  range-partition by (key, year) first and stitch boundaries.

Leading days before a key's first observation cannot occur (each key's
calendar starts at its own first event day), so the filled column is
total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_daily_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(key, day, value_ffill) on each key's dense [first_day, last_day]
    calendar; value_ffill = value of the latest event at or before that
    day (latest = max (ts, tiebreak), making same-timestamp events
    deterministic)."""
    src = df.select(
        F.col(key_col).alias("k"),
        F.to_date(ts_col).alias("day"),
        F.col(ts_col).alias("ts"),
        F.col(tiebreak_col).alias("tb"),
        F.col(value_col).alias("v"),
    )
    w_last = Window.partitionBy("k", "day").orderBy(
        F.desc("ts"), F.desc("tb")
    )
    last_per_day = (
        src.withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select("k", "day", "v")
    )
    span = src.groupBy("k").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = span.select(
        "k",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    w_ff = (
        Window.partitionBy("k")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return calendar.join(last_per_day, ["k", "day"], "left").select(
        F.col("k").alias(key_col),
        "day",
        F.last("v", ignorenulls=True).over(w_ff).alias("value_ffill"),
    )
