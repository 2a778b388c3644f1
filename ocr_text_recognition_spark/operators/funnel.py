"""Ordered-funnel analysis: per user, the earliest strictly-ordered
completion of a step sequence (view -> click -> purchase), the classic
product-analytics operator.

Earliest-completion semantics: t1 = min ts of step 1; t_{i+1} = min ts of
a step-{i+1} event STRICTLY after t_i. This greedy per-step minimum is
optimal (any valid completion has step-i time >= t_i, inductively), so no
per-user event-sequence scan is needed — each step is one equi-join on
the user key plus one min-aggregate, k shuffles for k steps, all on the
SAME key so the exchanges line up. No window buffers a user's full event
history, which is what kills the naive collect_list approach when one
user has 10^8 events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per user who completed step 1: epoch-second columns
    ``t1..tk`` (null from the first uncompleted step on) and ``reached``,
    the number of completed steps."""
    ts_s = F.unix_timestamp(F.col(ts_col))
    base: DataFrame | None = None
    for i, step in enumerate(steps, start=1):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col), ts_s.alias("_t")
        )
        if base is None:
            base = ev.groupBy(user_col).agg(F.min("_t").alias("t1"))
        else:
            nxt = (
                ev.join(
                    base.select(user_col, F.col(f"t{i - 1}").alias("_prev")),
                    user_col,
                )
                .filter(F.col("_t") > F.col("_prev"))
                .groupBy(user_col)
                .agg(F.min("_t").alias(f"t{i}"))
            )
            base = base.join(nxt, user_col, "left")
    reached = F.lit(0)
    for i in range(1, len(steps) + 1):
        reached = reached + F.col(f"t{i}").isNotNull().cast("int")
    return base.withColumn("reached", reached)
