"""Bin-bucketed range join — the interval operator Spark's optimizer
lacks a physical strategy for.

A join whose only predicate is an inequality (``start <= p AND p <= end``)
gives Catalyst no equi-key, so it plans BroadcastNestedLoopJoin (or a
cartesian product) — O(|L|x|R|) comparisons and a single-threaded
broadcast side. The classic fix is to manufacture the equi-key: quantize
the number line into fixed-width bins, explode each interval to every bin
it overlaps, map each point to its single containing bin, equi-join on
the bin id, and re-check the exact predicate. Each (interval, point)
candidate pair meets in exactly one bin (the point's), so no dedup pass
is needed. Work becomes O(points + intervals x bins_per_interval +
true_matches), fully shuffled-parallel on the bin key.

Pick ``bin_width`` near the typical interval length: much smaller
multiplies the interval explode factor, much larger multiplies false
candidates per bin. Optional ``keys`` add equality columns to the join
(per-user intervals etc.), which also bounds bin skew; with no keys, a
heavily hit bin behaves like any hot key and AQE skew-join splits it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Inner join: every (interval row x point row) with
    ``start <= point <= end`` (and equal ``keys``, if given). The three
    coordinate columns must be numeric (cast timestamps to epoch seconds
    first). Output: all interval columns, then all point columns."""
    binned_p = points.withColumn(
        "_bin", F.floor(F.col(point_col) / F.lit(bin_width))
    )
    binned_i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bin_width)),
                F.floor(F.col(end_col) / F.lit(bin_width)),
            )
        ),
    )
    on = [F.col(f"i.{k}") == F.col(f"p.{k}") for k in keys]
    on.append(F.col("i._bin") == F.col("p._bin"))
    on.append(F.col(f"i.{start_col}") <= F.col(f"p.{point_col}"))
    on.append(F.col(f"p.{point_col}") <= F.col(f"i.{end_col}"))
    out_cols = [F.col(f"i.{c}") for c in intervals.columns] + [
        F.col(f"p.{c}") for c in points.columns if c not in keys
    ]
    joined = binned_i.alias("i").join(binned_p.alias("p"), on, "inner")
    return joined.select(*out_cols)
