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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Inner join of two interval sets on CLOSED overlap
    (``l_start <= r_end AND r_start <= l_end``, plus equal ``keys``)
    without a nested-loop plan.

    Both sides explode to every bin they touch and equi-join on the bin
    id; unlike the point join, an overlapping pair can now meet in MANY
    shared bins, so a dedup rule is needed. Instead of a post-join
    ``dropDuplicates`` (a second full shuffle), the join keeps a pair
    only in the bin containing ``greatest(l_start, r_start)`` — the
    later of the two starts, which lies inside BOTH intervals whenever
    they overlap, so every true pair survives in exactly one bin and
    the output is duplicate-free straight off the join. Work is
    O(rows x bins_per_interval + true_pairs); non-key column names
    must be disjoint between the two inputs."""
    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / F.lit(bin_width)),
                    F.floor(F.col(e) / F.lit(bin_width)),
                )
            ),
        )

    bl, br = binned(left, l_start, l_end), binned(right, r_start, r_end)
    on = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys]
    on.append(F.col("l._bin") == F.col("r._bin"))
    on.append(F.col(f"l.{l_start}") <= F.col(f"r.{r_end}"))
    on.append(F.col(f"r.{r_start}") <= F.col(f"l.{l_end}"))
    on.append(
        F.col("l._bin")
        == F.floor(
            F.greatest(F.col(f"l.{l_start}"), F.col(f"r.{r_start}"))
            / F.lit(bin_width)
        )
    )
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c not in keys
    ]
    return bl.alias("l").join(br.alias("r"), on, "inner").select(*out_cols)
