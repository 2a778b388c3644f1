"""Distributed corpus statistics.

``exact_percentiles`` computes EXACT linear-interpolated percentiles
(the ``quantile_cont`` / numpy ``percentile`` definition: index
``h = p * (n - 1)`` over the sorted values, interpolating between
``floor(h)`` and ``floor(h) + 1``) without Spark's built-in
``percentile()``, which buffers every value of a group in executor
memory — a non-starter when one group holds 10^10 rows.

The trick: integer-ish metrics (token counts, char counts, scores on a
grid) have a SMALL value domain, so the sorted sequence is fully
described by the (group, value, count) histogram. One map-side-combining
groupBy builds the histogram, one per-group cumulative window localizes
each requested rank to its covering row, one final groupBy interpolates.
Shuffle volume is O(groups x distinct values), independent of row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: dict[str, float],
) -> DataFrame:
    """Per ``group_col``: row count ``n`` plus one exact interpolated
    percentile column per (name -> p) entry in ``ps``. The value column
    must be numeric; ties and duplicates are handled exactly (they are
    the whole point of the histogram form)."""
    hist = df.groupBy(group_col, value_col).agg(F.count("*").alias("cnt"))
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    h = (
        hist.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("n", F.sum("cnt").over(w_all))
        .withColumn("cum_prev", F.col("cum") - F.col("cnt"))
    )

    v = F.col(value_col).cast("double")

    def covers(rank: Column) -> Column:
        # the histogram row owning 0-based sorted rank `rank`
        return (F.col("cum_prev") <= rank) & (F.col("cum") > rank)

    aggs = [F.max("n").alias("n")]
    for name, p in ps.items():
        h_idx = F.lit(p) * (F.col("n") - 1)  # constant within a group
        lo = F.floor(h_idx)
        hi = F.least(lo + 1, F.col("n") - 1)
        lo_val = F.min(F.when(covers(lo), v))
        hi_val = F.min(F.when(covers(hi), v))
        frac = F.max(h_idx - F.floor(h_idx))
        aggs.append(
            F.round(lo_val + frac * (hi_val - lo_val), 2).alias(name)
        )
    return h.groupBy(group_col).agg(*aggs)


def global_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    bin_width: float,
    rank_col: str = "rank",
) -> DataFrame:
    """Global ROW_NUMBER over (value, tiebreak) ascending WITHOUT the
    single-reducer window: an empty-PARTITION BY window funnels the whole
    corpus through one task, the classic driver-shaped bottleneck.

    Two-phase histogram-offset form: rows are bucketed by a PURE function
    of the value (``floor(value / bin_width)`` — deterministic and
    lineage-consistent, unlike spark_partition_id over a sampled range
    exchange), per-bucket counts roll into exclusive prefix offsets (a
    window over #buckets rows, trivially small), and a per-BUCKET
    row_number plus the broadcast offset is the exact global rank. One
    full-data shuffle (the bucket window) — the same count an orderBy
    would pay — plus a bounded side-agg. A hot bucket is ordinary key
    skew: size ``bin_width`` so buckets hold ~partition-sized row counts
    at the target scale, and AQE splits stragglers.

    ``(value_col, tiebreak_col)`` must be a total order (unique
    tiebreaker), or ranks within ties are nondeterministic."""
    bucket = F.floor(F.col(value_col) / F.lit(bin_width))
    b = df.withColumn("_bkt", bucket)
    counts = b.groupBy("_bkt").agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
    ).select("_bkt", "_off")
    w_in = Window.partitionBy("_bkt").orderBy(value_col, tiebreak_col)
    return (
        b.withColumn("_rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "_bkt")
        .withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_bkt", "_off", "_rn")
    )


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Frequency-of-frequencies skew profile of a join/agg key — the
    diagnostic that decides whether a key needs salting BEFORE the 10^12
    -row shuffle runs. Per power-of-two band of per-key row count
    (band = floor(log2(cnt)), computed as bit-length - 1 in pure integer
    arithmetic so 2^k never lands on a float boundary): how many keys
    fall in the band, how many rows they carry, and the band's min/max
    key cardinality. A healthy key shows rows concentrated in low bands;
    a top band holding a macroscopic row share is the salting signal.

    Two aggregations: the per-key count (map-side combining, the same
    shuffle any groupBy on the key would pay) and a #distinct-keys-sized
    rollup — output is O(log(max key count)) rows regardless of input
    size."""
    counts = df.groupBy(key_col).agg(F.count("*").alias("cnt"))
    band = (F.length(F.conv(F.col("cnt").cast("string"), 10, 2)) - 1).cast("int")
    return (
        counts.withColumn("band", band)
        .groupBy("band")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.min("cnt").alias("min_cnt"),
            F.max("cnt").alias("max_cnt"),
        )
    )


def trailing_window(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    seconds: int,
) -> DataFrame:
    """Event-time trailing aggregate (`RANGE BETWEEN seconds PRECEDING
    AND CURRENT ROW`): per row, the count and sum of the group's values
    in the closed trailing window. The frame is a range frame over an
    INTEGER epoch column with an INTEGER value column — no float
    accumulation, so the rolling sums are exact and order-independent.
    One shuffle on the group key; frames never cross groups, so skew
    follows the key distribution (profile with key_skew_profile)."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(ts_col)
        .rangeBetween(-seconds, 0)
    )
    return df.select(
        "*",
        F.count("*").over(w).alias("n_trailing"),
        F.sum(value_col).over(w).alias("sum_trailing"),
    )


def group_ols_slope(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group simple-regression slope (trend detection: is a host's
    quality drifting? is a user's spend rising?) in EXACT integer
    arithmetic. x and y must be integer columns; x is rebased by the
    per-group minimum first — slope is shift-invariant, and rebasing
    keeps sum(x*x) far from BIGINT overflow for epoch-second inputs
    (raw epoch² already exceeds int64 after ~3 rows). Two combining
    aggregates (the min pass, then the moment sums) joined on the group
    key; the only float is the final rounded quotient of two exactly-
    computed integers. Groups with n < 2 or zero x-variance drop out."""
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    mins = base.groupBy("g").agg(F.min("x").alias("x0"))
    r = base.join(mins, "g").select(
        "g", (F.col("x") - F.col("x0")).alias("x"), "y"
    )
    s = r.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        s.filter((F.col("n") >= 2) & (denom > 0))
        .select(
            F.col("g").alias(group_col),
            F.col("n").cast("long").alias("n"),
            F.round(num * F.lit(1.0) / denom, 6).alias("slope"),
        )
    )


KMV_SPACE = 1 << 32  # md5 32-bit-prefix hash space


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group approximate COUNT(DISTINCT value) via a k-minimum-values
    (KMV) sketch — the cardinality primitive for 10^12-row corpora where
    an exact distinct would shuffle every distinct value to one reducer
    per group.

    Unlike HLL (whose register layout differs between engines), KMV is
    reproducible anywhere: hash each value with the first 8 hex digits
    of md5 (identical in Spark, DuckDB, Python), keep each group's k
    smallest distinct hashes, and estimate
    ``(k-1) * 2^32 div kth_min_hash`` — exact integer arithmetic, so
    two engines agree bit-for-bit. Groups with < k distinct values
    report their exact count (the sketch is lossless below k).

    Shuffles: one distinct on (group, hash) — map-side combining and
    O(distinct) not O(rows) — then a per-group top-k window. At web
    scale the window's per-group fan-in is bounded by the distinct
    count; for mega-cardinality groups interpose the two-level salted
    top-k (``curation.top_k_per_group``): min-k is a semilattice, so
    per-salt top-k then global top-k is exact."""
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    hashes = df.select(F.col(group_col).alias("grp"), h.alias("h")).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    topk = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("grp", "h")
    )
    return (
        topk.groupBy("grp")
        .agg(F.count("*").alias("k_used"), F.max("h").alias("kth_min_hash"))
        .select(
            F.col("grp").alias(group_col),
            F.col("k_used").cast("long").alias("k_used"),
            F.col("kth_min_hash").cast("long").alias("kth_min_hash"),
            F.when(F.col("k_used") < k, F.col("k_used"))
            .otherwise(
                F.expr(
                    f"({k - 1}L * {KMV_SPACE}L) div greatest(kth_min_hash, 1L)"
                )
            )
            .cast("long")
            .alias("est_distinct"),
        )
    )
