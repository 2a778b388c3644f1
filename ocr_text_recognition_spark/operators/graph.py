"""Host-graph PageRank — crawl prioritization over the link graph.

A crawl frontier at web scale ranks hosts by link authority before
spending fetch budget. This is the classic iterative-join workload: per
iteration, each node's rank flows along its out-edges and re-aggregates
at the destinations — one rank-keyed join plus one dst-keyed aggregate,
both map-side-combining, per iteration. No adjacency matrix, no driver
state; the graph lives as an ordinary (src, dst) DataFrame.

Determinism across engines is the hard part: float PageRank diverges
between engines in the last ulp, and after k iterations the divergence
compounds past any rounding fence. So ranks here are BIGINT
parts-per-million: initial rank 1_000_000 per node, per-edge
contribution ``(rank * damping_ppm) div (1_000_000 * outdeg)`` (exact
integer floor division), new rank ``(1_000_000 - damping_ppm) +
sum(contribs)``. Every operation is closed over the integers, so any
engine — Spark, DuckDB, a calculator — produces identical bits after
any number of iterations. The truncation error vs real PageRank is
bounded by iterations/1e6, irrelevant for ordering hosts.

Simplifications (documented, standard for the frontier use case):
multi-edges collapse (the input is made DISTINCT), dangling-node mass
evaporates instead of redistributing, and the iteration count is fixed
rather than convergence-tested — at 10^12 docs you budget iterations,
not epsilon. For iteration counts beyond ~10, interpose
``localCheckpoint()`` every few rounds to truncate the growing plan
lineage (same pattern as ``dedup.dup_clusters``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping_ppm: int = 850_000,
) -> DataFrame:
    """(node, rank_ppm) after ``iterations`` exact-integer PageRank
    rounds over the DISTINCT (src, dst) edge set."""
    e0 = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    nodes = (
        e0.select(F.col("src").alias("node"))
        .union(e0.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e0.groupBy("src").agg(F.count("*").alias("outdeg"))
    e = e0.join(outdeg, "src")

    ranks = nodes.withColumn("rank", F.lit(PPM).cast("long"))
    base = PPM - damping_ppm
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                "dst",
                F.expr(
                    f"(rank * {damping_ppm}L) div ({PPM}L * outdeg)"
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            contribs, nodes["node"] == contribs["dst"], "left"
        ).select(
            "node",
            (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
            .cast("long")
            .alias("rank"),
        )
    return ranks.select("node", F.col("rank").alias("rank_ppm"))
