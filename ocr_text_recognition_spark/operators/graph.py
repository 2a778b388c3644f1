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


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts — the clustering-coefficient numerator,
    used to find tightly-linked host farms in a crawl graph.

    Algorithm: degree-ordered forward counting. Edges canonicalize to
    an undirected, self-loop-free DISTINCT set, then orient from the
    endpoint with the smaller (degree, node) key to the larger. Every
    triangle then appears as exactly one wedge (two out-edges of its
    lowest-key vertex) closed by one oriented edge — no double
    counting, no post-dedup. Orienting by DEGREE (not raw id) is the
    standard fan-out bound: a hub of degree d contributes wedges only
    toward higher-degree endpoints, making total wedge volume
    O(m^{3/2}) instead of O(sum d^2) — the difference between a
    feasible and an impossible join on a power-law web graph. The
    composite order key packs (degree, node) into one BIGINT
    (degree * 2^32 + node; node ids must fit 32 bits — re-key first at
    larger scales).

    Shuffles: degree agg, two orientation joins, the wedge self-join
    (keyed on the low vertex), and the closure join (keyed on the
    candidate edge). Oracle twin uses the id-ordered textbook variant —
    a genuinely different algorithm arriving at the same triangles."""
    e0 = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).cast("long").alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e0.select(F.col("u").alias("node"))
        .union(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    key = (F.col("deg") * F.lit(1 << 32) + F.col("node")).alias("okey")
    dk = deg.select("node", key)
    withk = (
        e0.join(dk.withColumnRenamed("node", "u").withColumnRenamed("okey", "ku"), "u")
        .join(dk.withColumnRenamed("node", "v").withColumnRenamed("okey", "kv"), "v")
    )
    oriented = withk.select(
        F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.least("ku", "kv").alias("klo"),
        F.greatest("ku", "kv").alias("khi"),
    )
    x = oriented.select("lo", F.col("hi").alias("b"), F.col("khi").alias("kb"))
    y = oriented.select("lo", F.col("hi").alias("c"), F.col("khi").alias("kc"))
    wedges = x.join(y, "lo").filter(F.col("kb") < F.col("kc"))
    closure = oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    tri = wedges.join(closure, ["b", "c"]).select("lo", "b", "c")
    corners = (
        tri.select(F.col("lo").alias("node"))
        .union(tri.select(F.col("b").alias("node")))
        .union(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


def bfs_distances(
    edges: DataFrame,
    source_nodes: list[int],
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 4,
) -> DataFrame:
    """Multi-source BFS hop distances, bounded at ``max_hops`` — the
    crawl-depth / link-distance primitive (how many hops is every host
    from the seed list?). The third graph-algorithm family next to
    fixed-iteration PageRank and the triangle join: frontier TRAVERSAL
    with early min-stabilization.

    Per hop: one edge join keyed on the frontier + one min-combining
    aggregate — the distance table stays O(reached nodes) while edges
    stream through the join, so iteration cost is bounded by the
    frontier's out-degree sum, never by graph size. Distances are exact
    integers (bit-identical on any engine); nodes unreachable within
    ``max_hops`` are absent, matching the bounded recursive-CTE oracle.
    For hop counts beyond ~10, interpose ``localCheckpoint()`` to
    truncate lineage (the ``dup_clusters`` pattern)."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    dist = nodes.filter(
        F.col("node").isin([int(s) for s in source_nodes])
    ).withColumn("dist", F.lit(0))
    for _ in range(max_hops):
        step = (
            dist.join(e, dist["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.lit(1)).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(step)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist.select("node", F.col("dist").cast("int").alias("dist"))
