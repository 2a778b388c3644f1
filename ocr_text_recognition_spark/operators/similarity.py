"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the correctness baseline. Queries are a
  dimension-sized table -> broadcast crossJoin; the dot product is
  F.zip_with + F.aggregate (JVM-side, no UDF); top-k via window rank.
- LSH-bucketed (random hyperplane) variant: the scale path. Each vector
  gets a b-bit signature from fixed seeded hyperplanes; candidates only
  meet within a bucket, so the join is O(bucket sizes), not O(n*q).

At 100 TB the brute-force path is only for re-ranking candidates; the
signature computation is a narrow map and the bucket join shuffles on the
signature key. An IVF variant would replace hyperplanes with k-means
centroids — same join shape.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """For every query vector, the k nearest corpus vectors by cosine."""
    q = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("q_vec"))
    )
    scored = embeddings.crossJoin(q).select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col("q_vec")).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 7) -> list[list[float]]:
    """Fixed seeded random hyperplanes (deterministic across runs/executors)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """b-bit sign signature as a bigint."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(float(x)) for x in p])) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    return sum(bits).cast("long")


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share the hyperplane bucket; exact
    cosine re-ranks within the bucket. Recall < 1 by construction — the
    scale/recall knob is (n_planes, multi-probe)."""
    planes = hyperplanes(dim, n_planes)
    e = embeddings.withColumn("bucket", lsh_signature(F.col(vec_col), planes))
    q = F.broadcast(
        queries.select(
            query_id_col,
            F.col(vec_col).alias("q_vec"),
        ).withColumn("bucket", lsh_signature(F.col("q_vec"), planes))
    )
    scored = e.join(q, "bucket").select(
        query_id_col, id_col, cosine(F.col(vec_col), F.col("q_vec")).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def embedding_near_dup(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.99,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing + exact
    cosine verify (the embedding analog of MinHash dedup)."""
    planes = hyperplanes(dim, n_planes)
    e = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("bucket", lsh_signature(F.col("v"), planes))
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
