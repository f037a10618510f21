"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the correctness baseline: pairwise equi-free
  join; fine at small n, quadratic at scale;
* IVF (inverted-file) — the scale path: assign every vector to its nearest
  of K deterministic centroids (broadcast join), then search only within the
  probed cluster(s). Shuffle is O(n·K) work + O(n) data instead of O(n^2).

Dot products are JVM-side higher-order functions (zip_with + aggregate) —
no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..contract import DIVISION_GUARD_EPS


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b) -> Column:
    return (dot(a, b) / (norm(a) * norm(b) + F.lit(DIVISION_GUARD_EPS))).cast("double")


def brute_force_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    query: DataFrame | None = None,
) -> DataFrame:
    """Top-k cosine neighbors for every query vector (defaults to self-join
    all-pairs, excluding self). Returns (query_id, neighbor_id, cos, rank)."""
    base = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"))
    q = (query or df).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    pairs = q.crossJoin(base).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("_qv"), F.col("_nv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def deterministic_centroids(df: DataFrame, id_col: str, vec_col: str, n: int) -> DataFrame:
    """First n vectors by id — deterministic 'trained' centroids (stand-in
    for k-means; the assignment/probe machinery is identical)."""
    return (
        df.orderBy(id_col)
        .limit(n)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("centroid_id"),
            F.col(vec_col).alias("_cv"),
        )
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (broadcast the
    tiny centroid table; rank over K candidates)."""
    joined = df.crossJoin(F.broadcast(centroids))
    scored = joined.select(
        id_col, vec_col, "centroid_id", cosine(F.col(vec_col), F.col("_cv")).alias("_c")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_c").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(id_col, vec_col, "centroid_id")
    )


def ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
) -> DataFrame:
    """Approximate top-k: search only within the query's own cluster
    (nprobe=1). Returns (query_id, neighbor_id, cos, rank). Recall depends
    on clustering; the brute-force operator is the oracle."""
    cents = deterministic_centroids(df, id_col, vec_col, n_centroids)
    assigned = ivf_assign(df, cents, id_col, vec_col)
    a = assigned.select(
        F.col("centroid_id"), F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    b = assigned.select(
        F.col("centroid_id"), F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    pairs = a.join(b, on="centroid_id").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", cosine(F.col("_qv"), F.col("_nv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
