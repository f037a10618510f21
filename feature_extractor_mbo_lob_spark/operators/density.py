"""Density clustering (DBSCAN) over embedding columns — the scalable,
candidate-graph form.

Classic DBSCAN needs every point's eps-neighborhood; computing that exactly
is an all-pairs O(n^2) join, fatal at web scale. The production form (as in
every large-scale implementation) runs DBSCAN over an ANN candidate graph:
neighbor pairs come from the engine's existing hyperplane-LSH bucketing
(operators/similarity.py), the exact distance check keeps only true
eps-neighbors among candidates, and the density rules (core / border /
noise, cluster = connected component of core points) are applied on that
graph. With enough planes/bands the candidate graph contains every true
neighbor pair with high probability; recall is tunable exactly like the
near-dup family (lsh_recall measures it).

Engine-exactness: neighborhood membership is an INTEGER predicate —
lanes micro-quantize via floor(x*1e6 + 0.5) and the squared L2 distance is
an exact int64 sum, compared against eps_micro^2. Degrees, core flags and
cluster labels are therefore integer-derived end to end; no float ever
decides a cluster boundary (the round-2 canonicalization rule).

Scale shape: one bucket equi-join bounded by LSH bucket sizes (never a
CartesianProduct — plan-audited like the near-dup family), one groupBy for
degrees, and the O(log diameter) pointer-doubling connected-components
rounds from operators/dedup.py for the core graph. Border assignment is one
more equi-join onto the (small) core-cluster map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components

NOISE = -1


def quantized_sq_dist(a, b) -> F.Column:
    """Exact integer squared L2 distance between two float-array columns
    after per-lane micro-quantization (floor(x*1e6 + 0.5)): lanes in
    [-1, 1] quantize to |q| <= 1e6, so a 64-lane squared sum is < 2.6e14
    — comfortably int64, and bit-identical on any engine."""
    q = lambda v: F.transform(v, lambda x: F.floor(x.cast("double") * 1e6 + F.lit(0.5)).cast("long"))
    d = F.zip_with(q(a), q(b), lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0).cast("long"), lambda acc, x: acc + x)


def dbscan_from_pairs(
    points: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    min_pts: int = 3,
) -> DataFrame:
    """DBSCAN given a symmetric-closed-under-swap neighbor PAIR relation
    (each undirected eps-neighbor pair once, id_a < id_b) and the full
    point universe. Returns (id, is_core, cluster_id):

    * core      — |N_eps(p)| >= min_pts counting p itself;
    * cluster   — connected component of the core-core subgraph (label =
                  smallest member id; a core with no core neighbor is its
                  own singleton cluster);
    * border    — non-core with >= 1 core neighbor joins its SMALLEST
                  core neighbor's cluster (the deterministic tie rule —
                  plain DBSCAN leaves this order-dependent);
    * noise     — everything else, cluster_id = -1.
    """
    sym = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).unionAll(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    core = deg.filter(F.col("deg") + 1 >= min_pts).select(F.col("src").alias("id"))

    core_edges = (
        sym.join(core.withColumnRenamed("id", "src"), "src")
        .join(core.withColumnRenamed("id", "dst"), "dst")
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )
    cc = connected_components(core_edges, "id_a", "id_b")
    core_lbl = core.join(cc, "id", "left").select(
        "id", F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id")
    )

    # border: smallest cluster among core neighbors
    border_lbl = (
        sym.join(core_lbl.withColumnRenamed("id", "dst"), "dst")
        .join(core.withColumnRenamed("id", "src"), "src", "left_anti")
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("cluster_id").alias("cluster_id"))
    )

    lbl = core_lbl.withColumn("is_core", F.lit(1)).unionByName(
        border_lbl.withColumn("is_core", F.lit(0))
    )
    return (
        points.select(F.col(id_col).cast("long").alias("id"))
        .join(lbl, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("is_core"), F.lit(0)).cast("int").alias("is_core"),
            F.coalesce(F.col("cluster_id"), F.lit(NOISE)).cast("long").alias("cluster_id"),
        )
    )


def dbscan_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps_micro: int = 1_300_000,
    min_pts: int = 3,
    n_planes: int = 8,
    seed: int = 7,
    dim: int = 64,
) -> DataFrame:
    """End-to-end DBSCAN over an embedding column: hyperplane-LSH buckets
    generate candidates (same construction as similarity.hyperplane_near_dup
    — a bucket equi-join, never all-pairs), the exact integer quantized
    distance keeps true eps-neighbors, then dbscan_from_pairs applies the
    density rules. eps is in micro-units of L2 distance (1e6 = distance
    1.0 between unit vectors, i.e. cosine 0.5)."""
    from .similarity import hyperplane_signs

    e = emb.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    bucket, _ = hyperplane_signs(F.col("v"), dim=dim, n_planes=n_planes, seed=seed)
    b = e.withColumn("bk", bucket)
    a = b.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bk")
    c = b.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bk")
    pairs = (
        a.join(c, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            quantized_sq_dist(F.col("va"), F.col("vb"))
            <= F.lit(int(eps_micro) * int(eps_micro))
        )
        .select("id_a", "id_b")
    )
    return dbscan_from_pairs(
        emb.select(F.col(id_col).cast("long").alias(id_col)),
        pairs,
        id_col=id_col,
        min_pts=min_pts,
    )
