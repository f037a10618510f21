#!/usr/bin/env python
"""Persisted ANN index over an embedding corpus — build once, query many
(the serving shape a 100-TB similarity deployment actually uses; the
registry's ivf_topk recomputes its index per query by design, as an
oracle-checkable one-shot).

    # build: k-means centroids + cluster-partitioned vectors + manifest
    spark-submit --py-files dist/engine.zip jobs/search_corpus.py build \
        --input /path/embeddings --index /path/index --k 64 --iters 2

    # update: assign NEW vectors to the existing centroids and append to
    # the partitioned store (no recluster; ids already present are skipped,
    # so re-runs are idempotent) — the daily-increment path
    spark-submit ... jobs/search_corpus.py update \
        --index /path/index --input /path/new_embeddings.parquet

    # query: nearest clusters via the tiny centroid table, scan ONLY those
    # partitions (partition pruning does the file skipping), exact cosine
    # top-k inside the probed clusters
    spark-submit ... jobs/search_corpus.py query \
        --index /path/index --queries /path/queries.parquet \
        --topk 5 --nprobe 2 --out /path/hits

Local smoke:

    python jobs/search_corpus.py build --input /root/testdata/sf0.001 \
        --index /tmp/ann_index --k 4
    python jobs/search_corpus.py query --index /tmp/ann_index \
        --queries /root/testdata/sf0.001/embeddings.parquet --topk 3

Index layout:
    <index>/centroids.parquet            (centroid_id, _cv)   — K rows
    <index>/vectors.parquet/centroid_id=N/...                 — partitioned
    <index>/manifest.json                (k, iters, dim, n_vectors, ...)

Scale shape: build = kmeans_lloyd (two keyed shuffles per round, never a
driver collect of vectors) + ONE partitioned write clustered by
centroid_id. Query = broadcast K-row centroid table to route, then a
centroid_id equi-join against the partitioned store — Spark prunes
unprobed partitions at scan time — and a per-cluster window rank. No
stage ever touches the full corpus after build.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _build(args) -> None:
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark import get_spark
    from feature_extractor_mbo_lob_spark.operators.similarity import kmeans_lloyd

    spark = get_spark(app_name="fex-ann-build", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()
    path = args.input
    if not path.endswith(".parquet"):
        path = f"{path}/embeddings.parquet"
    emb = spark.read.parquet(path)

    assign, centroids = kmeans_lloyd(emb, k=args.k, iters=args.iters)
    idx = Path(args.index)
    centroids.coalesce(1).write.mode("overwrite").parquet(str(idx / "centroids.parquet"))
    vecs = emb.join(assign.select("vec_id", "centroid_id"), "vec_id")
    (
        vecs.repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(str(idx / "vectors.parquet"))
    )
    n = emb.count()
    dim = emb.select(F.size("embedding").alias("d")).first()["d"]
    manifest = {
        "k": args.k, "iters": args.iters, "dim": int(dim),
        "n_vectors": int(n), "input": path,
        "built_wall_sec": round(time.time() - t0, 2),
    }
    (idx / "manifest.json").write_text(json.dumps(manifest))
    print(json.dumps({"mode": "build", **manifest}))
    spark.stop()


def _update(args) -> None:
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark import get_spark
    from feature_extractor_mbo_lob_spark.operators.similarity import ivf_assign

    spark = get_spark(app_name="fex-ann-update", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()
    idx = Path(args.index)
    manifest = json.loads((idx / "manifest.json").read_text())
    centroids = spark.read.parquet(str(idx / "centroids.parquet"))
    new = spark.read.parquet(args.input)
    # drop ids already in the store (idempotent re-run)
    store_ids = spark.read.parquet(str(idx / "vectors.parquet")).select("vec_id")
    new = new.join(store_ids, "vec_id", "left_anti")
    assigned = ivf_assign(new, centroids)
    n_new = assigned.count()
    (
        assigned.select("vec_id", "embedding", "centroid_id")
        .repartition("centroid_id")
        .write.mode("append")
        .partitionBy("centroid_id")
        .parquet(str(idx / "vectors.parquet"))
    )
    manifest["n_vectors"] = int(manifest["n_vectors"] + n_new)
    manifest["last_update_wall_sec"] = round(time.time() - t0, 2)
    (idx / "manifest.json").write_text(json.dumps(manifest))
    print(json.dumps({"mode": "update", "n_new": int(n_new),
                      "n_vectors": manifest["n_vectors"],
                      "wall_sec": manifest["last_update_wall_sec"]}))
    spark.stop()


def _query(args) -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark import get_spark
    from feature_extractor_mbo_lob_spark.operators.similarity import cosine

    spark = get_spark(app_name="fex-ann-query", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()
    idx = Path(args.index)
    manifest = json.loads((idx / "manifest.json").read_text())
    centroids = spark.read.parquet(str(idx / "centroids.parquet"))
    store = spark.read.parquet(str(idx / "vectors.parquet"))
    q = spark.read.parquet(args.queries)
    if args.limit:
        q = q.orderBy("vec_id").limit(args.limit)
    q = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv"))

    # route: nprobe nearest centroids per query via the broadcast K-row table
    routed = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("_cc", cosine(F.col("_qv"), F.col("_cv")))
        .withColumn(
            "_cr",
            F.row_number().over(
                Window.partitionBy("query_id")
                .orderBy(F.col("_cc").desc(), F.col("centroid_id"))
            ),
        )
        .filter(F.col("_cr") <= args.nprobe)
        .select("query_id", "_qv", "centroid_id")
    )
    # probe: equi-join on centroid_id -> Spark prunes unprobed partitions
    hits = (
        routed.join(store, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("_qv"), F.col("embedding")))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id")
                .orderBy(F.col("cos").desc(), F.col("vec_id"))
            ),
        )
        .filter(F.col("rank") <= args.topk)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
    )
    if args.out:
        hits.write.mode("overwrite").parquet(args.out)
        n_hits = spark.read.parquet(args.out).count()
    else:
        n_hits = hits.count()
    print(json.dumps({
        "mode": "query", "k": manifest["k"], "nprobe": args.nprobe,
        "topk": args.topk, "n_hits": int(n_hits),
        "wall_sec": round(time.time() - t0, 2),
        "output": args.out,
    }))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)
    b = sub.add_parser("build")
    b.add_argument("--input", required=True, help="dir containing embeddings.parquet")
    b.add_argument("--index", required=True)
    b.add_argument("--k", type=int, default=16)
    b.add_argument("--iters", type=int, default=2)
    b.add_argument("--master", default=None)
    u = sub.add_parser("update")
    u.add_argument("--index", required=True)
    u.add_argument("--input", required=True,
                   help="parquet with NEW (vec_id, embedding) rows; ids "
                        "already in the store are skipped (idempotent)")
    u.add_argument("--master", default=None)
    qp = sub.add_parser("query")
    qp.add_argument("--index", required=True)
    qp.add_argument("--queries", required=True, help="parquet with (vec_id, embedding)")
    qp.add_argument("--topk", type=int, default=5)
    qp.add_argument("--nprobe", type=int, default=1)
    qp.add_argument("--limit", type=int, default=None)
    qp.add_argument("--out", default=None)
    qp.add_argument("--master", default=None)
    args = ap.parse_args()
    {"build": _build, "update": _update, "query": _query}[args.mode](args)


if __name__ == "__main__":
    main()
