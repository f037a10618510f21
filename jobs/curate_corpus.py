#!/usr/bin/env python
"""Corpus-curation entrypoint — the LLM-training-data spark-submit path.

    spark-submit --master <cluster> --py-files dist/engine.zip \
        jobs/curate_corpus.py \
        --input /path/documents --output /path/curated \
        --near-dup --sample-frac 0.5 --budget 2048 --shards 256

Local smoke:

    python jobs/curate_corpus.py --input /root/testdata/sf0.001 \
        --output /tmp/curated --near-dup

Funnel: Gopher quality filter -> exact dedup (hash representatives) ->
optional MinHash-LSH near-dup clustering (keep cluster representative) ->
optional deterministic hash sampling -> token-stream packing -> partitioned
parquet by shard. Emits one JSON line with per-stage survivor counts so the
yield of every stage is observable (the curation dashboard row).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir containing documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--near-dup", nargs="?", const="minhash", default=None,
                    choices=["minhash", "winnow"],
                    help="also drop near-duplicates (keep cluster rep): "
                         "minhash = MinHash-LSH shingle similarity (default), "
                         "winnow = shared winnowing fingerprints (MOSS-style "
                         "local matches — catches long shared runs)")
    ap.add_argument("--soft-dedup", action="store_true",
                    help="with --near-dup: keep ALL cluster members and "
                         "attach weight_ppm = 1e6 div cluster size instead "
                         "of dropping (loss-weighting form of dedup)")
    ap.add_argument("--route-code", action="store_true",
                    help="drop code-detected documents from the prose "
                         "funnel (line/keyword/symbol heuristic gate)")
    ap.add_argument("--sample-frac", type=float, default=None)
    ap.add_argument("--redact-pii", action="store_true",
                    help="replace emails/IPs/phones with typed placeholders")
    ap.add_argument("--decontaminate", default=None, metavar="EVAL_PARQUET",
                    help="drop docs whose 3-shingle overlap with this eval set >= 0.03")
    ap.add_argument("--against", default=None, metavar="REF_PARQUET",
                    help="incremental ingest: drop docs that exactly match "
                         "(normalized md5) or share any MinHash band with "
                         "this EXISTING corpus (operators/dedup.dedup_against "
                         "— digest-keyed joins, the reference corpus is "
                         "never rescanned beyond its fingerprints)")
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--format", default="parquet", choices=["parquet", "jsonl"],
                    help="output format: parquet (analytics) or gzip JSONL (training ingest)")
    ap.add_argument("--resume", action="store_true",
                    help="skip output buckets whose lineage manifest matches config+input (parquet only)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark import get_spark
    from feature_extractor_mbo_lob_spark.batch import JobHandle
    from feature_extractor_mbo_lob_spark.functions import corpus, pii
    from feature_extractor_mbo_lob_spark.functions.repetition import gopher_filter
    from feature_extractor_mbo_lob_spark.operators import dedup

    spark = get_spark(app_name="fex-curate", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    handle = JobHandle(spark, "fex-curate", "corpus curation run")
    handle.activate()

    t0 = time.time()
    path = args.input
    if not path.endswith(".parquet"):
        path = f"{path}/documents.parquet"
    docs = spark.read.parquet(path)
    funnel = {"input": docs.count()}

    kept_ids = gopher_filter(docs).filter(F.col("keep") == 1).select(
        F.col("id").alias("doc_id")
    )
    docs = docs.join(kept_ids, "doc_id")
    funnel["after_quality_filter"] = docs.count()

    if args.route_code:
        from feature_extractor_mbo_lob_spark.functions.text import code_features

        prose_ids = code_features(docs).filter(~F.col("is_code")).select("doc_id")
        docs = docs.join(prose_ids, "doc_id")
        funnel["after_code_routing"] = docs.count()

    reps = (
        docs.groupBy(F.md5(dedup.normalize_text("text")).alias("_k"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs = docs.join(reps, "doc_id")
    funnel["after_exact_dedup"] = docs.count()

    if args.near_dup:
        if args.near_dup == "winnow":
            pairs = dedup.winnow_candidate_pairs(docs, k=3, w=4, min_shared=2)
        else:
            pairs = dedup.minhash_lsh_pairs(docs, k=3, num_hashes=16, bands=4)
        cc = dedup.connected_components(pairs).withColumnRenamed("id", "doc_id")
        if args.soft_dedup:
            # loss-weighting form: keep every member, a cluster contributes
            # one document's worth of gradient in total
            sizes = cc.groupBy("cluster_id").agg(
                F.count(F.lit(1)).cast("long").alias("_csize")
            )
            lbl = cc.join(sizes, "cluster_id").select("doc_id", "_csize")
            docs = docs.join(lbl, "doc_id", "left").withColumn(
                "weight_ppm",
                F.expr("1000000 div coalesce(_csize, 1)").cast("long"),
            ).drop("_csize")
            funnel["weighted_members"] = docs.filter(
                F.col("weight_ppm") < 1_000_000
            ).count()
        else:
            docs = (
                docs.join(cc, "doc_id", "left")  # AQE picks broadcast when small
                .filter(F.col("cluster_id").isNull() | (F.col("doc_id") == F.col("cluster_id")))
                .drop("cluster_id")
            )
            funnel["after_near_dedup"] = docs.count()

    if args.against:
        ref = spark.read.parquet(args.against)
        flags = dedup.dedup_against(docs, ref)
        dup_ids = flags.filter(
            F.col("exact_dup") | F.col("near_dup")
        ).select("doc_id")
        docs = docs.join(dup_ids, "doc_id", "left_anti")
        funnel["after_against_dedup"] = docs.count()

    if args.decontaminate:
        ev = spark.read.parquet(args.decontaminate)
        contaminated = (
            corpus.contamination_overlap(docs, ev, k=3, threshold=0.03)
            .filter(F.col("contaminated") == 1)
            .select(F.col("id").alias("doc_id"))
        )
        docs = docs.join(contaminated, "doc_id", "left_anti")
        funnel["after_decontamination"] = docs.count()

    if args.sample_frac is not None:
        docs = corpus.hash_sample(docs, args.sample_frac)
        funnel["after_sampling"] = docs.count()

    if args.redact_pii:
        docs = docs.withColumn("text", pii.redact("text"))

    packed = corpus.pack_token_stream(docs, budget=args.budget, n_shards=args.shards)
    out = docs.join(
        packed.select(F.col("id").alias("doc_id"), "shard", "offset", "bin_start"),
        "doc_id",
    )
    if args.format == "jsonl":
        from feature_extractor_mbo_lob_spark.export import export_jsonl_shards

        export_jsonl_shards(out, args.output, n_shards=args.shards)
    else:
        # lineage-manifest export keyed by doc_id: re-running with --resume
        # skips buckets whose manifest matches config + input + curation args
        import hashlib

        from feature_extractor_mbo_lob_spark import PipelineConfig
        from feature_extractor_mbo_lob_spark.export import (
            export_with_manifests,
            input_fingerprint_for_path,
        )

        ccfg = PipelineConfig(key_col="doc_id")
        arg_hash = hashlib.md5(json.dumps({
            "near_dup": args.near_dup, "sample_frac": args.sample_frac,
            "redact_pii": args.redact_pii, "decontaminate": args.decontaminate,
            "budget": args.budget, "shards": args.shards,
            "soft_dedup": args.soft_dedup, "route_code": args.route_code,
            "against": args.against,
        }, sort_keys=True).encode()).hexdigest()[:12]
        fp = input_fingerprint_for_path(spark, path) + ":" + arg_hash
        report = export_with_manifests(
            out.drop("shard"), ccfg, args.output, input_fingerprint=fp,
            n_buckets=args.shards, resume=args.resume,
        )
        funnel["written_buckets"] = len(report["written_buckets"])
        funnel["skipped_buckets"] = len(report["skipped_buckets"])
    funnel["packed_tokens"] = packed.agg(F.sum("n_tokens")).first()[0]

    wall = time.time() - t0
    print(json.dumps({**funnel, "wall_sec": round(wall, 2), "output": args.output}))
    spark.stop()


if __name__ == "__main__":
    main()
