#!/usr/bin/env python
"""Training-set construction entrypoint — transcripts -> SFT + DPO datasets.

    spark-submit --master <cluster> --py-files dist/engine.zip \
        jobs/build_training_sets.py \
        --input /path/events_dir --output /tmp/trainsets \
        --fork-depth 2 --max-flag-rate 0.5

Local smoke:

    python jobs/build_training_sets.py --input /root/testdata/sf0.001 \
        --output /tmp/trainsets

Funnel over the transcript corpus:

1. prefix-fork dedup (operators/forks.fork_dedup_keep): branched rollouts
   sharing a ``--fork-depth`` turn prefix keep one representative;
2. refusal filter (functions/text.flag_rates): conversations whose flagged
   turn rate exceeds ``--max-flag-rate`` are dropped whole (a refusal-heavy
   rollout teaches refusals);
3. SFT pairs (functions/corpus.sft_pairs): point-in-time (context, response)
   rows, group-hash split train/val/test (conversation-atomic — no
   conversation straddles splits), written per-split with per-bucket
   lineage manifests (resume skips clean buckets);
4. DPO pairs (operators/forks.dpo_pairs): chosen-vs-sibling preference rows
   from the fork groups of the ORIGINAL corpus (forks are the DPO signal,
   so pairing runs pre-dedup), written alongside.

Prints one JSON line with per-stage survivor counts.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFUSAL_PATTERNS = ("error", "cancel")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir containing events.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--fork-depth", type=int, default=2)
    ap.add_argument("--max-flag-rate", type=float, default=0.5)
    ap.add_argument("--min-context-turns", type=int, default=1)
    ap.add_argument("--dpo-depth", type=int, default=1)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark import PipelineConfig, get_spark
    from feature_extractor_mbo_lob_spark.batch import JobHandle, group_hash_split
    from feature_extractor_mbo_lob_spark.export import (
        export_with_manifests,
        input_fingerprint_for_path,
    )
    from feature_extractor_mbo_lob_spark.functions import corpus, text as tx
    from feature_extractor_mbo_lob_spark.operators import forks
    from feature_extractor_mbo_lob_spark.sources import transcripts_from_events

    spark = get_spark(app_name="fex-trainsets", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    handle = JobHandle(spark, "fex-trainsets", "SFT/DPO training-set build")
    handle.activate()

    cfg = PipelineConfig()
    t0 = time.time()
    # the funnel triggers several actions (counts + two sinks); persist the
    # transcript mapping and each filtered stage so the scan/sort chains run
    # once, not once per counter
    t = transcripts_from_events(spark, args.input).persist()
    funnel = {"input_turns": t.count(),
              "input_convs": t.select("conv_id").distinct().count()}

    # DPO pairs come from the PRE-dedup corpus: the forks ARE the signal.
    dpo = forks.dpo_pairs(t, cfg, depth=args.dpo_depth)
    dpo.write.mode("overwrite").parquet(f"{args.output}/dpo_pairs.parquet")
    funnel["dpo_pairs"] = spark.read.parquet(
        f"{args.output}/dpo_pairs.parquet"
    ).count()

    # 1. fork dedup (keep one rollout per shared prefix)
    keep = forks.fork_dedup_keep(t, cfg, depth=args.fork_depth)
    t = t.join(keep.filter(F.col("keep")).select("conv_id"), "conv_id").persist()
    funnel["convs_after_fork_dedup"] = t.select("conv_id").distinct().count()

    # 2. refusal-rate filter (drop refusal-heavy conversations whole)
    rates = tx.flag_rates(t, REFUSAL_PATTERNS)
    ok = rates.filter(F.col("flag_rate") <= args.max_flag_rate).select("conv_id")
    t = t.join(ok, "conv_id").persist()
    funnel["convs_after_refusal_filter"] = t.select("conv_id").distinct().count()

    # 3. SFT pairs + conversation-atomic split + manifest export
    pairs = corpus.sft_pairs(t, min_context_turns=args.min_context_turns)
    pairs = group_hash_split(pairs, cfg)  # cfg.key_col = conv_id
    funnel["sft_pairs"] = pairs.count()
    funnel["sft_split"] = {
        r["split"]: r["n"]
        for r in pairs.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    ccfg = PipelineConfig(key_col="pair_id")
    arg_hash = hashlib.md5(json.dumps({
        "fork_depth": args.fork_depth, "max_flag_rate": args.max_flag_rate,
        "min_context_turns": args.min_context_turns, "shards": args.shards,
    }, sort_keys=True).encode()).hexdigest()[:12]
    fp = (
        input_fingerprint_for_path(spark, f"{args.input}/events.parquet")
        + ":" + arg_hash
    )
    report = export_with_manifests(
        pairs, ccfg, f"{args.output}/sft_pairs", input_fingerprint=fp,
        n_buckets=args.shards, resume=args.resume,
    )
    funnel["written_buckets"] = len(report["written_buckets"])
    funnel["skipped_buckets"] = len(report["skipped_buckets"])

    wall = time.time() - t0
    print(json.dumps({**funnel, "wall_sec": round(wall, 2), "output": args.output}))
    spark.stop()


if __name__ == "__main__":
    main()
