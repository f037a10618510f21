#!/usr/bin/env python
"""Streaming feature-extraction entrypoint — the spark-submit path for the
stateful streaming side of the engine, with an EXACTLY-ONCE parquet sink
and checkpoint resume:

    spark-submit --master <cluster> --py-files dist/engine.zip \
        jobs/stream_features.py \
        --input /path/transcript_parquet_dir \
        --output /path/stream_out --checkpoint /path/ckpt

Behavior:
  * the input dir is consumed as a file stream (availableNow: drain all
    files present, then stop — the replayable batch-of-streams form);
  * per-conversation cumulative state runs in applyInPandasWithState
    (streaming/stream.streaming_cumulative_state — counters + exact
    volume sampling, cross-batch state carry);
  * the sink is streaming/sink.idempotent_parquet_sink: each micro-batch
    lands under batch_id=N/ with a commit marker written LAST, so a
    crash-replayed batch is skipped — exactly-once on top of Spark's
    at-least-once foreachBatch contract;
  * re-running with the same --checkpoint and no new input files commits
    NOTHING new (the JSON line reports new_batches = 0) — this is the
    checkpoint-resume proof, driven end to end from the CLI.

Emits one JSON line: rows drained this run, cumulative output rows,
batches committed before/after.
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
    ap.add_argument("--input", required=True,
                    help="dir of transcript parquet files (file-stream source)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from feature_extractor_mbo_lob_spark import PipelineConfig, get_spark
    from feature_extractor_mbo_lob_spark.sources import TRANSCRIPT_SCHEMA
    from feature_extractor_mbo_lob_spark.streaming.sink import (
        idempotent_parquet_sink,
    )
    from feature_extractor_mbo_lob_spark.streaming.stream import (
        streaming_cumulative_state,
    )

    spark = get_spark(app_name="fex-stream", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    cfg = PipelineConfig()
    t0 = time.time()

    commits = Path(args.output) / "_commits"
    before = {p.name for p in commits.glob("*")} if commits.exists() else set()

    src = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(args.input)
    out = streaming_cumulative_state(src, cfg)
    q = (
        idempotent_parquet_sink(out, args.output, args.checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    after = {p.name for p in commits.glob("*")} if commits.exists() else set()
    new_batches = sorted(after - before, key=int)
    out_rows = 0
    for b in after:
        part = Path(args.output) / f"batch_id={b}"
        if part.exists():
            out_rows += spark.read.parquet(str(part)).count()
    print(json.dumps({
        "new_batches": len(new_batches),
        "total_batches": len(after),
        "total_output_rows": int(out_rows),
        "wall_sec": round(time.time() - t0, 2),
        "output": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
