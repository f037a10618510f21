#!/usr/bin/env python
"""Extra benchmarks for optimization work (bench.py is frozen for measurement).

Times individual registry queries in isolation with the noop sink, exactly
like bench.py does (same session config, same clearCache+GC discipline),
min-of-N per query, and can dump `.explain("formatted")` plans.

Usage:
    python bench_extra.py q1 q2 ...            # time the named queries
    python bench_extra.py --plans r06_before q1 ...   # also dump plans/<tag>/<q>.txt
    python bench_extra.py --all                # whole registry (marathon)
    python bench_extra.py --window             # first-50 certified window
    python bench_extra.py --headline           # vectorized flagship only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dump explain() to plans/<tag>/<q>.txt")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--window", action="store_true")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from feature_extractor_mbo_lob_spark import get_spark
    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    spark = get_spark(
        app_name="bench-extra",
        master=f"local[{args.cores}]",
        shuffle_partitions=2 * args.cores,
        extra_conf={"spark.local.dir": "/dev/shm/spark-tmp"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    names = list(args.names)
    if args.all:
        names = list(QUERIES)
    elif args.window:
        names = list(QUERIES)[:50]

    out: dict[str, float] = {}

    if args.headline or not names:
        from feature_extractor_mbo_lob_spark.plans.driver_queries import CFG
        from feature_extractor_mbo_lob_spark.plans.vectorized import vectorized_flagship
        from feature_extractor_mbo_lob_spark.sources import read_transcripts
        import bench as _bench

        sf = _bench.sf_label(args.sf_dir)
        turns_target = int(6_000_000 * sf) if sf > 0 else 600_000
        tpath = _bench.ensure_transcripts(spark, args.sf_dir, turns_target)
        runs = []
        for _ in range(max(args.reps + 2, 5)):
            fresh = read_transcripts(spark, tpath)
            t0 = time.time()
            noop(vectorized_flagship(fresh, CFG, price_col="char_len"))
            runs.append(round(time.time() - t0, 3))
        out["_headline"] = min(runs[2:])
        print(f"headline: {min(runs[2:])}  runs={runs}", flush=True)
        if args.plans:
            pdir = Path(__file__).parent / "plans" / args.plans
            pdir.mkdir(parents=True, exist_ok=True)
            fresh = read_transcripts(spark, tpath)
            df = vectorized_flagship(fresh, CFG, price_col="char_len")
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            (pdir / "_headline.txt").write_text(txt)
    for name in names:
        fn = QUERIES[name]
        if args.plans:
            pdir = Path(__file__).parent / "plans" / args.plans
            pdir.mkdir(parents=True, exist_ok=True)
            df = fn(spark, args.sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            (pdir / f"{name}.txt").write_text(txt)
        times = []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            noop(fn(spark, args.sf_dir))
            times.append(round(time.time() - t0, 3))
        out[name] = min(times)
        print(f"{name}: min={min(times)}  {times}", flush=True)

    if args.json_out:
        Path(args.json_out).write_text(json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
