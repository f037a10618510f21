#!/usr/bin/env python
"""Scaling-efficiency evidence run (BASELINE.md contract).

The north rule's criterion — >=0.8 throughput scaling efficiency from N to
4N executors — cannot use a real cluster in this sandbox, so this runs the
IDENTICAL flagship job on the same input at two parallelism levels
(default local[2] vs local[8], i.e. N=2, 4N=8) and reports throughput at
both plus efficiency = (T_N / T_4N) / 4.

The corpus is sized so executor compute dominates driver overhead (Amdahl):
a ~6M-turn deterministic synthetic transcript table (seed 42). Each level
runs in a FRESH interpreter/JVM (subprocess) with one warm-up execution
(JIT/codegen) and the minimum of `--repeats` measured fresh executions.

Writes results to stdout as JSON; paste into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from feature_extractor_mbo_lob_spark import get_spark
from feature_extractor_mbo_lob_spark.plans import flagship_pipeline
from feature_extractor_mbo_lob_spark.plans.vectorized import vectorized_flagship
from feature_extractor_mbo_lob_spark.plans.driver_queries import CFG
from feature_extractor_mbo_lob_spark.sources import read_transcripts

cores = {cores}
import os
os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
spark = get_spark(app_name=f"scale{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=2 * cores,
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-tmp"}})
spark.sparkContext.setLogLevel("ERROR")
n = read_transcripts(spark, {corpus!r}).count()
# pre-warm the OS page cache for the corpus: parquet count() satisfies from
# footers only, so a dropped cache leaves the DATA pages cold and the
# high-parallelism leg becomes IO-bound — measured 15-20s vs 11s at 8
# cores after a cache drop, which reads as a false scaling failure. The
# bench measures compute scaling (bench.py does the same pre-warm).
import os as _os
for _root, _dirs, _files in _os.walk({corpus!r}):
    for _f in _files:
        with open(_os.path.join(_root, _f), "rb") as _fh:
            while _fh.read(1 << 24):
                pass
results = {{}}
for name, builder in (("vectorized", vectorized_flagship),
                      ("declarative", flagship_pipeline)):
    times = []
    for i in range({repeats} + 1):
        t = read_transcripts(spark, {corpus!r})
        df = builder(t, CFG, price_col="char_len")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    results[name] = {{"sec": round(min(times[1:]), 2),
                      "all_sec": [round(x, 2) for x in times]}}
best = results["vectorized"]["sec"]
print("RESULT " + json.dumps({{"cores": cores, "sec": best,
      "paths": results, "turns": n,
      "turns_per_sec": round(n / best, 1)}}))
spark.stop()
"""


def run_level(cores: int, corpus: str, repeats: int) -> dict:
    code = RUNNER.format(repo=str(REPO), cores=cores, corpus=corpus, repeats=repeats)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                         timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-cores", type=int, default=2)
    ap.add_argument("--turns", type=int, default=6_000_000)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    n, n4 = args.n_cores, 4 * args.n_cores

    corpus = f"/tmp/bench_transcripts_scaling_{args.turns}.parquet"
    if not Path(corpus).exists():
        sys.path.insert(0, str(REPO))
        from feature_extractor_mbo_lob_spark import get_spark
        from feature_extractor_mbo_lob_spark.sources import synth_transcripts

        spark = get_spark(app_name="gen", master="local[32]", shuffle_partitions=64)
        spark.sparkContext.setLogLevel("ERROR")
        df = synth_transcripts(
            spark, n_convs=args.turns // 35, min_turns=5, max_turns=64, seed=42,
            n_mega_convs=2, mega_turns=args.turns // 100,
        )
        df.repartition(128, "conv_id").write.mode("overwrite").parquet(corpus)
        spark.stop()

    lo = run_level(n, corpus, args.repeats)
    hi = run_level(n4, corpus, args.repeats)
    eff = (lo["sec"] / hi["sec"]) / 4.0
    eff_decl = (lo["paths"]["declarative"]["sec"] / hi["paths"]["declarative"]["sec"]) / 4.0
    print(json.dumps({
        "scaling": {"N_cores": n, "4N_cores": n4,
                    "T_N_sec": lo["sec"], "T_4N_sec": hi["sec"],
                    "turns": lo["turns"],
                    "throughput_N": lo["turns_per_sec"],
                    "throughput_4N": hi["turns_per_sec"],
                    "efficiency": round(eff, 3), "target": 0.8,
                    "pass": eff >= 0.8,
                    "efficiency_declarative_path": round(eff_decl, 3)},
        "raw": [lo, hi],
    }))


if __name__ == "__main__":
    main()
