#!/usr/bin/env python
"""One-command A/B experiment readout — every estimator the engine's
experimentation family offers, over one events table, in one spark-submit.

    spark-submit --master <cluster> --py-files dist/engine.zip \
        jobs/experiment_report.py --input /path/to/sf_dir \
        --out /path/report.json

Local smoke:

    python jobs/experiment_report.py --input /root/testdata/sf0.001 \
        --out /tmp/experiment_report.json

Sections (each distributed to a tiny aggregate; the report is the only
collect — the same contract as jobs/profile_corpus.py):

* srm          — sample-ratio-mismatch gate (arm counts + integer chi2
                 pieces). If this fails, nothing below is trustworthy.
* ztest        — fixed-horizon two-proportion z over exact cells
* sprt         — Wald sequential decision per arm (h1/h0/continue)
* cuped        — variance-reduced effect (pre-period covariate)
* mann_whitney — nonparametric rank-sum evidence (doubled-midrank ints)
* qte          — where in the distribution the effect lives (p25/50/75)
* strata       — per-week cells + Simpson's-paradox flags
* post_strat   — bias-corrected overall effect in int64 micro-units
* mcnemar      — within-user pre/post flips across the midpoint split

The conversion predicate is purchase with value > --conv-value (the same
definition the registry queries certify against their DuckDB oracles).
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
    ap.add_argument("--input", required=True, help="dir containing events.parquet")
    ap.add_argument("--out", required=True, help="path for the JSON report")
    ap.add_argument("--conv-value", type=float, default=150.0)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark import get_spark
    from feature_extractor_mbo_lob_spark.functions.stats import (
        ab_proportions_ztest,
        ab_sprt,
        cuped_adjusted_effect,
        mann_whitney_u,
        mcnemar_paired,
        post_stratified_effect,
        quantile_treatment_effects,
        srm_check,
        stratified_ab_audit,
    )

    t0 = time.time()
    spark = get_spark(app_name="experiment-report", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{args.input}/events.parquet")
    conv = (F.col("event_type") == "purchase") & (F.col("value") > args.conv_value)
    report: dict = {"input": args.input, "conv_value": args.conv_value}

    srm = {r.arm: r.asDict() for r in srm_check(ev, "user_id").collect()}
    chi2 = sum(r["chi2_num_term"] for r in srm.values()) / srm[0]["chi2_den"]
    report["srm"] = {
        "arms": {str(a): r["n_units"] for a, r in srm.items()},
        "chi2": round(chi2, 6),
        "pass": chi2 < 10.83,  # alpha = 0.001, df = 1
    }

    z = ab_proportions_ztest(ev, "user_id", conv).collect()[0].asDict()
    report["ztest"] = {k: (round(v, 6) if isinstance(v, float) else v)
                       for k, v in z.items()}

    report["sprt"] = {
        str(r.arm): {"decision": r.decision, "n_at_decision": r.n_at_decision}
        for r in ab_sprt(ev, "user_id", conv).collect()
    }

    c = cuped_adjusted_effect(ev, "user_id").collect()[0]
    report["cuped"] = {
        "theta": round(c.theta, 6),
        "effect_raw_cents": round(c.effect_raw_cents, 6),
        "effect_cuped_cents": round(c.effect_cuped_cents, 6),
    }

    mw = mann_whitney_u(ev, "user_id").collect()[0]
    report["mann_whitney"] = {
        "n_a": mw.n_a, "n_b": mw.n_b, "u2_a": mw.u2_a, "tie_term": mw.tie_term,
    }

    q = quantile_treatment_effects(ev, "user_id").collect()[0]
    report["qte"] = {k: getattr(q, k) for k in ("qte25", "qte50", "qte75")}

    ew = ev.withColumn("wk", F.expr("(dayofmonth(ts) - 1) div 7").cast("int"))
    strata = stratified_ab_audit(ew, "user_id", "wk", conv).collect()
    report["strata"] = {
        "n_strata": len(strata),
        "simpson_reversals": sorted(int(r.stratum) for r in strata if r.simpson_flag),
    }

    ps = post_stratified_effect(ew, "user_id", "wk", conv).collect()[0]
    report["post_strat"] = {
        "effect_micro_rate": (
            round(ps.effect_num_micro / (1_000_000 * ps.n_units_used), 9)
            if ps.n_units_used else None
        ),
        "n_units_used": ps.n_units_used,
    }

    mc = mcnemar_paired(ev, "user_id", conv).collect()[0]
    report["mcnemar"] = {
        "n01": mc.n01, "n10": mc.n10,
        "chi2": round(mc.chi2_num / mc.chi2_den, 6) if mc.chi2_den else None,
    }

    report["wall_sec"] = round(time.time() - t0, 3)
    out = Path(args.out)
    out.write_text(json.dumps(report, indent=2, sort_keys=True))
    print(json.dumps(report, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
