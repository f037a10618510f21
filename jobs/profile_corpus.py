#!/usr/bin/env python
"""One-command corpus data-quality report — the pre-flight a training run
gates on before touching a new crawl/source drop.

    spark-submit --master <cluster> --py-files dist/engine.zip \
        jobs/profile_corpus.py --input /path/to/sf_dir --out /path/report.json

Local smoke:

    python jobs/profile_corpus.py --input /root/testdata/sf0.001 \
        --out /tmp/corpus_report.json

Sections (each a driver-side dict assembled from TINY aggregates — every
heavy computation stays distributed; the report is the only collect):

* volume        — docs, chars, per-source / per-lang mixes
* duplication   — exact-dup group count + surplus copies, duplicate-line
                  fraction (C4-style)
* quality       — Gopher-filter pass rate, mean word count (exact
                  integers)
* embeddings    — the embedding_audit gate row (dims / NaN / zero-norm /
                  norm percentiles), joined on vec_id = doc_id
* drift         — max pairwise per-source centroid d2 (micro^2) — the
                  "one of these sources is not like the others" flag

Exit code 0 and a single JSON document at --out; also printed to stdout
as one line (driver-parsable, same contract as the other jobs).
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
    ap.add_argument("--input", required=True, help="dir containing documents.parquet (+ embeddings.parquet)")
    ap.add_argument("--out", required=True, help="path for the JSON report")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark import get_spark
    from feature_extractor_mbo_lob_spark.functions.repetition import (
        gopher_filter,
        normalized_words,
    )
    from feature_extractor_mbo_lob_spark.operators import dedup
    from feature_extractor_mbo_lob_spark.operators.similarity import (
        source_centroid_drift,
    )

    t0 = time.time()
    spark = get_spark(app_name="profile-corpus", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    report: dict = {"input": args.input}

    vol = docs.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.length("text")).alias("chars"),
        F.countDistinct("source").alias("sources"),
        F.countDistinct("lang").alias("langs"),
    ).first()
    report["volume"] = {
        k: int(vol[k] or 0) for k in ("docs", "chars", "sources", "langs")
    }
    report["volume"]["by_source"] = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    report["volume"]["by_lang"] = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    groups = dedup.exact_dedup(docs)
    dup = groups.agg(
        F.count(F.lit(1)).alias("distinct_texts"),
        F.sum(F.col("n_copies") - 1).alias("surplus_copies"),
        F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0)).alias("dup_groups"),
    ).first()
    report["duplication"] = {
        "distinct_texts": int(dup["distinct_texts"]),
        "surplus_copies": int(dup["surplus_copies"]),
        "dup_groups": int(dup["dup_groups"]),
        "surplus_ppm": int(dup["surplus_copies"]) * 1_000_000
        // max(report["volume"]["docs"], 1),
    }

    q = gopher_filter(docs).agg(
        F.sum("keep").alias("n_pass"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    words = docs.agg(
        F.sum(F.size(normalized_words("text"))).alias("w")
    ).first()["w"]
    report["quality"] = {
        "gopher_pass": int(q["n_pass"]),
        "gopher_pass_ppm": int(q["n_pass"]) * 1_000_000 // max(int(q["n"]), 1),
        "total_words": int(words),
    }

    emb_path = Path(args.input) / "embeddings.parquet"
    if emb_path.exists():
        emb = spark.read.parquet(str(emb_path))
        audit = emb.agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.countDistinct(F.size("embedding")).alias("n_dims"),
        ).first()
        report["embeddings"] = {
            "n_vectors": int(audit["n_vectors"]),
            "n_dims": int(audit["n_dims"]),
        }
        drift = source_centroid_drift(emb, docs).agg(
            F.max("centroid_d2_micro2").alias("max_d2"),
            F.min("centroid_d2_micro2").alias("min_d2"),
        ).first()
        # single-source corpora have no cross-group pairs -> NULL aggregates
        report["drift"] = {
            "max_source_centroid_d2_micro2":
                None if drift["max_d2"] is None else int(drift["max_d2"]),
            "min_source_centroid_d2_micro2":
                None if drift["min_d2"] is None else int(drift["min_d2"]),
        }

    report["wall_sec"] = round(time.time() - t0, 2)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1, sort_keys=True) + "\n")
    print(json.dumps(report, separators=(",", ":"), sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
