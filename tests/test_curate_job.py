"""CLI proof for jobs/curate_corpus.py's soft-dedup and code-routing
modes: keep-all weighting attaches weight_ppm = 1e6 div cluster size
(cluster mass sums to ~one document), and --route-code drops
code-detected documents from the prose funnel."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(out_dir, extra=()):
    r = subprocess.run(
        [
            sys.executable,
            str(REPO / "jobs" / "curate_corpus.py"),
            "--input", "/root/testdata/sf0.001",
            "--output", str(out_dir),
            "--shards", "4",
            *extra,
        ],
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    metrics = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    return json.loads(metrics[-1])


def test_curate_soft_dedup_weights(tmp_path):
    out = tmp_path / "soft"
    m = _run(out, ("--near-dup", "--soft-dedup", "--route-code"))
    assert m["after_quality_filter"] <= m["input"]
    assert m["after_code_routing"] <= m["after_quality_filter"]
    # soft mode never drops rows after exact dedup
    assert "after_near_dedup" not in m
    assert m["weighted_members"] > 0

    import duckdb

    con = duckdb.connect()
    w = con.execute(
        f"select min(weight_ppm), max(weight_ppm), "
        f"count(*) filter (weight_ppm < 1000000) "
        f"from parquet_scan('{out}/**/*.parquet', hive_partitioning=true)"
    ).fetchone()
    assert 0 < w[0] <= 1_000_000 and w[1] == 1_000_000
    assert w[2] == m["weighted_members"]


def test_curate_hard_dedup_still_drops(tmp_path):
    out = tmp_path / "hard"
    m = _run(out, ("--near-dup",))
    assert m["after_near_dedup"] <= m["after_exact_dedup"]
    assert "weighted_members" not in m


def test_curate_against_existing_corpus(tmp_path):
    import duckdb

    con = duckdb.connect()
    # reference corpus = half of the docs -> every surviving doc in the
    # funnel that exactly matches a ref doc must be dropped
    ref = tmp_path / "ref.parquet"
    con.execute(
        f"copy (select * from '/root/testdata/sf0.001/documents.parquet' "
        f"where doc_id % 2 = 0) to '{ref}' (format parquet)"
    )
    out = tmp_path / "inc"
    m = _run(out, ("--against", str(ref)))
    assert "after_against_dedup" in m
    assert m["after_against_dedup"] < m["after_exact_dedup"]

    # no survivor may exactly match the reference (normalized md5)
    surv = con.execute(
        f"""select count(*) from parquet_scan('{out}/**/*.parquet', hive_partitioning=true) s
        join parquet_scan('{ref}') r
          on md5(regexp_replace(lower(trim(s.text)), '\\s+', ' ', 'g'))
           = md5(regexp_replace(lower(trim(r.text)), '\\s+', ' ', 'g'))"""
    ).fetchone()[0]
    assert surv == 0
