"""CLI proof for jobs/search_corpus.py: the persisted ANN index round-trips
(build -> cluster-partitioned store + manifest -> query), and with
nprobe = k (probe everything) the hits EQUAL exact brute-force cosine
top-k — the index changes the access path, never the math."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _run(mode, extra):
    r = subprocess.run(
        [sys.executable, str(REPO / "jobs" / "search_corpus.py"), mode, *extra],
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    metrics = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    return json.loads(metrics[-1])


def test_ann_index_build_query_exact_at_full_probe(tmp_path):
    import duckdb

    idx = tmp_path / "idx"
    out = tmp_path / "hits"
    b = _run("build", ("--input", "/root/testdata/sf0.001",
                       "--index", str(idx), "--k", "4"))
    assert b["n_vectors"] == 500 and b["dim"] == 64
    assert (idx / "manifest.json").exists()
    parts = list((idx / "vectors.parquet").glob("centroid_id=*"))
    assert len(parts) == 4  # cluster-partitioned store (pruning unit)

    n_q, topk = 25, 3
    q = _run("query", ("--index", str(idx),
                       "--queries", "/root/testdata/sf0.001/embeddings.parquet",
                       "--topk", str(topk), "--nprobe", "4",
                       "--limit", str(n_q), "--out", str(out)))
    assert q["n_hits"] == n_q * topk

    con = duckdb.connect()
    rows = con.execute(
        "select vec_id, embedding from "
        "'/root/testdata/sf0.001/embeddings.parquet' order by vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    M = np.array([r[1] for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn[:n_q] @ Mn.T

    got = con.execute(
        f"select query_id, neighbor_id, rank from parquet_scan('{out}/*.parquet') "
        "order by query_id, rank"
    ).fetchall()
    by_q = {}
    for qid, nid, rank in got:
        by_q.setdefault(qid, []).append(nid)
    for i in range(n_q):
        qid = ids[i]
        s = S[i].copy()
        s[i] = -np.inf  # exclude self
        order = np.lexsort((ids, -s))  # cos desc, vec_id asc tiebreak
        expect = [int(ids[j]) for j in order[:topk]]
        assert by_q[qid] == expect, qid


def test_ann_index_incremental_update_idempotent(tmp_path):
    import duckdb

    con = duckdb.connect()
    half_a = tmp_path / "half_a.parquet"
    src = "'/root/testdata/sf0.001/embeddings.parquet'"
    con.execute(
        f"copy (select * from {src} where vec_id % 2 = 0) to '{half_a}' (format parquet)"
    )

    idx = tmp_path / "idx"
    b = _run("build", ("--input", str(half_a), "--index", str(idx), "--k", "4"))
    assert b["n_vectors"] == 250

    # update with the FULL file: the 250 already-present ids are skipped
    u = _run("update", ("--index", str(idx),
                        "--input", "/root/testdata/sf0.001/embeddings.parquet"))
    assert u["n_new"] == 250 and u["n_vectors"] == 500
    # second run is a no-op (idempotent)
    u2 = _run("update", ("--index", str(idx),
                         "--input", "/root/testdata/sf0.001/embeddings.parquet"))
    assert u2["n_new"] == 0 and u2["n_vectors"] == 500

    # full-probe query over the updated store = exact brute force over ALL
    out = tmp_path / "hits"
    n_q, topk = 10, 3
    q = _run("query", ("--index", str(idx),
                       "--queries", "/root/testdata/sf0.001/embeddings.parquet",
                       "--topk", str(topk), "--nprobe", "4",
                       "--limit", str(n_q), "--out", str(out)))
    assert q["n_hits"] == n_q * topk

    rows = con.execute(
        f"select vec_id, embedding from {src} order by vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    M = np.array([r[1] for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn[:n_q] @ Mn.T
    got = con.execute(
        f"select query_id, neighbor_id from parquet_scan('{out}/*.parquet') "
        "order by query_id, rank"
    ).fetchall()
    by_q = {}
    for qid, nid in got:
        by_q.setdefault(qid, []).append(nid)
    for i in range(n_q):
        s = S[i].copy()
        s[i] = -np.inf
        order = np.lexsort((ids, -s))
        assert by_q[ids[i]] == [int(ids[j]) for j in order[:topk]]
