"""CLI proof for jobs/stream_features.py: availableNow drain through the
stateful cumulative operator, exactly-once batch commits, checkpoint
resume (re-run = 0 new batches; new files = only the delta, with
cross-run state carry visible in turns_so_far)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _write_part(con, path, lo, hi):
    con.execute(f"""copy (
      select 'c' || (i % 3) as conv_id, (i // 3)::int as turn_idx,
             'user'::varchar as role, 'msg ' || i as text,
             null::varchar as tool,
             timestamp '2024-01-01' + interval (i) second as ts
      from (select unnest(range({lo}, {hi})) as i)
    ) to '{path}' (format parquet)""")


def _run(inp, out, ckpt):
    r = subprocess.run(
        [sys.executable, str(REPO / "jobs" / "stream_features.py"),
         "--input", str(inp), "--output", str(out), "--checkpoint", str(ckpt)],
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    metrics = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    return json.loads(metrics[-1])


def test_stream_job_exactly_once_and_resume(tmp_path):
    import duckdb

    con = duckdb.connect()
    inp = tmp_path / "in"
    inp.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _write_part(con, inp / "p1.parquet", 0, 90)

    m1 = _run(inp, out, ckpt)
    assert m1["new_batches"] == 1 and m1["total_output_rows"] == 90

    # resume with nothing new: zero commits
    m2 = _run(inp, out, ckpt)
    assert m2["new_batches"] == 0 and m2["total_output_rows"] == 90

    # append a file: only the delta is processed, state carries across runs
    _write_part(con, inp / "p2.parquet", 90, 120)
    m3 = _run(inp, out, ckpt)
    assert m3["new_batches"] == 1 and m3["total_output_rows"] == 120

    got = con.execute(
        f"select max(turns_so_far) from parquet_scan('{out}/batch_id=*/*.parquet')"
    ).fetchone()[0]
    # 120 turns over 3 convs -> the deepest counter saw all 40 of its turns,
    # which is only possible if run-2's state resumed from run-1's checkpoint
    assert got == 40
