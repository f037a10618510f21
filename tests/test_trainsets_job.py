"""CLI proof for jobs/build_training_sets.py: the SFT/DPO funnel runs end
to end, the split is conversation-atomic, and manifest resume skips clean
buckets on the second run."""

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
            str(REPO / "jobs" / "build_training_sets.py"),
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


def test_build_training_sets_funnel_and_resume(tmp_path):
    out = tmp_path / "trainsets"
    first = _run(out)
    assert first["input_turns"] == 1000 and first["input_convs"] == 15
    assert first["sft_pairs"] > 0
    assert set(first["sft_split"]) <= {"train", "val", "test"}
    assert sum(first["sft_split"].values()) == first["sft_pairs"]
    assert first["written_buckets"] == 4 and first["skipped_buckets"] == 0
    assert (out / "dpo_pairs.parquet").exists()

    second = _run(out, extra=("--resume",))
    assert second["written_buckets"] == 0 and second["skipped_buckets"] == 4
    assert second["sft_pairs"] == first["sft_pairs"]
