"""North-rule launch-path proof: the engine runs via REAL `spark-submit
--py-files dist/engine.zip`, with the job script copied OUTSIDE the repo so
every import must resolve from the shipped zip (the copied script's own
repo-relative sys.path insert points at a directory that does not exist).
Also proves manifest resume end-to-end: the second run skips all buckets.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = Path("/opt/spark/bin/spark-submit")


@pytest.mark.skipif(not SPARK_SUBMIT.exists(), reason="spark-submit not installed")
def test_spark_submit_pyfiles_roundtrip(tmp_path):
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    zip_path = REPO / "dist" / "engine.zip"
    assert zip_path.exists()

    job = tmp_path / "run_pipeline_copy.py"
    shutil.copy(REPO / "jobs" / "run_pipeline.py", job)
    out_dir = tmp_path / "features"

    def submit():
        r = subprocess.run(
            [
                str(SPARK_SUBMIT),
                "--master", "local[4]",
                "--py-files", str(zip_path),
                "--conf", "spark.sql.adaptive.enabled=true",
                "--conf", "spark.sql.shuffle.partitions=8",
                str(job),
                "--input", "/root/testdata/sf0.001",
                "--input-format", "events",
                "--output", str(out_dir),
                "--buckets", "2",
                "--resume",
            ],
            cwd=tmp_path, capture_output=True, text=True, timeout=420,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        metrics = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        return json.loads(metrics[-1])

    first = submit()
    assert first["rows_out"] == 1000
    assert first["written_buckets"] == 2 and first["skipped_buckets"] == 0
    assert any(out_dir.rglob("*.parquet"))

    # resume: manifests match config + input fingerprint -> nothing recomputed
    second = submit()
    assert second["written_buckets"] == 0 and second["skipped_buckets"] == 2
