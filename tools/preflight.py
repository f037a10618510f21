#!/usr/bin/env python
"""Round-close preflight — the end-of-round snapshot commit is allowed
ONLY after this exits 0 (the VERDICT r4 #2 process rule: round 4 shipped
its final commit without re-running the suite and landed a one-line plan
-lint failure).

Runs, in order (fail-fast):
  1. registry/appendix sync        (tools/gen_appendix.py --check)
  2. certified-window oracle gate  (tools/check_oracle.py over the first
                                    50 registry entries at sf0.01 — the
                                    exact set the external gate certifies)
  3. full pytest suite             (python -m pytest tests/ -q)

Usage: python tools/preflight.py [--skip-suite]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run(title: str, cmd: list[str]) -> None:
    print(f"== {title}: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        sys.exit(f"preflight FAILED at: {title}")
    print(f"== {title}: OK", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-suite", action="store_true",
                    help="skip step 3 (full pytest) — for mid-round runs only")
    args = ap.parse_args()

    run("appendix sync", [sys.executable, "tools/gen_appendix.py", "--check"])

    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    window = list(QUERIES)[:50]
    run("certified-window oracle gate",
        [sys.executable, "tools/check_oracle.py", *window])

    if not args.skip_suite:
        run("full pytest suite",
            [sys.executable, "-m", "pytest", "tests/", "-q"])
    print("preflight PASSED")


if __name__ == "__main__":
    main()
