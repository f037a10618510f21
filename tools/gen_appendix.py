#!/usr/bin/env python
"""Mechanically regenerate COVERAGE.md's registry appendix (VERDICT r4 #6).

The appendix listing the full driver-query registry drifted from the
runtime registry twice (440 vs 441 in round 4's README, 441 vs 442 in its
COVERAGE.md) because it was maintained by hand. This script derives it
from the imported registry itself — the same object the driver certifies —
so the count can never lie again. It also verifies (not generates) the
pre-registered next-round certification window section: every name listed
there must exist in the registry and must not already be driver-certified.

Usage: python tools/gen_appendix.py [--check]
  --check  exit 1 if COVERAGE.md's appendix differs from the regenerated
           text (CI/pre-commit mode, no write)
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

APPENDIX_RE = re.compile(
    r"^## Appendix: full driver-query registry.*$", re.M
)


def render_appendix(names: list[str], n_oracles: int) -> str:
    header = (
        f"## Appendix: full driver-query registry ({len(names)} queries, "
        f"{'all' if n_oracles == len(names) else n_oracles} with DuckDB oracles)"
    )
    lines = [header, ""]
    snames = sorted(names)
    for i in range(0, len(snames), 5):
        lines.append(" · ".join(f"`{n}`" for n in snames[i : i + 5]))
        lines.append("")
    return "\n".join(lines).rstrip() + "\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    from feature_extractor_mbo_lob_spark.plans.driver_queries import (
        ORACLES,
        QUERIES,
    )

    cov_path = REPO / "COVERAGE.md"
    text = cov_path.read_text()
    m = APPENDIX_RE.search(text)
    if not m:
        sys.exit("COVERAGE.md has no appendix header to replace")
    new_tail = render_appendix(list(QUERIES), len(ORACLES))
    new_text = text[: m.start()] + new_tail

    if args.check:
        if new_text != text:
            sys.exit(
                "COVERAGE.md appendix is stale — run python tools/gen_appendix.py"
            )
        print(f"appendix in sync: {len(QUERIES)} queries, {len(ORACLES)} oracles")
        return

    cov_path.write_text(new_text)
    print(
        f"regenerated appendix: {len(QUERIES)} queries, {len(ORACLES)} oracles"
    )


if __name__ == "__main__":
    main()
