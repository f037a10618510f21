#!/usr/bin/env python
"""Package the engine for spark-submit --py-files: dist/engine.zip."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "feature_extractor_mbo_lob_spark"
OUT = REPO / "dist" / "engine.zip"


def main() -> None:
    OUT.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(PKG.rglob("*.py")):
            if "__pycache__" in p.parts:
                continue
            z.write(p, p.relative_to(REPO))
    print(OUT)


if __name__ == "__main__":
    main()
