"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementations live in feature_extractor_mbo_lob_spark/plans/driver_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

_shipped_sessions: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make the engine importable on executor Python workers regardless of
    how the driver built its SparkSession: distribute dist/engine.zip via
    addPyFile (works on a live session; pandas-UDF closures pickle module
    references, so workers must import the package)."""
    key = id(spark.sparkContext)
    if key in _shipped_sessions:
        return
    zip_path = os.path.join(_REPO, "dist", "engine.zip")
    import subprocess

    def _stale() -> bool:
        if not os.path.exists(zip_path):
            return True
        zmt = os.path.getmtime(zip_path)
        pkg = os.path.join(_REPO, "feature_extractor_mbo_lob_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py") and os.path.getmtime(os.path.join(root, f)) > zmt:
                    return True
        return False

    if _stale():
        subprocess.run(
            [sys.executable, os.path.join(_REPO, "tools", "make_pyfiles.py")],
            check=True,
            capture_output=True,
        )
    spark.sparkContext.addPyFile(zip_path)
    _shipped_sessions.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full point-in-time feature
    frame + TLOB labels aligned on (conv_id, turn_idx)."""
    from feature_extractor_mbo_lob_spark.plans import flagship_pipeline
    from feature_extractor_mbo_lob_spark.plans.driver_queries import CFG
    from feature_extractor_mbo_lob_spark.sources import transcripts_from_events

    _ship_package(spark)
    t = transcripts_from_events(spark, "/root/testdata/sf0.001")
    return flagship_pipeline(t, CFG, price_col="value")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from feature_extractor_mbo_lob_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
