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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full point-in-time feature
    frame + TLOB labels aligned on (conv_id, turn_idx)."""
    from feature_extractor_mbo_lob_spark.plans import flagship_pipeline
    from feature_extractor_mbo_lob_spark.plans.driver_queries import CFG
    from feature_extractor_mbo_lob_spark.sources import transcripts_from_events

    t = transcripts_from_events(spark, "/root/testdata/sf0.001")
    return flagship_pipeline(t, CFG, price_col="value")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from feature_extractor_mbo_lob_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
