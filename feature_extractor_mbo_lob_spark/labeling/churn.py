"""Entity-level churn labeling with a point-in-time feature/holdout split.

The turn-level labelers (tlob/deeplob/multi_horizon/triple_barrier) label
WITHIN an entity's timeline; this labels the ENTITY: did the user go
silent in the corpus's final K days? The leakage contract is the same
one the north rule demands at turn level, applied at user level — every
feature reads ONLY rows at or before the cutoff day, the label reads
ONLY rows after it, and the two windows partition the calendar exactly
(no row feeds both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def churn_labels(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    horizon_days: int = 7,
) -> DataFrame:
    """Per-user churn training set: cutoff = (corpus max day) -
    ``horizon_days``; features aggregate the user's rows with
    day <= cutoff, the label is 1 iff the user has ZERO rows after it.
    Users with no pre-cutoff activity are excluded (nothing to score —
    emitting them would be target leakage by construction, their only
    signal IS the holdout).

    Features, all exact integers: ``n_events_pre``, ``active_days_pre``
    (distinct calendar days), ``spend_cents_pre`` (exact cents over all
    pre rows), ``recency_days_pre`` (cutoff day - last pre day).

    Scale shape: one 1-row max broadcast + ONE map-side-combinable
    groupBy(user) with conditional aggregates — the pre/post split is a
    predicate inside the aggregate, not a second scan or a self-join.
    """
    d = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
    mx = events.agg(F.max(d).alias("_mx_d"))
    pre = F.col("_d") <= F.col("_cut")
    out = (
        events.select(
            F.col(user_col).alias("user_id"),
            d.alias("_d"),
            F.floor(F.col(value_col) * F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .alias("_cents"),
        )
        .crossJoin(F.broadcast(mx))
        .withColumn("_cut", F.col("_mx_d") - F.lit(int(horizon_days)))
        .groupBy("user_id")
        .agg(
            F.sum(pre.cast("long")).cast("long").alias("n_events_pre"),
            F.count_distinct(F.when(pre, F.col("_d"))).cast("long")
            .alias("active_days_pre"),
            F.coalesce(F.sum(F.when(pre, F.col("_cents"))), F.lit(0))
            .cast("long").alias("spend_cents_pre"),
            F.max(F.when(pre, F.col("_d"))).alias("_last_pre"),
            F.max("_cut").alias("_cut_max"),
            F.sum((~pre).cast("long")).cast("long").alias("_n_post"),
        )
        .filter(F.col("n_events_pre") > 0)
    )
    return out.select(
        "user_id",
        "n_events_pre",
        "active_days_pre",
        "spend_cents_pre",
        (F.col("_cut_max") - F.col("_last_pre")).cast("long")
        .alias("recency_days_pre"),
        (F.col("_n_post") == 0).cast("int").alias("churned"),
    )
