"""As-of joins and fill imputation — the engine's flagship join primitives.

The reference has exactly two joins (sequence<->label equi join at
src/export_aligned/alignment.rs:136-173 and the interval/as-of bucket
assignment at src/pipeline.rs:671-705). The target engine generalizes them
to a point-in-time as-of join keyed on (conv_id, ts) against label/event
timelines (BASELINE north_star).

Implementation: the union-tag trick — stitch both sides into one stream,
sort by (key, ts, side), and propagate the right side's last value with
last(..., ignoreNulls=True) over the cumulative frame. This is a SINGLE
shuffle on the key (a range-partitioned sort-merge in physical terms) and
never builds a per-row probe structure, so it scales to 10^12 rows: both
sides shuffle once on conv_id, sort once, stream once.

Forward-fill / backfill imputation (north_rule) is the same primitive over
one table: last-value-ignoring-nulls over the cumulative frame (ffill) or
first-value over the forward frame (bfill).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from . import ordering


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
    tolerance_s: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row's values at the greatest
    right.ts <= left.ts (direction='backward', inclusive) or the smallest
    right.ts >= left.ts ('forward'), per key.

    Equivalent to DuckDB/pandas ASOF JOIN. Left rows keep all their columns;
    matched values arrive as {col}{suffix} (NULL when no match exists yet).

    ``tolerance_s`` (pandas ``merge_asof(tolerance=...)`` parity): when set,
    a match further than this many seconds from the left row's ts is
    discarded — values become NULL, exactly as pandas does. Implemented by
    also propagating the matched right ts through the same window and
    gating the outputs afterwards, so the plan stays one shuffle + one sort
    (no second join, no extra exchange).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, ts)]

    # tag: right rows must sort BEFORE left rows at equal ts for backward
    # (inclusive match), AFTER for forward
    l_tag, r_tag = (1, 0) if direction == "backward" else (0, 1)

    lhs = left.withColumn("_side", F.lit(l_tag))
    for c in value_cols:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        F.col(key),
        F.col(ts),
        F.lit(r_tag).alias("_side"),
        *[F.col(c) for c in value_cols],
    )
    left_cols = [c for c in lhs.columns if c not in ("_side",) and c not in value_cols]
    for c in left_cols:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))

    u = lhs.select(*left_cols, "_side", *value_cols).unionByName(
        rhs.select(*left_cols, "_side", *value_cols)
    )

    if direction == "backward":
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last
    elif direction == "forward":
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).asc(), F.col("_side").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first
    else:
        raise ValueError(f"unknown direction {direction}")

    if tolerance_s is not None:
        # carry the matched right ts alongside the values (right rows only)
        u = u.withColumn("_rts", F.when(F.col("_side") == r_tag, F.col(ts)))

    for c in value_cols:
        u = u.withColumn(c + suffix, pick(c, ignorenulls=True).over(w))

    if tolerance_s is not None:
        mts = pick("_rts", ignorenulls=True).over(w)
        l_us, r_us = ordering.epoch_us(ts), ordering.epoch_us(mts)
        delta = (l_us - r_us) if direction == "backward" else (r_us - l_us)
        ok = delta <= F.lit(int(tolerance_s * 1_000_000))
        for c in value_cols:
            u = u.withColumn(c + suffix, F.when(ok, F.col(c + suffix)))
        u = u.drop("_rts")

    return u.filter(F.col("_side") == l_tag).drop("_side", *value_cols)


def ffill(df: DataFrame, cfg: PipelineConfig, cols: list[str],
          out_suffix: str = "_ffill") -> DataFrame:
    """Forward-fill: last non-null value at or before the current turn."""
    w = ordering.cumulative(cfg)
    for c in cols:
        df = df.withColumn(c + out_suffix, F.last(c, ignorenulls=True).over(w))
    return df


def bfill(df: DataFrame, cfg: PipelineConfig, cols: list[str],
          out_suffix: str = "_bfill") -> DataFrame:
    """Backfill: first non-null value at or after the current turn.

    NOTE: reads forward rows — label-side only, never a feature (temporal
    leakage contract)."""
    w = ordering.stable_window(cfg).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    for c in cols:
        df = df.withColumn(c + out_suffix, F.first(c, ignorenulls=True).over(w))
    return df
