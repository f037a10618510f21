"""Bucket-grid interval joins: point-in-interval and interval-overlap.

Open-source Spark has no range-join optimization — a raw
``a.start <= p.ts AND p.ts < a.end`` join plans as
BroadcastNestedLoopJoin (or worse, CartesianProduct), which is O(n*m)
compute regardless of selectivity and a non-starter at 100 TB. The
standard distributed fix (same idea as Databricks' range-join binning
and the grid join in spatial engines) is to quantize time into
fixed-width buckets, explode every interval into the buckets it
overlaps, and equi-join on the bucket id — Catalyst then runs a plain
shuffled hash/sort-merge join whose cost is O(points + intervals *
avg_span/bucket + matches), with full map-side partition pruning.

Exactness: bucketing only generates CANDIDATES; the precise predicate
(half-open ``start <= ts < end`` / ``l_start < r_end AND r_start <
l_end``) is re-applied after the equi-join, so results are identical to
the naive join (the DuckDB oracles run the naive form — DuckDB has a
native IEJoin, which is exactly the luxury Spark lacks).

Duplicate control is structural, not a distinct():
* a point lives in exactly ONE bucket -> point-in-interval emits each
  match once by construction;
* an overlapping interval pair is emitted only from its OWNER bucket,
  ``greatest(floor(l_start/b), floor(r_start/b))`` — that bucket is
  always inside both explosion ranges when the intervals truly overlap
  (r_start < l_end implies floor(r_start/b) <= floor((l_end-1)/b)), so
  each pair appears exactly once with zero dedup shuffle.

Choosing ``bucket_width``: explosion factor is ~avg_interval_span /
bucket_width; candidate fan-in per point is ~interval_density *
bucket_width. Pick the geometric middle of span and spacing. Skewed
giant intervals (one interval covering the whole timeline explodes into
the entire grid) should be routed to a broadcast side-table instead —
the same split-by-size routing used in operators/skew.py.

Reference parity: the reference's interval pairing is the sampler drain
loop (src/sampling/event_based.rs) — this generalizes it to arbitrary
interval tables, same candidates-then-exact-filter discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grid(start_col, end_col, bucket_width: int):
    """Bucket ids [floor(start/b) .. floor((end-1)/b)] for half-open
    [start, end). Caller must filter end > start first (empty intervals
    overlap nothing, and a descending F.sequence would be wrong)."""
    b = F.lit(int(bucket_width))
    return F.sequence(
        F.floor(start_col / b).cast("long"),
        F.floor((end_col - F.lit(1)) / b).cast("long"),
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts_us",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_width: int = 900_000_000,
) -> DataFrame:
    """All (point, interval) pairs with start <= point < end, as a plain
    equi-join on the grid bucket. Each point hashes to exactly one bucket,
    so every true pair is produced exactly once — no distinct needed.
    Column names must be disjoint between the two inputs."""
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_grid_bucket",
        F.explode(_grid(F.col(start_col), F.col(end_col), bucket_width)),
    )
    pt = points.withColumn(
        "_grid_bucket",
        F.floor(F.col(point_col) / F.lit(int(bucket_width))).cast("long"),
    )
    return (
        pt.join(iv, "_grid_bucket")
        .filter(
            (F.col(start_col) <= F.col(point_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_grid_bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str = "l_start_us",
    l_end: str = "l_end_us",
    r_start: str = "r_start_us",
    r_end: str = "r_end_us",
    bucket_width: int = 900_000_000,
) -> DataFrame:
    """All (left, right) interval pairs with l_start < r_end AND
    r_start < l_end (half-open overlap), each emitted exactly once via
    the owner-bucket rule. Column names must be disjoint."""
    b = int(bucket_width)
    lv = left.filter(F.col(l_end) > F.col(l_start)).withColumn(
        "_grid_bucket", F.explode(_grid(F.col(l_start), F.col(l_end), b))
    )
    rv = right.filter(F.col(r_end) > F.col(r_start)).withColumn(
        "_grid_bucket", F.explode(_grid(F.col(r_start), F.col(r_end), b))
    )
    owner = F.greatest(
        F.floor(F.col(l_start) / F.lit(b)).cast("long"),
        F.floor(F.col(r_start) / F.lit(b)).cast("long"),
    )
    return (
        lv.join(rv, "_grid_bucket")
        .filter(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            & (F.col("_grid_bucket") == owner)
        )
        .drop("_grid_bucket")
    )


def session_intervals(
    transcripts: DataFrame,
    gap_us: int,
    pad_us: int = 0,
) -> DataFrame:
    """Gap-based session intervals per conversation:
    (conv_id, session_id, start_us, end_us) with half-open
    end = last-turn ts + pad. One hash partition by conv_id, one
    window pass, one groupBy — the sessionize building block reused by
    the interval-join queries."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = transcripts.withColumn("_us", F.unix_micros("ts"))
    start = (
        F.when(F.col("_us") - F.lag("_us").over(w) > F.lit(int(gap_us)), 1)
        .otherwise(F.when(F.lag("_us").over(w).isNull(), 1).otherwise(0))
    )
    t = t.withColumn("_is_start", start).withColumn(
        "session_id", (F.sum("_is_start").over(cum) - F.lit(1)).cast("long")
    )
    return t.groupBy("conv_id", "session_id").agg(
        F.min("_us").alias("start_us"),
        (F.max("_us") + F.lit(int(pad_us))).alias("end_us"),
    )
