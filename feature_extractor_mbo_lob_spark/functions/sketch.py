"""Bounded-memory frequency sketches: count-min with md5 row hashes.

Why CMS here: exact per-key counts shuffle O(distinct keys) — fine for
vocabularies, fatal for unbounded key spaces (URLs, n-grams, user ids) at
100 TB. A count-min sketch is a FIXED d x w grid of counters regardless of
cardinality: after the per-partition partial aggregation each task emits at
most d*w rows, so the shuffle is O(partitions * d * w) — independent of
both row count and key cardinality. Estimates are biased high only
(est >= true, within eps*N with probability 1-delta for w=ceil(e/eps),
d=ceil(ln 1/delta)).

Determinism: the row hash is md5(seed || '|' || key) -> first 7 hex chars
as an integer mod w — the same keyed-hash-as-permutation trick the MinHash
family uses (operators/dedup.py), chosen so any engine with md5 reproduces
the sketch bit-for-bit (the DuckDB oracle rebuilds identical cells).

Reference analog: the reference keeps fixed-size per-symbol frequency
tallies in its export manifest (tools/export_dataset.rs); CMS is the
cardinality-unbounded generalization a web corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cms_bucket(col, seed: int, width: int) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}|"), c)), 1, 7), 16, 10
        ).cast("long")
        % width
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: one row per non-empty cell, ``(row_idx, col_idx,
    cnt)``. Each input row scatters into ``depth`` cells (a per-row array
    explode — narrow), then ONE groupBy over at most depth*width keys with
    map-side combine: the shuffle is sketch-sized, not data-sized."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row_idx"),
                        _cms_bucket(key_col, r, width).alias("col_idx"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
        w.alias("_w"),
    )
    return (
        cells.groupBy(F.col("c.row_idx").alias("row_idx"), F.col("c.col_idx").alias("col_idx"))
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each row of ``keys``: estimate =
    min over rows r of cell(r, h_r(key)). The sketch is at most
    depth*width rows, so it is broadcast — the lookup join never
    shuffles the key side."""
    melted = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row_idx"),
                        _cms_bucket(key_col, r, width).alias("col_idx"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.row_idx", "c.col_idx")
    return (
        melted.join(F.broadcast(sketch), ["row_idx", "col_idx"])
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("est_cnt"))
    )


def linear_counting(
    df: DataFrame,
    key_col: str = "key",
    m: int = 4096,
) -> DataFrame:
    """Linear probabilistic counting (Whang et al. 1990): hash every key
    into an m-slot bitmap; the distinct-count estimate is
    ``-m * ln(empty_slots / m)``. One groupBy over at most m occupied
    slots (map-side combine -> shuffle is O(partitions * m), independent
    of cardinality), then a single-row aggregate.

    Returns ONE row ``(m, occupied, empty)`` — all integers, so the
    result is engine-exact; callers (or SQL consumers) apply the log
    formula. Accurate while distinct << m; for unbounded cardinalities
    chain sketches or use HLL (Spark's approx_count_distinct — not
    oracle-reproducible, hence this deterministic form for the gate).
    """
    occ = (
        df.select(_cms_bucket(key_col, 0, m).alias("slot"))
        .groupBy("slot")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return occ.agg(
        F.lit(m).cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("occupied"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("empty"),
    )
