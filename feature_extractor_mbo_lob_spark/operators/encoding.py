"""Leakage-free categorical encodings — expanding (point-in-time) target and
frequency encoding.

`cumulative_target_encoding` gives, for every row, the mean of the target
over all STRICTLY EARLIER rows of the same category under a total time
order — the classic leakage-safe alternative to fit-time target encoding
(no row ever sees its own target or any future row's; the first occurrence
of a category gets NULL). This is the same point-in-time discipline as the
rest of the engine (north rule: "no feature reads rows with ts greater than
the anchor") applied across conversations instead of within one.

Exactness: the target is integerized at ``decimals`` (the corpus `value`
column is 2-decimal by construction, mirroring the integer-cent arithmetic
of the TPC-H Q1 query), so the expanding sums are order-independent bigint
sums and the single final division is bit-identical on any engine.

Scale design: the category is the partition key, and real corpora have hot
categories (a handful of tools dominate), so the naive single-window form
concentrates a hot category in one task — the same straggler shape as the
mega-conversation problem. `cumulative_target_encoding_chunked` is the
scale twin (tested bit-identical): it buckets time into fixed windows,
pre-aggregates per (category, bucket) — one map-side-combinable shuffle —
takes prefix sums over the tiny per-category bucket series, joins them back
(AQE-broadcastable), and only runs the row-level window WITHIN a
(category, bucket) partition, bounding every task by per-bucket volume.
This is `operators/skew.py`'s chunked carry-in pattern applied to the
category axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import ordering


def _int_target(target_col: str, decimals: int):
    scale = 10 ** decimals
    return F.round(F.col(target_col) * scale, 0).cast("long"), float(scale)


def cumulative_target_encoding(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    order_cols: tuple[str, ...],
    decimals: int = 2,
    out_prefix: str | None = None,
) -> DataFrame:
    """Expanding per-category mean of the target over strictly earlier rows.

    Adds ``{p}_rows_before`` (bigint; frequency encoding) and ``{p}_te``
    (double; NULL until the category has history). ``order_cols`` must be a
    total order (e.g. (ts, conv_id, turn_idx)) so the frame is deterministic.
    """
    p = out_prefix or cat_col
    it, scale = _int_target(target_col, decimals)
    w = (
        Window.partitionBy(cat_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.count(target_col).over(w)
    s = F.sum(it).over(w)
    return df.select(
        "*",
        n.cast("long").alias(f"{p}_rows_before"),
        F.when(n > 0, s.cast("double") / (scale * n)).alias(f"{p}_te"),
    )


def cumulative_target_encoding_chunked(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    order_cols: tuple[str, ...],
    ts_col: str = "ts",
    bucket_s: int = 86400,
    decimals: int = 2,
    out_prefix: str | None = None,
) -> DataFrame:
    """Scale twin of `cumulative_target_encoding`: identical output, but no
    task ever holds more than one (category, time-bucket) of rows."""
    p = out_prefix or cat_col
    it, scale = _int_target(target_col, decimals)
    bucket = F.floor(ordering.epoch_us(ts_col) / F.lit(int(bucket_s) * 1_000_000))

    rows = df.withColumn("_b", bucket).withColumn("_it", it)

    per_bucket = rows.groupBy(cat_col, "_b").agg(
        F.sum("_it").alias("_S"), F.count(target_col).alias("_N")
    )
    wb = (
        Window.partitionBy(cat_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = per_bucket.select(
        F.col(cat_col).alias("_cc"), F.col("_b").alias("_bb"),
        F.coalesce(F.sum("_S").over(wb), F.lit(0)).alias("_S0"),
        F.coalesce(F.sum("_N").over(wb), F.lit(0)).alias("_N0"),
    )

    wi = (
        Window.partitionBy(cat_col, "_b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        # eqNullSafe: a NULL category is a real group (window partitioning
        # groups NULLs together, so the join must too)
        rows.join(
            carry,
            rows[cat_col].eqNullSafe(carry["_cc"]) & (rows["_b"] == carry["_bb"]),
            "left",
        ).drop("_cc", "_bb")
        .withColumn("_n", (F.col("_N0") + F.count(target_col).over(wi)).cast("long"))
        .withColumn("_s", F.col("_S0") + F.coalesce(F.sum("_it").over(wi), F.lit(0)))
    )
    return out.select(
        *df.columns,
        F.col("_n").alias(f"{p}_rows_before"),
        F.when(F.col("_n") > 0, F.col("_s").cast("double") / (scale * F.col("_n")))
        .alias(f"{p}_te"),
    )


def loo_target_encoding(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    decimals: int = 2,
    out_prefix: str | None = None,
) -> DataFrame:
    """Leave-one-out target encoding: every row gets the mean of the
    target over ALL OTHER rows of its category, (S_cat − s_i)/(n_cat − 1)
    — the fit-time-encoding standard (category_encoders' LOO) that kills
    the self-leakage of naive mean encoding while, unlike the expanding
    cumulative_target_encoding, using the whole training fold (the right
    tool when rows are exchangeable rather than time-ordered; pair with
    group_hash_split so the fold boundary is leak-free).

    Exactness: the target integerizes at ``decimals`` (the same
    order-independent bigint sums as cumulative_target_encoding); the
    release divides the exact integers once per row, a fixed-order IEEE
    op. Singleton categories get NULL (no peer rows).

    Scale shape: ONE map-side-combinable groupBy(category) producing the
    (S, n) frame, joined back AQE-broadcastable on the category key —
    no window over raw rows at all, so hot categories cost nothing
    extra (the straggler-free twin of the chunked expanding form).

    Adds ``{p}_peers`` (bigint) and ``{p}_loo_te`` (double).
    """
    p = out_prefix or cat_col
    it, scale = _int_target(target_col, decimals)
    rows = df.withColumn("_it", it)
    per_cat = rows.groupBy(F.col(cat_col).alias("_cc")).agg(
        F.sum("_it").cast("long").alias("_S"),
        F.count(F.lit(1)).cast("long").alias("_N"),
    )
    out = rows.join(per_cat, rows[cat_col].eqNullSafe(per_cat["_cc"]), "left").drop(
        "_cc"
    )
    peers = (F.col("_N") - 1).cast("long")
    return out.select(
        *df.columns,
        peers.alias(f"{p}_peers"),
        F.when(
            peers > 0,
            (F.col("_S") - F.col("_it")).cast("double") / (scale * peers),
        ).alias(f"{p}_loo_te"),
    )
