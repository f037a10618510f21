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
    right.ts <= left.ts (direction='backward', inclusive), the smallest
    right.ts >= left.ts ('forward'), or whichever of the two is closer in
    time ('nearest', backward wins exact-distance ties like pandas), per key.

    Equivalent to DuckDB/pandas ASOF JOIN. Left rows keep all their columns;
    matched values arrive as {col}{suffix} (NULL when no match exists yet).

    ``tolerance_s`` (pandas ``merge_asof(tolerance=...)`` parity): when set,
    a match further than this many seconds from the left row's ts is
    discarded — values become NULL, exactly as pandas does. Implemented by
    also propagating the matched right ts through the same window and
    gating the outputs afterwards, so the plan stays one shuffle + one sort
    (no second join, no extra exchange). 'nearest' likewise: both frame
    directions run over the SAME sorted partition, so it is still a single
    shuffle.

    Determinism note: results are deterministic when the right side is
    unique per (key, ts) — with exact duplicates the within-peer pick is
    sort-tie dependent (pandas has the same caveat via input order).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, ts)]

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction}")

    # tag: right rows must sort BEFORE left rows at equal ts for backward
    # (inclusive match), AFTER for forward. 'nearest' uses backward tags:
    # an equal-ts right row lands in the backward frame with distance 0,
    # which beats any forward candidate, so the forward frame never needs
    # to see it.
    l_tag, r_tag = (1, 0) if direction in ("backward", "nearest") else (0, 1)

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

    ordered = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col("_side").asc())
    cum = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    need_rts = tolerance_s is not None or direction == "nearest"
    if need_rts:
        # carry the matched right ts alongside the values (right rows only)
        u = u.withColumn("_rts", F.when(F.col("_side") == r_tag, F.col(ts)))

    tol_us = None if tolerance_s is None else F.lit(int(tolerance_s * 1_000_000))

    if direction == "nearest":
        l_us = ordering.epoch_us(ts)
        b_us = ordering.epoch_us(F.last("_rts", ignorenulls=True).over(cum))
        f_us = ordering.epoch_us(F.first("_rts", ignorenulls=True).over(fwd))
        bd, fd = l_us - b_us, f_us - l_us
        use_b = f_us.isNull() | (b_us.isNotNull() & (bd <= fd))
        for c in value_cols:
            bv = F.last(c, ignorenulls=True).over(cum)
            fv = F.first(c, ignorenulls=True).over(fwd)
            u = u.withColumn(c + suffix, F.when(use_b, bv).otherwise(fv))
        if tol_us is not None:
            ok = F.when(use_b, bd).otherwise(fd) <= tol_us
            for c in value_cols:
                u = u.withColumn(c + suffix, F.when(ok, F.col(c + suffix)))
    else:
        w, pick = (cum, F.last) if direction == "backward" else (fwd, F.first)
        for c in value_cols:
            u = u.withColumn(c + suffix, pick(c, ignorenulls=True).over(w))
        if tol_us is not None:
            mts = pick("_rts", ignorenulls=True).over(w)
            l_us, r_us = ordering.epoch_us(ts), ordering.epoch_us(mts)
            delta = (l_us - r_us) if direction == "backward" else (r_us - l_us)
            ok = delta <= tol_us
            for c in value_cols:
                u = u.withColumn(c + suffix, F.when(ok, F.col(c + suffix)))

    if need_rts:
        u = u.drop("_rts")
    return u.filter(F.col("_side") == l_tag).drop("_side", *value_cols)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str] | None = None,
    bucket_span_s: float = 86_400.0,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join for SKEWED keys — the north star's
    "range-partitioned shuffle for the as-of merge".

    `asof_join` windows over partitionBy(key): one key with a 10^9-row
    timeline becomes ONE task (the straggler AQE cannot split a Window
    exec). Here the timeline is split into fixed wall-clock buckets and the
    shuffle key becomes (key, bucket) — every task is bounded by one
    bucket's rows. Exactness is restored with carry-in, the same
    construction as operators/skew.py:

    1. a tiny per-(key, bucket) table takes each value column's right-side
       value at its max event time within the bucket (`max_by`, null-aware),
       over the bucket universe of BOTH sides;
    2. an exclusive prefix (last-ignoring-nulls over earlier buckets) turns
       it into the carry-in — "the last right value strictly before this
       bucket";
    3. the union-tag stream windows over (key, bucket) and coalesces with
       the broadcast carry.

    Output is EXACTLY asof_join(direction='backward') (unit-tested;
    driver-certified: asof_join_range shares asof_join's oracle). Same
    determinism caveat for duplicate right (key, ts) rows.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, ts)]
    span_us = int(bucket_span_s * 1_000_000)
    us = ordering.epoch_us(ts)
    bk = F.floor(us / F.lit(span_us)).cast("long")

    lhs = left.withColumn("_side", F.lit(1))
    for c in value_cols:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_side"),
        *[F.col(c) for c in value_cols],
    )
    left_cols = [c for c in lhs.columns if c not in ("_side",) and c not in value_cols]
    for c in left_cols:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))
    u = lhs.select(*left_cols, "_side", *value_cols).unionByName(
        rhs.select(*left_cols, "_side", *value_cols)
    ).withColumn("_bk", bk)

    # 1. per-(key, bucket) last right values, over BOTH sides' bucket
    #    universe (a left-only bucket still needs a carry row)
    buckets = u.select(key, "_bk").distinct()
    partials = (
        u.filter(F.col("_side") == 0)
        .groupBy(key, "_bk")
        .agg(*[
            F.max_by(c, F.when(F.col(c).isNotNull(), us)).alias(c)
            for c in value_cols
        ])
    )
    grid = buckets.join(partials, on=[key, "_bk"], how="left")
    # 2. exclusive prefix over buckets -> carry-in (tiny table: one row per
    #    (key, bucket) pair, NOT per event)
    wprev = (
        Window.partitionBy(key).orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = grid.select(
        key, "_bk",
        *[F.last(c, ignorenulls=True).over(wprev).alias(f"_cin_{c}")
          for c in value_cols],
    )

    # 3. bounded windows on the salted (key, bucket) shuffle key
    out = u.join(F.broadcast(carries), on=[key, "_bk"], how="left")
    wbk = (
        Window.partitionBy(key, "_bk")
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        out = out.withColumn(
            c + suffix,
            F.coalesce(F.last(c, ignorenulls=True).over(wbk), F.col(f"_cin_{c}")),
        )
    return (
        out.filter(F.col("_side") == 1)
        .drop("_side", "_bk", *value_cols, *[f"_cin_{c}" for c in value_cols])
    )


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


def scd2_enrich(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    attr_cols: list[str] | None = None,
    suffix: str = "_dim",
) -> DataFrame:
    """Point-in-time enrichment against a slowly-changing dimension
    (SCD type 2): each fact row gets the dimension version whose
    ``[valid_from, valid_to)`` interval contains its timestamp — the
    feature-store join that guarantees zero temporal leakage (a fact can
    never see a dimension version that starts after it).

    Built ON the as-of machinery: backward as-of on valid_from (greatest
    version start <= fact ts), then a null-out gate for facts past the
    matched version's valid_to (a retired key). ONE shuffle + ONE sort,
    same as asof_join — never the ts-range theta-join a naive
    ``BETWEEN`` predicate would plan (a theta join at 10^12 facts is a
    cartesian blow-up; this stays merge-shaped). Current versions use an
    open valid_to (NULL = +inf).

    Reference analog: alignment of snapshots to the day's instrument
    metadata (src/export_aligned); standard Kimball SCD2 semantics.
    """
    attrs = attr_cols or [
        c for c in dim.columns if c not in (key, valid_from, valid_to)
    ]
    # Open-ended current versions carry valid_to = NULL; the as-of value
    # propagation is last-IGNORING-nulls, which would skip that NULL and
    # surface the PREVIOUS version's end instead — so encode open-ended as
    # a far-future sentinel before the merge.
    far_future = F.lit("9999-01-01").cast("timestamp")
    right = dim.select(
        F.col(key),
        F.col(valid_from).alias(ts),
        F.coalesce(F.col(valid_to), far_future).alias("_vt"),
        *[F.col(c) for c in attrs],
    )
    out = asof_join(
        facts, right, key=key, ts=ts,
        value_cols=attrs + ["_vt"], direction="backward", suffix=suffix,
    )
    vt = F.col(f"_vt{suffix}")
    in_window = F.col(ts) < vt
    cleaned = [
        F.when(in_window, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
        for c in attrs
    ]
    keep = [c for c in out.columns if not c.startswith("_vt") and not c.endswith(suffix)]
    return out.select(*keep, *cleaned)


def pit_training_set(
    spine: DataFrame,
    timelines: list[tuple[DataFrame, float | None]],
    key: str = "conv_id",
    ts: str = "ts",
) -> DataFrame:
    """Feature-store historical retrieval (Feast ``get_historical_features``
    shape): a label/anchor SPINE of (key, ts, ...) rows is enriched from K
    independent feature TIMELINES, each by a point-in-time backward as-of
    join with its own staleness TTL (``tolerance_s``) — a feature older
    than its TTL at the anchor instant surfaces as NULL, exactly the
    online-store expiry semantics.

    ``timelines`` is a list of ``(timeline_df, tolerance_s)``; each
    timeline carries (key, ts, <feature cols>) and its feature columns
    keep their names on the output spine. Temporal-leakage contract: only
    rows with timeline.ts <= spine.ts can ever contribute (inclusive
    boundary, the asof_join backward rule).

    Scale shape: K independent union-tag merges, each ONE shuffle + ONE
    sort on the same key — no per-row probe structures, no theta joins.
    At 10^12 anchors prefer ordering timelines widest-first so the spine
    grows its nullable columns before the narrow merges; for skewed keys
    swap the inner call to asof_join_bucketed (identical semantics).

    Timelines should be unique per (key, ts) — pre-aggregate upstream —
    the standard as-of determinism caveat.
    """
    out = spine
    for tdf, tol in timelines:
        vals = [c for c in tdf.columns if c not in (key, ts)]
        out = asof_join(
            out, tdf, key=key, ts=ts, value_cols=vals,
            direction="backward", suffix="__pit", tolerance_s=tol,
        )
        keep = [c for c in out.columns if not c.endswith("__pit")]
        out = out.select(
            *keep, *[F.col(c + "__pit").alias(c) for c in vals]
        )
    return out
