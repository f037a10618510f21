"""Rolling count-based window features (fast / medium / slow).

Transcript analog of the reference's three parallel ring-buffer windows with
O(1) incremental counters (reference: src/features/mbo_features/window.rs:18-213,
multi-timescale wiring src/features/mbo_features/mod.rs:115-125). Spark
recomputes aggregates per sliding frame, but vectorized and all frames share
one sort+shuffle because every spec uses the identical partition/order — the
idiomatic translation per SURVEY §2.3.

Float-parity choices (frozen in the contract):
* std is population std (reference: window.rs:190-213),
* skewness is the population moment form Σ((x-μ)/σ)³/n, 0 if n<3 or σ<1e-10
  (reference: src/features/mbo_features/size_features.rs:60-81),
* percentiles are exact interpolated (Spark `percentile` == DuckDB
  `quantile_cont`); the reference uses nearest-rank indexing — documented
  deviation, tolerance covered by golden fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..contract import DIVISION_GUARD_EPS, MIN_DURATION_S, MIN_STD
from . import ordering


def _duration_s(us: Column, frame) -> Column:
    """Frame duration in seconds floored at 1 ms (reference: window.rs:150-155)."""
    dur = (F.max(us).over(frame) - F.min(us).over(frame)) / F.lit(1e6)
    return F.greatest(dur, F.lit(MIN_DURATION_S))


def with_rolling_features(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Adds ROLLING_FEATURES with suffix _w{n} for every configured window.

    Requires ``char_len`` (added by state.with_state_features) and the raw
    role column. One extra per-row helper: ``role_flip`` (1.0 when role
    differs from the previous turn) — the OFI-style signed-transition analog.
    """
    w = ordering.stable_window(cfg)
    us = ordering.epoch_us(cfg.ts_col)

    prev_role = F.lag("role").over(w)
    df = df.withColumn(
        "role_flip",
        F.when(prev_role.isNull(), F.lit(0.0))
        .when(prev_role != F.col("role"), F.lit(1.0))
        .otherwise(F.lit(0.0)),
    )

    x = F.col("char_len")
    is_user = (F.col("role") == "user").cast("double")
    is_assistant = (F.col("role") == "assistant").cast("double")
    is_tool = (F.col("role") == "tool").cast("double")

    for n in cfg.window_sizes:
        fr = ordering.trailing(cfg, n)
        cnt = F.count(F.lit(1)).over(fr).cast("double")
        dur = _duration_s(us, fr)
        mean = F.avg(x).over(fr)
        # population variance via E[x^2]-E[x]^2 (guarded at 0)
        var = F.greatest(F.avg(x * x).over(fr) - mean * mean, F.lit(0.0))
        std = F.sqrt(var)
        m3 = F.avg(x * x * x).over(fr) - 3 * mean * F.avg(x * x).over(fr) + 2 * mean * mean * mean
        skew = F.when(
            (cnt < 3) | (std < F.lit(MIN_STD)), F.lit(0.0)
        ).otherwise(m3 / (std * std * std))
        sum_x = F.sum(x).over(fr)
        hhi = F.when(
            sum_x > 0, F.sum(x * x).over(fr) / (sum_x * sum_x)
        ).otherwise(F.lit(0.0))
        p = lambda q: F.percentile(x, F.lit(q)).over(fr)  # noqa: E731
        p90 = p(0.90)
        arr = F.collect_list(x).over(fr)
        large_ratio = (
            F.size(F.filter(arr, lambda e: e > p90)).cast("double") / cnt
        )

        sfx = f"_w{n}"
        df = (
            df.withColumn("turn_rate" + sfx, (cnt / dur).cast("double"))
            .withColumn("user_frac" + sfx, (F.sum(is_user).over(fr) / cnt).cast("double"))
            .withColumn("assistant_frac" + sfx, (F.sum(is_assistant).over(fr) / cnt).cast("double"))
            .withColumn("tool_rate" + sfx, (F.sum(is_tool).over(fr) / dur).cast("double"))
            .withColumn("role_flip_rate" + sfx, (F.sum("role_flip").over(fr) / cnt).cast("double"))
            .withColumn("char_mean" + sfx, mean.cast("double"))
            .withColumn("char_std" + sfx, std.cast("double"))
            .withColumn(
                "char_zscore" + sfx,
                ((x - mean) / (std + F.lit(DIVISION_GUARD_EPS))).cast("double"),
            )
            .withColumn("char_p25" + sfx, p(0.25).cast("double"))
            .withColumn("char_p50" + sfx, p(0.50).cast("double"))
            .withColumn("char_p75" + sfx, p(0.75).cast("double"))
            .withColumn("char_p90" + sfx, p90.cast("double"))
            .withColumn("char_skew" + sfx, skew.cast("double"))
            .withColumn("char_hhi" + sfx, hhi.cast("double"))
            .withColumn("large_turn_ratio" + sfx, large_ratio.cast("double"))
        )
    return df
