"""Volatility estimators + adaptive sampling thresholds.

Reference: VolatilityEstimator (src/preprocessing/volatility.rs:181-248 —
rolling log-return sample std with a min-std floor), the experimental
volatility computer (src/features/experimental/volatility.rs:40-50, 245-300 —
fast/slow vol, ratio, momentum, return autocorrelation) and the adaptive
threshold sampler (src/preprocessing/adaptive_sampling.rs:315-420 — baseline
vol = median of the calibration prefix, threshold = base * clamp(vol/baseline,
0.2, 5.0)).

All native window algebra: log-returns via lag, stds over trailing frames,
autocorrelation via windowed corr of (r, lag(r)); the two-pass calibration is
a per-key prefix aggregate broadcast back (no sequential state needed because
the baseline is a pure function of the first K samples).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..contract import DIVISION_GUARD_EPS, FLOAT_CMP_EPS, MIN_STD
from . import ordering


def with_log_returns(df: DataFrame, cfg: PipelineConfig, price_col: str,
                     out: str = "log_ret") -> DataFrame:
    w = ordering.stable_window(cfg)
    prev = F.lag(price_col).over(w)
    return df.withColumn(
        out,
        F.when(
            prev.isNotNull() & (prev > 0) & (F.col(price_col) > 0),
            F.log(F.col(price_col) / prev),
        ).otherwise(F.lit(0.0)).cast("double"),
    )


def with_volatility(df: DataFrame, cfg: PipelineConfig, price_col: str = "value",
                    fast: int = 8, slow: int = 32, min_periods: int = 3) -> DataFrame:
    """Adds log_ret, vol_fast, vol_slow (sample std over trailing frames with
    the reference's min-std floor), vol_ratio, ret_autocorr_fast."""
    df = with_log_returns(df, cfg, price_col)
    w = ordering.stable_window(cfg)
    r = F.col("log_ret")
    r1 = F.lag("log_ret").over(w)
    df = df.withColumn("_r1", r1)

    out_cols = []
    for name, n in (("vol_fast", fast), ("vol_slow", slow)):
        fr = ordering.trailing(cfg, n)
        cnt = F.count(r).over(fr)
        std = F.stddev_samp(r).over(fr)  # sample std (reference: volatility.rs:236-248)
        out_cols.append(
            F.when(cnt >= min_periods, F.greatest(std, F.lit(MIN_STD)))
            .otherwise(F.lit(0.0)).cast("double").alias(name)
        )
    fr_fast = ordering.trailing(cfg, fast)
    autocorr = F.corr(r, F.col("_r1")).over(fr_fast)
    out_cols.append(F.coalesce(autocorr, F.lit(0.0)).cast("double").alias("ret_autocorr_fast"))

    df = df.select("*", *out_cols).drop("_r1")
    df = df.withColumn(
        "vol_ratio",
        (F.col("vol_fast") / (F.col("vol_slow") + F.lit(DIVISION_GUARD_EPS))).cast("double"),
    )

    # vol momentum: relative change of fast vol vs `momentum_lag` rows ago
    # (reference: prev vs current snapshot fast vol,
    # src/features/experimental/volatility.rs:265-270); 0 until warm
    momentum_lag = 10
    prev_vol = F.lag("vol_fast", momentum_lag).over(w)
    df = df.withColumn(
        "vol_momentum",
        F.when(
            prev_vol.isNotNull() & (prev_vol > F.lit(FLOAT_CMP_EPS)),
            (F.col("vol_fast") - prev_vol) / prev_vol,
        ).otherwise(F.lit(0.0)).cast("double"),
    )
    # vol of vol: sample std of the fast-vol history over a trailing frame
    # (reference: vol_history.std(), volatility.rs:276-278)
    vol_hist = 32
    fr_hist = ordering.trailing(cfg, vol_hist)
    return df.withColumn(
        "vol_of_vol",
        F.coalesce(F.stddev_samp("vol_fast").over(fr_hist), F.lit(0.0)).cast("double"),
    )


def with_adaptive_threshold(
    df: DataFrame,
    cfg: PipelineConfig,
    vol_col: str = "vol_fast",
    base_threshold: float | None = None,
    calibration_rows: int = 32,
    lo: float = 0.2,
    hi: float = 5.0,
) -> DataFrame:
    """Two-pass adaptive sampler threshold: per-key baseline = median vol of
    the first `calibration_rows` rows (pass 1, tiny aggregate broadcast
    back), then threshold = base * clamp(vol/baseline, lo, hi) (pass 2)."""
    base = cfg.volume_target if base_threshold is None else base_threshold
    w = ordering.stable_window(cfg)
    with_rn = df.withColumn("_rn", F.row_number().over(w))
    baseline = (
        with_rn.filter(F.col("_rn") <= calibration_rows)
        .groupBy(cfg.key_col)
        .agg(F.percentile(vol_col, F.lit(0.5)).alias("_baseline_vol"))
    )
    out = with_rn.join(F.broadcast(baseline), on=cfg.key_col, how="left")
    scale = F.col(vol_col) / (F.col("_baseline_vol") + F.lit(DIVISION_GUARD_EPS))
    clamped = F.least(F.greatest(scale, F.lit(lo)), F.lit(hi))
    return out.withColumn(
        "adaptive_threshold",
        F.when(F.col("_baseline_vol").isNotNull() & (F.col("_baseline_vol") > 0),
               F.lit(base) * clamped)
        .otherwise(F.lit(base)).cast("double"),
    ).drop("_rn", "_baseline_vol")


def role_transition_matrix(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Per-conversation from-role -> to-role transition counts and rates —
    the transcript analog of multi-level OFI (signed per-level flow deltas,
    reference src/features/order_flow.rs ~430-700): the full flow field
    instead of one net number."""
    w = ordering.stable_window(cfg)
    pairs = df.select(
        F.col(cfg.key_col),
        F.lag("role").over(w).alias("from_role"),
        F.col("role").alias("to_role"),
    ).filter(F.col("from_role").isNotNull())
    counts = pairs.groupBy(cfg.key_col, "from_role", "to_role").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy(cfg.key_col).agg(F.sum("n").alias("_total"))
    return (
        counts.join(totals, on=cfg.key_col)
        .withColumn("rate", (F.col("n") / F.col("_total")).cast("double"))
        .drop("_total")
    )


def tool_usage_hhi(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Per-conversation tool-usage concentration (HHI over tool call counts)
    — analog of the institutional clustering HHI (reference:
    src/features/experimental/institutional_v2.rs:336-430)."""
    counts = (
        df.filter(F.col("tool").isNotNull())
        .groupBy(cfg.key_col, "tool")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.groupBy(cfg.key_col).agg(
        (F.sum(F.col("n") * F.col("n")) / (F.sum("n") * F.sum("n")))
        .cast("double")
        .alias("tool_hhi"),
        F.count(F.lit(1)).alias("n_tools"),
        F.sum("n").alias("n_tool_calls"),
    )


def with_institutional_rates(
    df: DataFrame, cfg: PipelineConfig, window: int = 32, large_chars: int = 16
) -> DataFrame:
    """Institutional-detection analogs of reference features 74-75
    (src/features/mbo_features/institutional_features.rs:30-52):

    * ``large_turn_freq_per_s`` — large turns (char_len >= large_chars) per
      second over the rolling frame (large_order_frequency analog);
    * ``large_turn_imbalance`` — (user - assistant) large-turn char volume
      over their sum within the frame (large_order_imbalance analog, with
      user/assistant standing in for bid/ask).

    One rolling frame over the canonical window spec — rides the same
    single shuffle+sort as every other rolling feature.
    """
    from . import ordering

    key, order = cfg.key_col, list(cfg.order_cols)
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(-(window - 1), 0)
    big = F.length("text") >= large_chars
    n_big = F.sum(big.cast("int")).over(w)
    us = ordering.epoch_us(cfg.ts_col)
    dur_s = (F.max(us).over(w) - F.min(us).over(w)).cast("double") / 1e6
    user_vol = F.sum(
        F.when(big & (F.col("role") == "user"), F.length("text")).otherwise(0)
    ).over(w)
    asst_vol = F.sum(
        F.when(big & (F.col("role") == "assistant"), F.length("text")).otherwise(0)
    ).over(w)
    freq = F.when(dur_s > 0, n_big.cast("double") / dur_s).otherwise(F.lit(0.0))
    tot = user_vol + asst_vol
    imb = F.when(
        tot > 0, (user_vol - asst_vol).cast("double") / tot.cast("double")
    ).otherwise(F.lit(0.0))
    return df.select(
        key, "turn_idx",
        freq.alias("large_turn_freq_per_s"),
        imb.alias("large_turn_imbalance"),
    )


def acf_exact(df: DataFrame, cfg: PipelineConfig, col: str = "value",
              lags: tuple = (1, 2, 3), scale: int = 100) -> DataFrame:
    """Whole-series autocorrelation at multiple lags per conversation,
    exactly: ACF(k) = Pearson(x_{1..n-k}, x_{1+k..n}).

    Unlike ret_autocorr_fast above (windowed float F.corr — the streaming
    estimate), this is the exact full-series diagnostic: the input is
    quantized to integers (floor(x*scale + 0.5) — same double ops on any
    engine reading the same parquet), all six Pearson sums are exact
    decimal integers in any reduction order, and the closing expression is
    one fixed operand sequence with integer-condition zero-variance
    guards. One window pass produces ALL lags (one lead() per lag over
    the same sort), then the lag pairs stack and reduce by (conv, lag).

    Returns (conv_id, lag, n_pairs, acf); acf = 0.0 where either side of
    a lag pairing is constant (undefined correlation).
    """
    w = ordering.stable_window(cfg)
    key = cfg.key_col
    xi = F.floor(F.col(col) * F.lit(float(scale)) + F.lit(0.5)).cast("long")
    leads = [F.lead(xi, int(k)).over(w).alias(f"_b{k}") for k in lags]
    base = df.select(F.col(key), xi.alias("_a"), *leads)
    stacked = base.select(
        key,
        F.col("_a"),
        F.explode(
            F.array(*[
                F.struct(F.lit(int(k)).alias("lag"), F.col(f"_b{k}").alias("b"))
                for k in lags
            ])
        ).alias("p"),
    ).select(
        key, F.col("p.lag").alias("lag"), F.col("_a").alias("a"), F.col("p.b").alias("b")
    ).where(F.col("b").isNotNull())
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    g = stacked.groupBy(key, "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(dec("a") * dec("b")).alias("sab"),
        F.sum(dec("a") * dec("a")).alias("saa"),
        F.sum(dec("b") * dec("b")).alias("sbb"),
    )
    n = F.col("n").cast("decimal(38,0)")
    va = n * F.col("saa") - dec("sa") * dec("sa")
    vb = n * F.col("sbb") - dec("sb") * dec("sb")
    num = (n * F.col("sab") - dec("sa") * dec("sb")).cast("double")
    den = F.sqrt(va.cast("double")) * F.sqrt(vb.cast("double"))
    acf = F.when((va > 0) & (vb > 0), num / den).otherwise(F.lit(0.0))
    return g.select(
        key, F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_pairs"),
        (F.floor(acf * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("acf"),
    )


def fano_burstiness(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_s: int = 3600,
) -> DataFrame:
    """Burstiness profile per key: integer moment sums of the per-bucket
    event counts (buckets = fixed ``bucket_s`` windows that contain at
    least one event). Fano factor = variance/mean of the counts — ~1 for
    a Poisson arrival process, >>1 for bursty keys (scripted traffic,
    batch replays), <1 for pacemaker-regular keys; the standard arrival
    diagnostic next to the vol family (ref analog: the activity-regime
    stats of feature_engine/experimental_volatility.rs).

    Output stays in integer space (n_buckets, cnt_sum, cnt_sumsq) so any
    engine reproduces it bit-exactly; Fano = (sumsq*n - sum^2) / (n*sum)
    is recoverable exactly from the three sums. Shape: two keyed
    aggregations with map-side partials — shuffle O(active buckets) then
    O(keys); no window, no sort.
    """
    us = F.lit(int(bucket_s) * 1_000_000)
    bucketed = df.select(
        F.col(key_col).alias("k"),
        (ordering.epoch_us(F.col(ts_col)) - (ordering.epoch_us(F.col(ts_col)) % us)).alias("b"),
    )
    counts = bucketed.groupBy("k", "b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    dec = lambda c: F.col(c).cast("decimal(20,0)")
    return counts.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("c").cast("long").alias("cnt_sum"),
        F.sum(dec("c") * dec("c")).cast("long").alias("cnt_sumsq"),
    ).select(F.col("k").alias(key_col), "n_buckets", "cnt_sum", "cnt_sumsq")


def theil_sen_pacing(
    df: DataFrame, cfg: PipelineConfig, ts_col: str = "ts"
) -> DataFrame:
    """Robust conversation pacing: the Theil-Sen estimator of µs-per-turn
    over (turn_idx, epoch_us) — the exact lower median of all pairwise
    slopes (ts_j - ts_i) div (j - i), i < j. Unlike the mean inter-turn
    gap, one pathological stall (a user who walked away) cannot drag it;
    the median pairwise slope has a 29% breakdown point — the robust twin
    of the dt-family volatility features.

    All arithmetic is integer: slopes are exact integer division of
    non-negative µs deltas, and the median is the order statistic at
    row (n+1) DIV 2, so any engine reproduces it bit-exactly. Shape: a
    per-conversation bounded self-join (T^2/2 pairs inside one hash
    partition — cap T via skew chunking for mega-conversations), then
    one window rank over the pair set.
    """
    t = df.select(
        F.col(cfg.key_col).alias("conv_id"),
        F.col("turn_idx").cast("long").alias("ti"),
        ordering.epoch_us(F.col(ts_col)).alias("us"),
    )
    a = t.select("conv_id", F.col("ti").alias("ti_a"), F.col("us").alias("us_a"))
    b = t.select("conv_id", F.col("ti").alias("ti_b"), F.col("us").alias("us_b"))
    pairs = (
        a.join(b, "conv_id")
        .where(F.col("ti_a") < F.col("ti_b"))
        .select(
            "conv_id",
            # exact FLOOR division (matches SQL's `//` even for a negative
            # numerator, which truncating `div` would not): pmod is always
            # non-negative, so (dy - pmod(dy, dx)) is the largest multiple
            # of dx <= dy, and the final divide is exact in int64 range.
            F.expr("cast((us_b - us_a - pmod(us_b - us_a, ti_b - ti_a)) / (ti_b - ti_a) as long)")
            .alias("slope_us"),
        )
    )
    w = Window.partitionBy("conv_id").orderBy(F.col("slope_us").asc())
    ranked = pairs.select(
        "conv_id", "slope_us",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("conv_id")).alias("n_pairs"),
    )
    return ranked.where(F.expr("_rn = (n_pairs + 1) div 2")).select(
        "conv_id",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("slope_us").alias("med_slope_us"),
    )
