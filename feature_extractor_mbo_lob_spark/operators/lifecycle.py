"""Tool-call lifecycle pairing — transcript analog of the reference's order
lifecycle tracker (reference: src/features/mbo_features/order_tracker.rs:149-223:
BTreeMap of open orders, Add paired with Cancel/final-Trade, completed-order
ring buffers feeding lifetime / fill-ratio / modification stats).

Transcript semantics (frozen for the oracle):
* an INVOCATION is an assistant turn with a non-null tool;
* a RESULT is a tool-role turn with the same tool name in the same conv;
* FIFO pairing: the k-th invocation of tool T in a conversation pairs with
  the k-th result of T (rank equi join — distributed, no sequential state);
* episode stats: latency seconds, turns between, completion flag.

The "active at turn t" counters (order-tracker analog of active_order_count)
are cumulative starts minus cumulative completions over the stable order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from . import ordering


def _epoch_us(cfg):
    return ordering.epoch_us(cfg.ts_col)


def tool_episodes(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """One row per invocation: (conv_id, tool, episode_rank, invoke_turn_idx,
    invoke_ts, result_turn_idx?, result_ts?, latency_s?, gap_turns?,
    completed). Unmatched invocations keep NULL result columns."""
    inv = df.filter((F.col("role") == "assistant") & F.col("tool").isNotNull())
    res = df.filter((F.col("role") == "tool") & F.col("tool").isNotNull())

    wk = Window.partitionBy(cfg.key_col, "tool").orderBy(*cfg.order_cols)
    inv = inv.select(
        F.col(cfg.key_col),
        F.col("tool"),
        F.row_number().over(wk).alias("episode_rank"),
        F.col("turn_idx").alias("invoke_turn_idx"),
        F.col(cfg.ts_col).alias("invoke_ts"),
    )
    res = res.select(
        F.col(cfg.key_col),
        F.col("tool"),
        F.row_number().over(wk).alias("episode_rank"),
        F.col("turn_idx").alias("result_turn_idx"),
        F.col(cfg.ts_col).alias("result_ts"),
    )
    ep = inv.join(res, on=[cfg.key_col, "tool", "episode_rank"], how="left")
    lat_us = F.unix_micros(F.col("result_ts").cast("timestamp")) - F.unix_micros(
        F.col("invoke_ts").cast("timestamp")
    )
    return ep.select(
        "*",
        # integer microseconds kept alongside: aggregates over it are exact
        # (sums of ints < 2^53), which keeps cross-engine parity bit-stable
        F.when(F.col("result_turn_idx").isNotNull(), lat_us).cast("long").alias("latency_us"),
        F.when(F.col("result_turn_idx").isNotNull(), lat_us / 1e6).cast("double").alias("latency_s"),
        (F.col("result_turn_idx") - F.col("invoke_turn_idx")).cast("int").alias("gap_turns"),
        F.col("result_turn_idx").isNotNull().cast("int").alias("completed"),
    )


def episode_stats(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Per-conversation lifecycle aggregates (reference analog: features
    76-83, lifecycle_features.rs): episode counts, completion ratio, mean /
    median latency of completed episodes."""
    ep = tool_episodes(df, cfg)
    return ep.groupBy(cfg.key_col).agg(
        F.count(F.lit(1)).alias("n_episodes"),
        F.sum("completed").cast("long").alias("n_completed"),
        F.avg("completed").cast("double").alias("completion_ratio"),
        # aggregate exact integer micros, convert once — order-independent
        (F.avg("latency_us") / 1e6).cast("double").alias("mean_latency_s"),
        (F.percentile("latency_us", F.lit(0.5)) / 1e6).cast("double").alias("median_latency_s"),
        F.avg("gap_turns").cast("double").alias("mean_gap_turns"),
    )


def episode_modifications(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """tool_episodes plus a ``mods`` column: the number of re-invocations of
    the same tool while the episode was open (assistant turns with tool T in
    the open interval (invoke_turn, result_turn)) — the transcript analog of
    per-order modification counts (reference: completed_modifications,
    src/features/mbo_features/order_tracker.rs + institutional_features.rs:55-63).

    Computed without a range join: in the per-(conv, tool) ordered event
    stream, cum_inv(result turn) counts invocations before the result, so
    mods_k = cum_inv(r_k) - k for the k-th completed episode.
    """
    is_inv = (F.col("role") == "assistant") & F.col("tool").isNotNull()
    is_res = (F.col("role") == "tool") & F.col("tool").isNotNull()
    evt = df.filter(is_inv | is_res)
    wk = Window.partitionBy(cfg.key_col, "tool").orderBy(*cfg.order_cols)
    cum = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    evt = evt.withColumn("_cum_inv", F.sum(is_inv.cast("long")).over(cum))

    inv = evt.filter(is_inv).select(
        F.col(cfg.key_col),
        F.col("tool"),
        F.row_number().over(wk).alias("episode_rank"),
        F.col("turn_idx").alias("invoke_turn_idx"),
        F.col(cfg.ts_col).alias("invoke_ts"),
    )
    res = evt.filter(is_res).select(
        F.col(cfg.key_col),
        F.col("tool"),
        F.row_number().over(wk).alias("episode_rank"),
        F.col("turn_idx").alias("result_turn_idx"),
        F.col(cfg.ts_col).alias("result_ts"),
        (F.col("_cum_inv") - F.row_number().over(wk)).cast("long").alias("mods"),
    )
    ep = inv.join(res, on=[cfg.key_col, "tool", "episode_rank"], how="left")
    lat_us = F.unix_micros(F.col("result_ts").cast("timestamp")) - F.unix_micros(
        F.col("invoke_ts").cast("timestamp")
    )
    return ep.select(
        "*",
        F.when(F.col("result_turn_idx").isNotNull(), lat_us).cast("long").alias("latency_us"),
        F.col("result_turn_idx").isNotNull().cast("int").alias("completed"),
    )


def with_lifecycle_point_in_time(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Point-in-time lifecycle stats at EVERY turn (reference features 76-78,
    81: modification score, iceberg proxy, average active-order age, average
    time-to-first-fill — lifecycle_features.rs:29-80,
    institutional_features.rs:55-71), computed with cumulative sums over the
    stable conversation order; no per-row state, one extra broadcast-size
    join of result-turn attributes.

    Added columns (all double):
    * active_episodes     — open invocations (starts - matched completions)
    * active_age_mean_s   — mean age in seconds of open invocations, 0 if none
      (sum of open invoke timestamps via cumsum(invoke_us) - cumsum(matched
      invoke_us at result turns))
    * ttf_result_mean_s   — running mean latency of completed episodes (81)
    * mod_score           — running mean re-invocations per completed episode (76)
    * iceberg_proxy       — completion_ratio_so_far * min(mod_score/10, 1) (77)
    """
    ep = episode_modifications(df, cfg).filter(F.col("completed") == 1).select(
        F.col(cfg.key_col),
        F.col("result_turn_idx").alias("turn_idx"),
        F.unix_micros(F.col("invoke_ts").cast("timestamp")).alias("_m_inv_us"),
        F.col("latency_us").alias("_m_lat_us"),
        F.col("mods").alias("_m_mods"),
    )
    out = df.join(ep, on=[cfg.key_col, "turn_idx"], how="left")

    cum = ordering.cumulative(cfg)
    us = ordering.epoch_us(cfg.ts_col)
    is_inv = ((F.col("role") == "assistant") & F.col("tool").isNotNull()).cast("long")
    matched = F.col("_m_inv_us").isNotNull().cast("long")

    n_started = F.sum(is_inv).over(cum)
    n_done = F.sum(matched).over(cum)
    n_open = n_started - n_done
    open_sum_us = (
        F.sum(is_inv * us).over(cum)
        - F.sum(F.coalesce(F.col("_m_inv_us"), F.lit(0)).cast("long")).over(cum)
    )
    lat_sum = F.sum(F.coalesce(F.col("_m_lat_us"), F.lit(0)).cast("long")).over(cum)
    mods_sum = F.sum(F.coalesce(F.col("_m_mods"), F.lit(0)).cast("long")).over(cum)

    age = F.when(
        n_open > 0, ((n_open * us - open_sum_us) / n_open) / F.lit(1e6)
    ).otherwise(F.lit(0.0))
    ttf = F.when(n_done > 0, (lat_sum / n_done) / F.lit(1e6)).otherwise(F.lit(0.0))
    mod_score = F.when(n_done > 0, mods_sum / n_done).otherwise(F.lit(0.0))
    ratio = F.when(n_started > 0, n_done / n_started).otherwise(F.lit(0.0))
    iceberg = ratio * F.least(mod_score / 10.0, F.lit(1.0))
    # feature 82 analog (cancel_to_add_ratio, lifecycle_features.rs:89-105):
    # results/invocations, 1.0 when no activity, capped at 10
    r2i = (
        F.when((n_started == 0) & (n_done == 0), F.lit(1.0))
        .when(n_started == 0, F.lit(10.0))
        .otherwise(F.least(n_done / n_started, F.lit(10.0)))
    )

    return out.select(
        "*",
        n_open.cast("double").alias("active_episodes"),
        age.cast("double").alias("active_age_mean_s"),
        ttf.cast("double").alias("ttf_result_mean_s"),
        mod_score.cast("double").alias("mod_score"),
        iceberg.cast("double").alias("iceberg_proxy"),
        r2i.cast("double").alias("result_to_invoke_ratio"),
    ).drop("_m_inv_us", "_m_lat_us", "_m_mods")


def with_active_episode_count(df: DataFrame, cfg: PipelineConfig,
                              out: str = "active_episodes") -> DataFrame:
    """Point-in-time open-episode count at every turn: cumulative invocation
    starts minus cumulative results (reference analog: active_order_count,
    lifecycle_features.rs:25). Computed without a join — two conditional
    cumulative sums over the stable order."""
    cum = ordering.cumulative(cfg)
    starts = F.sum(
        ((F.col("role") == "assistant") & F.col("tool").isNotNull()).cast("double")
    ).over(cum)
    ends = F.sum(
        ((F.col("role") == "tool") & F.col("tool").isNotNull()).cast("double")
    ).over(cum)
    return df.withColumn(out, F.greatest(starts - ends, F.lit(0.0)).cast("double"))
