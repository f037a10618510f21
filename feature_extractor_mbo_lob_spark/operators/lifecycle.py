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
