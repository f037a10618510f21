"""Point-in-time accumulating state.

The reference folds every event into LobState and samples projections of it
(reference: src/pipeline.rs:584-736, src/features/extractor.rs:272-292). The
transcript analog of that accumulating materialized view is cumulative
per-conversation state: counts per role, character volume, inter-turn time —
all expressed as aggregates over the cumulative frame, which Catalyst fuses
into ONE Window exec (single sort+shuffle) because every aggregate shares the
same spec.

No nulls leave this stage: absent state is encoded 0.0 with +eps division
guards, matching the reference's conventions (src/contract.rs:55,
src/features/lob_features.rs:40-44) — this is what makes allclose parity
against golden fixtures meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..contract import DIVISION_GUARD_EPS, SCHEMA_VERSION
from . import ordering


def with_state_features(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Adds STATE_FEATURES + cumulative signal features.

    Expects the raw transcript columns; adds a ``char_len`` helper column
    (the per-turn "size", reference analog of event size).
    """
    w = ordering.stable_window(cfg)
    cum = ordering.cumulative(cfg)
    us = ordering.epoch_us(cfg.ts_col)

    df = df.withColumn("char_len", F.coalesce(F.length("text"), F.lit(0)).cast("double"))
    df = df.withColumn("turn_pos", (F.row_number().over(w) - 1).cast("double"))

    is_user = (F.col("role") == "user").cast("double")
    is_assistant = (F.col("role") == "assistant").cast("double")
    is_tool = (F.col("role") == "tool").cast("double")

    prev_us = F.lag(us).over(w)
    first_us = F.first(us).over(cum)

    df = (
        df.withColumn("turns_so_far", F.count(F.lit(1)).over(cum).cast("double"))
        .withColumn("user_turns_so_far", F.sum(is_user).over(cum).cast("double"))
        .withColumn("assistant_turns_so_far", F.sum(is_assistant).over(cum).cast("double"))
        .withColumn("tool_turns_so_far", F.sum(is_tool).over(cum).cast("double"))
        .withColumn("chars_so_far", F.sum("char_len").over(cum).cast("double"))
        .withColumn(
            "dt_seconds",
            F.coalesce((us - prev_us) / F.lit(1e6), F.lit(0.0)).cast("double"),
        )
        .withColumn("secs_since_start", ((us - first_us) / F.lit(1e6)).cast("double"))
    )

    # cumulative flow signals (reference analog: net order flow,
    # src/features/mbo_features/flow_features.rs:46-83 — same +eps guard)
    u, a, t_ = F.col("user_turns_so_far"), F.col("assistant_turns_so_far"), F.col("tool_turns_so_far")
    df = df.withColumn("net_role_flow", ((u - a) / (u + a + F.lit(DIVISION_GUARD_EPS))).cast("double"))
    df = df.withColumn(
        "net_tool_flow",
        ((t_ - (u + a)) / (F.col("turns_so_far") + F.lit(DIVISION_GUARD_EPS))).cast("double"),
    )

    # warmup flag (reference: mbo_ready after >=100 effective updates,
    # src/features/signals/ofi.rs:15)
    df = df.withColumn(
        "session_ready", (F.col("turns_so_far") >= F.lit(float(cfg.warmup_turns))).cast("double")
    )
    df = df.withColumn("schema_version", F.lit(float(SCHEMA_VERSION)))
    return df


def with_sessions(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Gap-based sessionization: a new session starts when the inter-turn gap
    exceeds cfg.session_gap_s. session_id = running count of session starts.

    Generalizes the reference's per-day reset boundary
    (src/pipeline.rs:820-841) to within-conversation boundaries; the same
    construction is the batch equivalent of session_window in streaming.
    """
    w = ordering.stable_window(cfg)
    cum = ordering.cumulative(cfg)
    us = ordering.epoch_us(cfg.ts_col)
    gap_us = int(cfg.session_gap_s * 1e6)
    prev = F.lag(us).over(w)
    start = F.when(prev.isNull() | ((us - prev) > gap_us), F.lit(1.0)).otherwise(F.lit(0.0))
    df = df.withColumn("is_session_start", start)
    return df.withColumn("session_id", (F.sum("is_session_start").over(cum) - 1).cast("double"))


def with_time_regime(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Coarse time-of-day bucket 0..4 (reference:
    src/features/signals/time_regime.rs:68-108 — Open/Early/Midday/Close/
    Closed over an exchange session; transcript analog uses UTC hour bands).

    Spark's timezone handling is exact where the reference approximates DST;
    deviation documented per SURVEY §2.2.
    """
    hr = F.hour(cfg.ts_col)
    regime = (
        F.when((hr >= 0) & (hr < 6), F.lit(0.0))
        .when((hr >= 6) & (hr < 12), F.lit(1.0))
        .when((hr >= 12) & (hr < 17), F.lit(2.0))
        .when((hr >= 17) & (hr < 21), F.lit(3.0))
        .otherwise(F.lit(4.0))
    )
    return df.withColumn("time_regime", regime)
