"""Survival analysis over tool-episode durations: Kaplan-Meier risk table
with right-censoring.

The reference's lifecycle tracker (src/features/lifecycle_features.rs:29-80)
measures time-to-fill only for COMPLETED episodes; episodes still open when
the stream ends are silently dropped, which biases every latency statistic
downward. The survival-analysis view fixes that: an open episode is a
right-CENSORED observation (we know it lived at least until the last
observed turn), and the Kaplan-Meier estimator uses exactly that partial
information. Standard refs: Kaplan & Meier (1958); lifelines'
``KaplanMeierFitter`` produces the same risk table.

Engine-exactness: every output column is an int64 — durations floor to
whole seconds with integer division, and the table is (t, n_risk, d, c)
counts. The survival curve S(t) = prod_{t_i<=t} (1 - d_i/n_i) is a float
product and therefore deliberately NOT emitted as a canonical column: it is
exactly recoverable from the integer table by any consumer (the round-2
lesson — never ship a cross-engine float round-trip when the integers
suffice).

Scale shape: one groupBy collapses N episodes to at most ``max distinct
duration`` rows (bounded further by ``granularity_s`` bucketing for
unbounded domains), then ONE window over that tiny aggregate computes
n_risk as a reverse cumulative sum. No join back to the data, no global
sort of episodes — the only all-to-one stage handles the aggregated table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from . import lifecycle, ordering


def km_risk_table(
    durations: DataFrame,
    duration_col: str = "dur_s",
    event_col: str = "event",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Kaplan-Meier risk table: one row per distinct observed duration t
    with ``n_risk`` (subjects with duration >= t), ``d_events`` (events at
    exactly t) and ``c_censored`` (censorings at exactly t) — the
    estimator's complete sufficient statistics, all integers.

    ``group_cols`` yields stratified tables (one curve per stratum, e.g.
    per tool) from the same single shuffle.
    """
    groups = group_cols or []
    ev = F.col(event_col).cast("long")
    agg = durations.groupBy(
        *groups, F.col(duration_col).cast("long").alias("t_s")
    ).agg(
        F.sum(ev).alias("d_events"),
        F.sum(F.lit(1) - ev).alias("c_censored"),
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy(F.col("t_s").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return agg.select(
        *groups,
        "t_s",
        F.sum(F.col("d_events") + F.col("c_censored")).over(w).alias("n_risk"),
        "d_events",
        "c_censored",
    )


def episode_durations(
    df: DataFrame, cfg: PipelineConfig, granularity_s: int = 1
) -> DataFrame:
    """Tool-episode durations with right-censoring: completed episodes
    (invoke paired with its FIFO result) contribute ``latency`` with
    ``event=1``; still-open invocations are censored at the conversation's
    last observed turn (``event=0``). Durations floor to whole
    ``granularity_s`` buckets by integer division — exact on both engines.
    """
    ep = lifecycle.tool_episodes(df, cfg)
    conv_end = df.groupBy(cfg.key_col).agg(
        F.max(ordering.epoch_us(cfg.ts_col)).alias("_end_us")
    )
    ep = ep.join(conv_end, cfg.key_col)
    inv_us = ordering.epoch_us("invoke_ts")
    # FIFO rank pairing can attribute a result to a LATER invoke, yielding a
    # negative apparent latency; survival time clamps at zero (and keeps
    # the floor-division below in nonnegative territory, where Spark's
    # pmod-floor and DuckDB's truncating // agree).
    dur_us = F.greatest(
        F.when(F.col("completed") == 1, F.col("latency_us")).otherwise(
            F.col("_end_us") - inv_us
        ),
        F.lit(0),
    )
    g = F.lit(int(granularity_s) * 1_000_000)
    # exact integer floor-div: subtract the remainder first, so the final
    # division is a ratio of exact multiples (never a float rounding call)
    dur_bucket = ((dur_us - F.pmod(dur_us, g)) / g).cast("long")
    return ep.select(
        F.col(cfg.key_col),
        F.col("tool"),
        dur_bucket.alias("dur_s"),
        F.col("completed").cast("long").alias("event"),
    )


def nelson_aalen_table(
    risk_table: DataFrame,
    scale: int = 10**9,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard table from a KM risk table
    (``km_risk_table`` output): per event time t the hazard increment is
    d/n, and H(t) = sum of increments over event times <= t. The reference
    only reports mean/percentile fill latencies over completed episodes
    (src/features/lifecycle_features.rs:29-80); the NA estimator is the
    censoring-correct cumulative-risk counterpart, standard alongside
    Kaplan-Meier (Aalen 1978; lifelines ``NelsonAalenFitter``).

    Engine-exactness: hazard increments are FIXED-POINT integers —
    ``(d * scale) div n`` computed in decimal(38,0) so the product can
    never wrap int64 (the HITS round-4 lesson: widen BEFORE the
    arithmetic, not after), matching DuckDB's hugeint ``//`` bit for bit.
    ``h_cum_fp`` is the running sum of increments (ascending t), and
    ``var_cum_fp`` the same for the Poisson variance proxy
    ``(d * scale) div (n * n)``. All outputs int64; true H(t) =
    h_cum_fp / scale recoverable exactly by any consumer.

    Scale shape: input is the already-collapsed risk table (<= distinct
    durations rows), so the two windows here run over a tiny aggregate —
    no row-level shuffle is added on top of km_risk_table's single one.
    """
    groups = group_cols or []
    inc = F.expr(f"cast(d_events as decimal(38,0)) * {int(scale)} div n_risk")
    var_inc = F.expr(
        f"cast(d_events as decimal(38,0)) * {int(scale)}"
        " div (cast(n_risk as decimal(38,0)) * n_risk)"
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy("t_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return risk_table.select(
        *groups,
        "t_s",
        "n_risk",
        "d_events",
        inc.cast("long").alias("h_inc_fp"),
        var_inc.cast("long").alias("var_inc_fp"),
    ).select(
        *groups,
        "t_s",
        "n_risk",
        "d_events",
        F.sum("h_inc_fp").over(w).alias("h_cum_fp"),
        F.sum("var_inc_fp").over(w).alias("var_cum_fp"),
    )
