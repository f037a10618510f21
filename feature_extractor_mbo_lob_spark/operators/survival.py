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


def logrank_test(
    durations: DataFrame,
    duration_col: str = "dur_s",
    event_col: str = "event",
    group_col: str = "grp",
    scale: int = 10**9,
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966; Peto & Peto 1972 — the
    standard censoring-correct comparison of two survival curves;
    lifelines ``logrank_test`` computes the same statistic). The reference
    compares tool latencies only via completed-episode means
    (src/features/lifecycle_features.rs:29-80); the log-rank test is the
    censoring-correct "is tool family A slower than B" answer.

    ``group_col`` must be 0/1. At every distinct duration t (pooled over
    both groups) with d_t total events: with n_t subjects at risk and
    n1_t of them in group 1,

        E1 += d_t * n1_t / n_t
        V  += d_t * (n1_t/n_t) * (n2_t/n_t) * (n_t - d_t) / (n_t - 1)
        chi2 = (O1 - E1)^2 / V     (~ chi^2 with 1 dof)

    Engine-exactness: E1 and V accumulate as FIXED-POINT integers —
    ``(d * n1 * scale) div n`` and ``(d * n1 * n2 * (n-d) * scale) div
    (n * n * (n-1))`` in decimal(38,0) (hugeint twin), so the sums are
    order-free int64. Only the final chi2 is a float, computed from two
    already-summed int64s with one identical op sequence on both engines
    (boundary-exact canonicalization is the caller's job).

    Scale shape: ONE groupBy collapses all episodes to <= distinct
    durations rows (conditional sums fold both groups in the same pass);
    one window over that tiny aggregate computes the at-risk counts; a
    1-row global aggregate finishes. No join, no per-group second pass.
    """
    ev = F.col(event_col).cast("long")
    g1 = F.col(group_col).cast("long")
    agg = durations.groupBy(F.col(duration_col).cast("long").alias("t_s")).agg(
        F.sum(ev).alias("d"),
        F.sum(F.lit(1) - ev).alias("c"),
        F.sum(ev * g1).alias("d1"),
        F.sum((F.lit(1) - ev) * g1).alias("c1"),
    )
    w = (
        Window.orderBy(F.col("t_s").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = agg.select(
        "t_s",
        "d",
        "d1",
        F.sum(F.col("d") + F.col("c")).over(w).alias("n"),
        F.sum(F.col("d1") + F.col("c1")).over(w).alias("n1"),
    ).filter(F.col("d") > 0)
    s = int(scale)
    e1_inc = F.expr(
        f"cast(d as decimal(38,0)) * n1 * {s} div n"
    )
    v_inc = F.expr(
        "case when n > 1 then "
        f"cast(d as decimal(38,0)) * n1 * (n - n1) * (n - d) * {s}"
        " div (cast(n as decimal(38,0)) * n * (n - 1)) else 0 end"
    )
    tot = risk.select(
        "d",
        "d1",
        e1_inc.cast("long").alias("e1_fp"),
        v_inc.cast("long").alias("v_fp"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_times"),
        F.sum("d1").cast("long").alias("o1"),
        F.sum(F.col("d") - F.col("d1")).cast("long").alias("o2"),
        F.sum("e1_fp").cast("long").alias("e1_cum_fp"),
        F.sum("v_fp").cast("long").alias("v_cum_fp"),
    )
    num = (F.col("o1") * F.lit(s) - F.col("e1_cum_fp")).cast("double")
    den = F.col("v_cum_fp").cast("double") * F.lit(float(s))
    chi2 = F.when(F.col("v_cum_fp") > 0, num * num / den).otherwise(F.lit(0.0))
    return tot.select(
        "n_times", "o1", "o2", "e1_cum_fp", "v_cum_fp", chi2.alias("chi2_raw")
    )
