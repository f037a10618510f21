"""Batch run orchestration: metrics, error modes, quarantine.

Reference: BatchProcessor (src/batch.rs:914-1035) — Rayon pool over files,
FailFast vs CollectErrors, progress callbacks, throughput/speedup metrics.

Spark restatement: Spark's scheduler owns parallelism; what remains is
(a) run-level metrics (rows, wall, throughput) from observed metrics,
(b) the error-mode policy: fail_fast raises on the first bad partition,
collect_errors quarantines malformed input rows into a side table and
continues — the task-retry analog of CollectErrors.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .config import PipelineConfig


@dataclass
class RunMetrics:
    rows_in: int = 0
    rows_out: int = 0
    rows_quarantined: int = 0
    wall_sec: float = 0.0
    throughput_rows_per_sec: float = 0.0
    errors: list[str] = field(default_factory=list)


def split_quarantine(df: DataFrame, cfg: PipelineConfig,
                     mode: str = "collect_errors") -> tuple[DataFrame, DataFrame]:
    """Separate structurally-bad rows (null key/order/ts, negative turn_idx)
    from good ones. mode='fail_fast' raises if any bad row exists
    (reference: ErrorMode, src/batch.rs:132-145)."""
    bad_cond = (
        F.col(cfg.key_col).isNull()
        | F.col("turn_idx").isNull()
        | (F.col("turn_idx") < 0)
        | F.col(cfg.ts_col).isNull()
    )
    bad = df.filter(bad_cond)
    good = df.filter(~bad_cond)
    if mode == "fail_fast":
        n = bad.limit(1).count()
        if n:
            raise RuntimeError("fail_fast: malformed input rows present")
    elif mode != "collect_errors":
        raise ValueError(f"unknown error mode {mode}")
    return good, bad


class JobHandle:
    """Cooperative cancellation for a running batch job (reference:
    CancellationToken + BatchProcessor::cancel, src/batch.rs:188-230).

    Spark restatement: every action issued by the job runs under a
    SparkContext job group; ``cancel()`` calls ``cancelJobGroup``, which
    aborts all in-flight stages of the group — the cluster-native analog of
    the reference's atomic cancel flag polled between files."""

    def __init__(self, spark, group_id: str, description: str = ""):
        self._sc = spark.sparkContext
        self.group_id = group_id
        self.description = description
        self.cancelled = False

    def activate(self) -> None:
        # interruptOnCancel=True interrupts executor task threads
        self._sc.setJobGroup(self.group_id, self.description, True)

    def cancel(self) -> None:
        self.cancelled = True
        self._sc.cancelJobGroup(self.group_id)

    def clear(self) -> None:
        self._sc.setJobGroup("", "")


def run_job(
    df: DataFrame,
    cfg: PipelineConfig,
    build_fn,
    sink_fn,
    mode: str = "collect_errors",
    quarantine_path: str | None = None,
    handle: JobHandle | None = None,
) -> RunMetrics:
    """Clean -> build -> sink with metrics; quarantined rows optionally
    written to a side table (the bad-partition quarantine of SURVEY §3.3).
    Pass a JobHandle to make the run cancellable from another thread
    (handle.cancel() aborts the job group's in-flight stages)."""
    m = RunMetrics()
    t0 = time.time()
    if handle is not None:
        handle.activate()
    try:
        # rows_in/rows_quarantined ride Observations on the quarantine
        # write's single pass — at 100 TB an extra count() is an extra
        # full scan, so metrics must piggyback on work already running.
        from pyspark.sql import Observation

        obs_bad = Observation("quarantine")
        good, bad = split_quarantine(df, cfg, mode=mode)
        bad = bad.observe(obs_bad, F.count(F.lit(1)).alias("n"))
        if quarantine_path:
            bad.write.mode("overwrite").parquet(quarantine_path)
            m.rows_quarantined = obs_bad.get["n"]
        else:
            m.rows_quarantined = bad.count()
        obs_in = Observation("input")
        obs_out = Observation("sink")
        good = good.observe(obs_in, F.count(F.lit(1)).alias("n"))
        out = build_fn(good, cfg).observe(obs_out, F.count(F.lit(1)).alias("n"))
        sunk = sink_fn(out)
        try:
            # both observations fire on the sink's single pass: obs_in sits
            # on the cleaned input subtree inside the sink plan, obs_out on
            # the built frame — no extra count() scans anywhere
            m.rows_out = obs_out.get["n"]
            m.rows_in = obs_in.get["n"] + m.rows_quarantined
        except Exception:
            # sink_fn ran no action over the observed frame (dry run)
            m.rows_out = sunk if isinstance(sunk, int) else 0
            m.rows_in = df.count()
    finally:
        if handle is not None:
            handle.clear()
    m.wall_sec = round(time.time() - t0, 3)
    m.throughput_rows_per_sec = round(m.rows_in / m.wall_sec, 1) if m.wall_sec else 0.0
    return m


def chronological_split(
    df: DataFrame,
    cfg: PipelineConfig,
    train: float = 0.7,
    val: float = 0.15,
    split_col: str = "split",
) -> DataFrame:
    """Chronological train/val/test tagging by global time quantile
    (reference: SplitConfig ratios over days, configs/nvda_98feat.toml:80-84).
    Implemented as two scalar time cutoffs from one aggregate — no global
    sort, no total-order window (which would single-task at scale)."""
    # scalar cutoffs via exact percentiles of epoch micros (single agg)
    us = F.unix_micros(F.col(cfg.ts_col).cast("timestamp"))
    row = df.agg(
        F.percentile(us, F.lit(train)).alias("c1"),
        F.percentile(us, F.lit(train + val)).alias("c2"),
    ).collect()[0]
    c1, c2 = row["c1"], row["c2"]
    return df.withColumn(
        split_col,
        F.when(us <= F.lit(c1), F.lit("train"))
        .when(us <= F.lit(c2), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def group_hash_split(
    df: DataFrame,
    cfg: PipelineConfig,
    train: float = 0.7,
    val: float = 0.15,
    split_col: str = "split",
    buckets: int = 10_000,
) -> DataFrame:
    """Group-aware train/val/test split: EVERY turn of a conversation lands
    in the same split (md5 bucket of the group key), the leakage-safe
    alternative to `chronological_split` when conversations must not
    straddle splits. Stateless, engine-reproducible, no shuffle — the
    split is a pure row expression.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(cfg.key_col).cast("string")), 1, 7), 16, 10)
        .cast("long") % buckets
    )
    t_hi = int(train * buckets)
    v_hi = int((train + val) * buckets)
    return df.withColumn(
        split_col,
        F.when(bucket < t_hi, F.lit("train"))
        .when(bucket < v_hi, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def group_kfold(
    df: DataFrame,
    cfg: PipelineConfig,
    k: int = 5,
    fold_col: str = "fold",
) -> DataFrame:
    """Group-aware k-fold assignment: every turn of a conversation lands
    in the same fold (md5 bucket of the group key mod k) — the
    cross-validation counterpart of group_hash_split, with the same
    no-straddle guarantee and the same zero-shuffle pure-row-expression
    plan. Stateless and engine-reproducible; fold balance follows the
    hash's uniformity (exact at corpus scale, approximate at toy sizes).
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(cfg.key_col).cast("string")), 1, 7), 16, 10)
        .cast("long") % k
    )
    return df.withColumn(fold_col, bucket.cast("int"))


def purged_split(
    df: DataFrame,
    cfg: PipelineConfig,
    test_frac_num: int = 1,
    test_frac_den: int = 5,
    embargo_turns: int = 3,
    split_col: str = "split",
) -> DataFrame:
    """Purged chronological split WITH EMBARGO, per conversation (the
    walk-forward CV hygiene of Lopez de Prado's purged k-fold, adapted to
    per-entity series): the last ``test_frac`` of each conversation's
    turns is test, the ``embargo_turns`` immediately before it are
    EXCLUDED from training (label horizons / rolling windows computed at
    train time would otherwise peek into test rows — the exact temporal
    leak the north rule forbids), and everything earlier is train.

    Pure integer rank arithmetic against the stable turn order —
    test iff i > n - ceil(n*num/den), i.e. den*i > den*n - n*num via
    cross-multiplication, no float thresholds, no data-dependent scalar
    collection, one per-conversation window (the engine's standard
    shuffle shape).
    """
    w = (
        Window.partitionBy(cfg.key_col)
        .orderBy(*[F.col(c) for c in cfg.order_cols])
    )
    i = F.row_number().over(w)
    n = F.count(F.lit(1)).over(
        Window.partitionBy(cfg.key_col).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    tagged = df.withColumn("_i", i.cast("long")).withColumn("_n", n.cast("long"))
    # n_test = ceil(n*num/den) via exact integer DIV; t0 = n - n_test
    num, den, emb = int(test_frac_num), int(test_frac_den), int(embargo_turns)
    t0 = F.expr(f"_n - ((_n * {num} + {den} - 1) div {den})")
    split = (
        F.when(F.col("_i") > t0, F.lit("test"))
        .when(F.col("_i") > t0 - emb, F.lit("embargo"))
        .otherwise(F.lit("train"))
    )
    return tagged.withColumn(split_col, split).drop("_i", "_n")
