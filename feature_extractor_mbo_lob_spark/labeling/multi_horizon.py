"""Multi-horizon TLOB labels with per-horizon threshold strategies
(reference: src/labeling/multi_horizon.rs:993-1089; ThresholdStrategy enum
at 68-181: Fixed / Quantile{target_prop} / TlobDynamic{divisor}).

Quantile and TlobDynamic are two-pass: the threshold statistic is computed
over the whole key partition (an unbounded window — no extra shuffle, it
reuses the same partitioning), then rows are classified against it. At
cluster scale this stays a single Window stage per horizon; all horizons
share one sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators import ordering


def multi_horizon_labels(
    df: DataFrame,
    cfg: PipelineConfig,
    price_col: str = "p",
    k: int | None = None,
    horizons: tuple[int, ...] | None = None,
    strategy: str = "fixed",        # fixed | quantile | tlob_dynamic
    theta: float | None = None,      # fixed
    target_prop: float = 0.33,       # quantile: target share of +/- classes
    divisor: float = 2.0,            # tlob_dynamic: avg(|l|)/divisor
) -> DataFrame:
    """Adds label_h{h} (tinyint) and pct_change_h{h} per horizon."""
    k = cfg.labels.smoothing_k if k is None else k
    horizons = cfg.labels.horizons if horizons is None else horizons
    theta = cfg.labels.threshold if theta is None else theta
    p = F.col(price_col)
    part = Window.partitionBy(cfg.key_col)

    for h in horizons:
        back = ordering.forward(cfg, -k, 0)
        fwd = ordering.forward(cfg, h - k, h)
        w_minus, w_plus = F.avg(p).over(back), F.avg(p).over(fwd)
        complete = (
            (F.count(p).over(back) == k + 1)
            & (F.count(p).over(fwd) == k + 1)
            & (w_minus != 0)
        )
        l = F.when(complete, (w_plus - w_minus) / w_minus)
        df = df.withColumn(f"pct_change_h{h}", l.cast("double"))

        if strategy == "fixed":
            thr = F.lit(theta)
        elif strategy == "quantile":
            # threshold s.t. ~target_prop of rows land in each of +1/-1
            # (reference: multi_horizon.rs:833-900)
            thr = F.percentile(
                F.abs(F.col(f"pct_change_h{h}")), F.lit(1.0 - 2.0 * target_prop)
            ).over(part)
        elif strategy == "tlob_dynamic":
            # (reference: multi_horizon.rs:934-960)
            thr = F.avg(F.abs(F.col(f"pct_change_h{h}"))).over(part) / F.lit(divisor)
        else:
            raise ValueError(f"unknown threshold strategy {strategy}")

        lc = F.col(f"pct_change_h{h}")
        df = df.withColumn(
            f"label_h{h}",
            F.when(lc.isNull(), F.lit(None))
            .when(lc > thr, F.lit(1))
            .when(lc < -thr, F.lit(-1))
            .otherwise(F.lit(0))
            .cast("tinyint"),
        )
    return df


def intersect_valid(df: DataFrame, horizons: tuple[int, ...]) -> DataFrame:
    """Keep rows labeled at EVERY horizon — the BTreeSet intersection of
    reference alignment (src/export_aligned/alignment.rs:64-132), expressed
    as a conjunction of not-null filters instead of H joins."""
    cond = None
    for h in horizons:
        c = F.col(f"label_h{h}").isNotNull()
        cond = c if cond is None else (cond & c)
    return df.filter(cond)
