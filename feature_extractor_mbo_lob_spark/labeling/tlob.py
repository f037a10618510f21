"""TLOB trend labeling (reference: src/labeling/tlob.rs:215-308).

Over the per-key ordered scalar timeline p:
    w_minus = avg(p[t-k .. t])        (trailing smoother, k+1 points)
    w_plus  = avg(p[t+h-k .. t+h])    (leading smoother ending at horizon)
    l       = (w_plus - w_minus) / w_minus
    label   = 1 if l > theta, -1 if l < -theta, else 0

A row is valid only when BOTH smoother frames are complete (the reference
restricts t to [k, T-h-k), min_prices = 2k+h+1, src/labeling/mod.rs:358-361);
incomplete rows get label NULL so downstream alignment drops them via inner
join. Labels are tinyint per the i8 export (npy_export.rs:71).

This is pure lead/forward-frame window algebra — zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators import ordering


def tlob_labels(
    df: DataFrame,
    cfg: PipelineConfig,
    price_col: str = "p",
    k: int | None = None,
    h: int | None = None,
    theta: float | None = None,
    out_prefix: str = "label",
) -> DataFrame:
    """Adds {out_prefix} (tinyint, NULL when frames incomplete) and
    {out_prefix}_pct_change (double)."""
    k = cfg.labels.smoothing_k if k is None else k
    h = cfg.labels.horizon if h is None else h
    theta = cfg.labels.threshold if theta is None else theta
    p = F.col(price_col)

    back = ordering.forward(cfg, -k, 0)
    fwd = ordering.forward(cfg, h - k, h)

    w_minus = F.avg(p).over(back)
    w_plus = F.avg(p).over(fwd)
    n_minus = F.count(p).over(back)
    n_plus = F.count(p).over(fwd)
    complete = (n_minus == k + 1) & (n_plus == k + 1) & (w_minus != 0)

    l = F.when(complete, (w_plus - w_minus) / w_minus)
    label = (
        F.when(l > theta, F.lit(1)).when(l < -theta, F.lit(-1)).otherwise(F.lit(0))
    ).cast("tinyint")

    return df.withColumn(
        f"{out_prefix}_pct_change", F.when(complete, l).cast("double")
    ).withColumn(out_prefix, F.when(complete, label))
