"""Magnitude (regression) labeling (reference: src/labeling/magnitude.rs:141-151,
405-520): point return at horizon, max/min return over horizon, dominant
(larger-magnitude) return."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators import ordering


def magnitude_labels(
    df: DataFrame,
    cfg: PipelineConfig,
    price_col: str = "p",
    h: int | None = None,
    out_prefix: str = "mag",
) -> DataFrame:
    h = cfg.labels.horizon if h is None else h
    p = F.col(price_col)
    w = ordering.stable_window(cfg)
    fwd = ordering.forward(cfg, 1, h)
    complete = (F.count(p).over(fwd) == h) & (p != 0)

    point = F.when(complete, (F.lead(p, h).over(w) - p) / p)
    max_ret = F.when(complete, F.max(p).over(fwd) / p - 1.0)
    min_ret = F.when(complete, F.min(p).over(fwd) / p - 1.0)
    dominant = F.when(F.abs(max_ret) >= F.abs(min_ret), max_ret).otherwise(min_ret)

    return (
        df.withColumn(f"{out_prefix}_point_return", F.when(complete, point).cast("double"))
        .withColumn(f"{out_prefix}_max_return", F.when(complete, max_ret).cast("double"))
        .withColumn(f"{out_prefix}_min_return", F.when(complete, min_ret).cast("double"))
        .withColumn(f"{out_prefix}_dominant_return", F.when(complete, dominant).cast("double"))
    )
