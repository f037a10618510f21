"""Opportunity labeling (reference: src/labeling/opportunity.rs:584-619;
conflict priority src/export/config/labels.rs:111-124).

Over forward frame p[t+1..t+h]:
    up_ret   = max(p)/p_t - 1
    down_ret = min(p)/p_t - 1
    BigUp   if up_ret   >  up_threshold
    BigDown if down_ret < -down_threshold
    conflict (both) resolved by priority: larger_magnitude | up | down | ambiguous
Encoded: 1=BigUp, -1=BigDown, 0=None, NULL=incomplete frame (2=Ambiguous).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators import ordering


def opportunity_labels(
    df: DataFrame,
    cfg: PipelineConfig,
    price_col: str = "p",
    h: int | None = None,
    up_threshold: float = 0.02,
    down_threshold: float = 0.02,
    conflict: str = "larger_magnitude",   # larger_magnitude | up | down | ambiguous
    out_prefix: str = "opp",
) -> DataFrame:
    h = cfg.labels.horizon if h is None else h
    p = F.col(price_col)
    fwd = ordering.forward(cfg, 1, h)
    complete = (F.count(p).over(fwd) == h) & (p != 0)

    up_ret = F.when(complete, F.max(p).over(fwd) / p - 1.0)
    down_ret = F.when(complete, F.min(p).over(fwd) / p - 1.0)
    big_up = up_ret > up_threshold
    big_down = down_ret < -down_threshold

    if conflict == "larger_magnitude":
        both = F.when(up_ret > F.abs(down_ret), F.lit(1)).otherwise(F.lit(-1))
    elif conflict == "up":
        both = F.lit(1)
    elif conflict == "down":
        both = F.lit(-1)
    elif conflict == "ambiguous":
        both = F.lit(2)
    else:
        raise ValueError(f"unknown conflict priority {conflict}")

    label = (
        F.when(big_up & big_down, both)
        .when(big_up, F.lit(1))
        .when(big_down, F.lit(-1))
        .otherwise(F.lit(0))
    ).cast("tinyint")

    return (
        df.withColumn(f"{out_prefix}_up_ret", F.when(complete, up_ret).cast("double"))
        .withColumn(f"{out_prefix}_down_ret", F.when(complete, down_ret).cast("double"))
        .withColumn(f"{out_prefix}_label", F.when(complete, label))
    )
