"""DeepLOB labeling (reference: src/labeling/deeplob.rs:77-90, 216-257).

Method 1: l = (avg(p[t+1..t+k]) - p_t) / p_t
Method 2: l = (m_plus - m_minus) / m_minus with
          m_minus = avg(p[t-k+1..t]), m_plus = avg(p[t+1..t+k])
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators import ordering


def deeplob_labels(
    df: DataFrame,
    cfg: PipelineConfig,
    price_col: str = "p",
    k: int = 5,
    theta: float = 0.002,
    method: int = 1,
    out_prefix: str = "dl_label",
) -> DataFrame:
    p = F.col(price_col)
    fwd = ordering.forward(cfg, 1, k)
    m_plus = F.avg(p).over(fwd)
    n_plus = F.count(p).over(fwd)

    if method == 1:
        complete = (n_plus == k) & (p != 0)
        l = F.when(complete, (m_plus - p) / p)
    elif method == 2:
        back = ordering.forward(cfg, -(k - 1), 0)
        m_minus = F.avg(p).over(back)
        n_minus = F.count(p).over(back)
        complete = (n_plus == k) & (n_minus == k) & (m_minus != 0)
        l = F.when(complete, (m_plus - m_minus) / m_minus)
    else:
        raise ValueError(f"unknown DeepLOB method {method}")

    label = (
        F.when(l > theta, F.lit(1)).when(l < -theta, F.lit(-1)).otherwise(F.lit(0))
    ).cast("tinyint")
    return df.withColumn(
        f"{out_prefix}_pct_change", F.when(complete, l).cast("double")
    ).withColumn(out_prefix, F.when(complete, label))
