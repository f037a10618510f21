"""Label distribution statistics (reference: src/labeling/mod.rs:414-503).

Class counts, class balance, imbalance ratio, and moments of the underlying
pct-change — a plain grouped aggregation (the reference computes these
per-day; here per label column over any grouping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def label_stats(df: DataFrame, label_col: str = "label",
                change_col: str | None = None) -> DataFrame:
    agg = [F.count(F.lit(1)).alias("n")]
    if change_col is not None:
        agg += [
            F.avg(change_col).alias("change_mean"),
            F.stddev_pop(change_col).alias("change_std"),
        ]
    out = (
        df.filter(F.col(label_col).isNotNull())
        .groupBy(F.col(label_col).cast("int").alias("label"))
        .agg(*agg)
    )
    total = out.agg(F.sum("n").alias("total"))
    return (
        out.crossJoin(F.broadcast(total))
        .withColumn("frac", (F.col("n") / F.col("total")).cast("double"))
        .drop("total")
    )
