"""Generic walk-the-book market-impact operator over array columns.

Reference: estimate_impact_internal (src/features/market_impact.rs:128-230):
walk price levels in order, fill min(remaining, size) at each, then derive
VWAP / slippage / fill ratio. Transcripts carry no book levels, so the
engine exposes the walk as a GENERIC operator over any pair of
(prices array<double>, sizes array<double>) columns — one JVM-side
``aggregate`` higher-order function with a struct accumulator, zero UDFs,
zero shuffles (pure per-row projection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def walk_the_book(
    df: DataFrame,
    prices_col: str = "prices",
    sizes_col: str = "sizes",
    quantity_col: str = "quantity",
    is_sell: bool = False,
    out_prefix: str = "wtb",
) -> DataFrame:
    """Adds {prefix}_vwap, _best_price, _slippage, _slippage_bps,
    _levels_consumed, _filled_qty, _fill_ratio, _total_cost, _can_fill.

    Semantics (mirrors market_impact.rs):
    * best_price = price of the first level with price > 0 and size > 0
      (NULL when no valid level — the ref's missing-best default);
    * walk levels in array order while remaining > 0, skipping invalid
      levels; fill_at_level = min(remaining, size);
    * vwap = total_cost / filled (best_price when nothing filled);
    * slippage = best - vwap when selling, vwap - best when buying;
    * quantity == 0 => vwap = best, fill_ratio = 1, can_fill = true.
    """
    q = F.col(quantity_col).cast("double")
    levels = F.zip_with(
        F.col(prices_col), F.col(sizes_col), lambda p, s: F.struct(p.alias("p"), s.alias("s"))
    )
    valid = F.filter(levels, lambda x: (x["p"] > 0) & (x["s"] > 0))
    best = F.element_at(valid, 1)["p"]

    init = F.struct(
        q.alias("rem"),
        F.lit(0.0).alias("cost"),
        F.lit(0.0).alias("filled"),
        F.lit(0).alias("lv"),
    )

    def step(acc: Column, x: Column) -> Column:
        take = F.when(acc["rem"] > 0, F.least(acc["rem"], x["s"])).otherwise(F.lit(0.0))
        return F.struct(
            (acc["rem"] - take).alias("rem"),
            (acc["cost"] + x["p"] * take).alias("cost"),
            (acc["filled"] + take).alias("filled"),
            (acc["lv"] + F.when(acc["rem"] > 0, F.lit(1)).otherwise(F.lit(0))).alias("lv"),
        )

    acc = F.aggregate(valid, init, step)
    vwap = F.when(acc["filled"] > 0, acc["cost"] / acc["filled"]).otherwise(best)
    slippage = (best - vwap) if is_sell else (vwap - best)
    slip_bps = F.when(best > 0, slippage / best * 10000.0).otherwise(F.lit(0.0))
    fill_ratio = F.when(q > 0, acc["filled"] / q).otherwise(F.lit(1.0))

    px = out_prefix
    return df.select(
        "*",
        best.cast("double").alias(f"{px}_best_price"),
        vwap.cast("double").alias(f"{px}_vwap"),
        slippage.cast("double").alias(f"{px}_slippage"),
        slip_bps.cast("double").alias(f"{px}_slippage_bps"),
        acc["lv"].cast("int").alias(f"{px}_levels_consumed"),
        acc["filled"].cast("double").alias(f"{px}_filled_qty"),
        fill_ratio.cast("double").alias(f"{px}_fill_ratio"),
        acc["cost"].cast("double").alias(f"{px}_total_cost"),
        (acc["rem"] <= 0).cast("int").alias(f"{px}_can_fill"),
    )
