"""Privacy-risk audits for training-data release: k-anonymity and
l-diversity (Sweeney 2002; Machanavajjhala et al. 2007 — public methods).

A curated corpus that ships quasi-identifier columns (event type, day,
coarse value bands) can still re-identify users if some QI equivalence
class is tiny (k-anonymity) or maps to a single sensitive value
(l-diversity). These audits compute both risk profiles as exact-integer
aggregates — the release gate a privacy review runs before any export,
sitting alongside the PII redaction pass (functions/pii.py) and the
right-to-be-forgotten tombstone audit.

Scale shape: one groupBy(QI class) collapses the corpus to the class
frame, then a 1-row summary aggregate — two shuffles at any corpus size,
no global sort, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def qi_classes(
    df: DataFrame,
    qi_cols: list,
    sensitive_col: str,
) -> DataFrame:
    """One row per quasi-identifier equivalence class: class size k and
    sensitive-value diversity l (exact distinct count — the class frame
    is the reduced side, so exactness is affordable; at extreme QI
    cardinality swap in approx_count_distinct and re-verify)."""
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.countDistinct(sensitive_col).cast("long").alias("l"),
    )


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list,
    sensitive_col: str,
    k_threshold: int = 10,
    l_threshold: int = 3,
) -> DataFrame:
    """One-row release-gate summary over the QI class frame: class count,
    worst-case k and l, and the exposure mass below each threshold
    (rows living in classes with k < k_threshold; classes with
    l < l_threshold). All exact int64 — a pass/fail gate any engine
    reproduces bit-identically."""
    cls = qi_classes(df, qi_cols, sensitive_col)
    return cls.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("k").cast("long").alias("min_k"),
        F.min("l").cast("long").alias("min_l"),
        F.sum(F.when(F.col("k") < k_threshold, F.col("k")).otherwise(0))
        .cast("long").alias("rows_below_k"),
        F.sum(F.when(F.col("k") < k_threshold, 1).otherwise(0))
        .cast("long").alias("classes_below_k"),
        F.sum(F.when(F.col("l") < l_threshold, 1).otherwise(0))
        .cast("long").alias("classes_below_l"),
        F.sum("k").cast("long").alias("n_rows"),
    )
