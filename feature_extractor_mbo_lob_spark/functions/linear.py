"""Exact distributed OLS (2 regressors + intercept): fit by integer
normal equations, score by broadcast — the canonical "train on
aggregates, predict everywhere" pattern.

Fitting a linear model at 100 TB never moves the data: the normal
equations X'X b = X'y need only NINE sums, and when the features are
integers those sums are exact int64 map-side-combined partials (one
aggregate row off a full scan). The 3x3 solve is Cramer's rule written
as explicit determinant expressions over decimal(38,0) (DuckDB twin:
HUGEINT) — every determinant is an exact integer in BOTH engines, so
the fitted coefficients are the same rational numbers D_i / D
everywhere, with none of the iterative-solver nondeterminism that makes
distributed GD fits unreproducible.

Scoring is the broadcast: the single moments row cross-joins onto the
scoring scan (Catalyst plans BroadcastNestedLoopJoin over 1 row =
free), and yhat = (D0 + D1*x1 + D2*x2) / D is evaluated as one exact
decimal numerator divided by one exact decimal denominator — the only
float op in the whole operator is that final division, canonicalized
by the caller with _r6x.

Magnitude budget: with |x| <= 1e4 and n <= 1e6 rows the moment sums fit
in 11 digits, triple products in 33, and D1*x1 in 37 — inside
decimal(38,0)/HUGEINT. Callers with wider features should pre-scale
(integer DIV) the regressors.

Reference parity: the reference has no model fitting; this is the
training-data-pipeline companion to labeling/ (a leakage-free baseline
fit over the same point-in-time features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def ols2_fit_predict(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
) -> DataFrame:
    """Adds exact-rational OLS prediction columns to df.

    Requires integer-valued y, x1, x2 (cast to long internally).
    Output columns: yhat_num (decimal numerator), det_d (decimal
    denominator, the X'X determinant), shared by every row. Callers emit
    yhat = num/den as a canonicalized double. Assumes the design matrix
    is non-singular (det != 0) — guaranteed unless a regressor is
    constant or the two regressors are exactly collinear.
    """
    x1 = F.col(x1_col).cast("long")
    x2 = F.col(x2_col).cast("long")
    y = F.col(y_col).cast("long")
    m = df.agg(
        F.count(F.lit(1)).cast("long").alias("m_n"),
        F.sum(x1).alias("m_sx1"),
        F.sum(x2).alias("m_sx2"),
        F.sum(x1 * x1).alias("m_sx11"),
        F.sum(x1 * x2).alias("m_sx12"),
        F.sum(x2 * x2).alias("m_sx22"),
        F.sum(y).alias("m_sy"),
        F.sum(x1 * y).alias("m_sx1y"),
        F.sum(x2 * y).alias("m_sx2y"),
    )
    out = df.crossJoin(F.broadcast(m))

    def d(name):
        return F.col(name).cast(_DEC)

    n, sx1, sx2 = d("m_n"), d("m_sx1"), d("m_sx2")
    sx11, sx12, sx22 = d("m_sx11"), d("m_sx12"), d("m_sx22")
    sy, sx1y, sx2y = d("m_sy"), d("m_sx1y"), d("m_sx2y")

    def det3(a, b, c, p, q, r, u, v, w):
        return a * (q * w - r * v) - b * (p * w - r * u) + c * (p * v - q * u)

    det_d = det3(n, sx1, sx2, sx1, sx11, sx12, sx2, sx12, sx22)
    det_0 = det3(sy, sx1, sx2, sx1y, sx11, sx12, sx2y, sx12, sx22)
    det_1 = det3(n, sy, sx2, sx1, sx1y, sx12, sx2, sx2y, sx22)
    det_2 = det3(n, sx1, sy, sx1, sx11, sx1y, sx2, sx12, sx2y)

    return out.withColumn(
        "yhat_num",
        det_0
        + det_1 * F.col(x1_col).cast("long").cast(_DEC)
        + det_2 * F.col(x2_col).cast("long").cast(_DEC),
    ).withColumn("det_d", det_d).drop(
        "m_n", "m_sx1", "m_sx2", "m_sx11", "m_sx12", "m_sx22",
        "m_sy", "m_sx1y", "m_sx2y",
    )
