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


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Python // floors, which
    disagrees with Spark decimal ``div`` and DuckDB hugeint ``//`` for
    negative numerators — both MEASURED to truncate on this container,
    see operators/similarity.source_centroid_drift). Every driver-side
    weight update uses this so all three arithmetics agree bit-for-bit."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


_MICRO = 1_000_000


def _z_expr(col: str, m: int, s: int) -> str:
    """Standardized feature: (x - mean) * 1e6 div meanAbsDev — exact
    integer, so typical |z| ~ 1e6 and every feature trains at the same
    curvature as the 1e6 intercept lane."""
    return f"(cast({col} as decimal(38,0)) - {m}) * {_MICRO} div {s}"


def _margin_expr(w: list[int], zs: list[str]) -> str:
    return " + ".join(
        f"cast({wj} as decimal(38,0)) * ({z})" for wj, z in zip(w, zs)
    )


def _p_expr(margin: str) -> str:
    return (
        f"least(greatest(500000 + (({margin}) div 4000000000), "
        "cast(0 as decimal(38,0))), cast(1000000 as decimal(38,0)))"
    )


def fit_logistic_probe(
    df: DataFrame,
    y_col: str,
    x_cols: list[str] | tuple[str, ...],
    iterations: int = 6,
    lr_num: int = 1,
    lr_den: int = 1,
) -> dict:
    """Training loop of logistic_probe_fit_predict. Returns
    {"w": nano-int weights [intercept, x1, ...], "m": per-feature integer
    means, "s": per-feature integer mean-abs-deviations}. Driver-side
    state is 3 tiny int lists; per-iteration cost is ONE aggregate-only
    Spark job (map-side combined, no shuffle).

    The (y, x...) integer feature frame is projected, fanned out to the
    session parallelism (a no-op at real scale) and materialized ONCE
    before the count + 2 standardization + ``iterations`` gradient
    actions — without this every one of those 9 actions re-executes the
    caller's full feature lineage (for the registered probe: four
    string-replace scans over the corpus, serialized on a single input
    split). Every training sum is an exact decimal(38,0) integer, so
    partitioning and materialization change nothing bit-wise."""
    from ..operators.skew import fan_out_small_scan

    df = fan_out_small_scan(
        df.select(y_col, *x_cols)
    ).localCheckpoint(eager=True)
    n = df.count()
    if n == 0:
        return {"w": [0] * (len(x_cols) + 1), "m": [0] * len(x_cols), "s": [1] * len(x_cols)}

    # pass 1+2: exact integer standardization moments (trunc division)
    mrow = df.agg(
        *[F.sum(F.col(c).cast(_DEC)).alias(f"m{j}") for j, c in enumerate(x_cols)]
    ).collect()[0]
    m = [_tdiv(int(mrow[f"m{j}"]), n) for j in range(len(x_cols))]
    srow = df.agg(
        *[
            F.sum(F.expr(f"abs(cast({c} as decimal(38,0)) - {m[j]})")).alias(f"s{j}")
            for j, c in enumerate(x_cols)
        ]
    ).collect()[0]
    s = [max(_tdiv(int(srow[f"s{j}"]), n), 1) for j in range(len(x_cols))]

    zs = [f"cast({_MICRO} as decimal(38,0))"] + [
        _z_expr(c, m[j], s[j]) for j, c in enumerate(x_cols)
    ]
    w = [0] * len(zs)
    for _ in range(iterations):
        e = f"{_p_expr(_margin_expr(w, zs))} - cast({y_col} as decimal(38,0)) * {_MICRO}"
        sums = df.agg(
            *[
                F.sum(F.expr(f"({e}) * ({z})")).alias(f"g{j}")
                for j, z in enumerate(zs)
            ]
        ).collect()[0]
        w = [
            wj - _tdiv(int(sums[f"g{j}"]) * lr_num, n * lr_den * 1000)
            for j, wj in enumerate(w)
        ]
    return {"w": w, "m": m, "s": s}


def logistic_probe_fit_predict(
    df: DataFrame,
    y_col: str,
    x_cols: list[str] | tuple[str, ...],
    iterations: int = 6,
    lr_num: int = 1,
    lr_den: int = 1,
) -> DataFrame:
    """Distributed linear quality-probe classifier (the fasttext-style
    filter every corpus-curation pipeline trains: "does this document
    look like the reference class?"), fit by full-batch gradient descent
    on a hard-sigmoid logistic — ENGINE-EXACT, so a DuckDB hugeint twin
    reproduces every score bit-for-bit.

    Model, all integer fixed point. Features standardize exactly first
    (z_j = (x_j - mean_j) * 1e6 div meanAbsDev_j, trunc division — two
    aggregate passes; without this the 1e6 intercept lane dominates the
    curvature and GD rings into the clamps instead of learning —
    measured: acc 0.51 raw vs 0.996 standardized on the length probe).
    Weights live in nano units starting at 0; per iteration:

        margin_raw_i = sum_j w_nano_j * z_ij            (exact dec38)
        p_micro_i    = clamp(5e5 + margin_raw_i div 4e9, 0, 1e6)
        e_i          = p_micro_i - y_i * 1e6
        g_j          = sum_i e_i * z_ij                 (exact dec38)
        w_nano_j    -= trunc_div(g_j * lr_num, n * lr_den * 1000)

    The hard sigmoid clamp(1/2 + m/4, 0, 1) (Collobert 2004's hard-tanh
    sibling, the standard integer-arithmetic stand-in) replaces exp() —
    transcendental libm calls are the one thing two engines never agree
    on; every op above is integer multiply / add / truncated divide,
    identical in Spark decimal(38,0), DuckDB HUGEINT, and the driver's
    Python big-int update (_tdiv).

    Scale shape: training never shuffles — standardization is 2
    aggregate-only scans and each GD iteration is ONE map-side-combinable
    global aggregate (J+1 decimal sums) collected as a single tiny row
    (the two-pass-calibration pattern); scoring is a shuffle-free
    projection with weights/means/scales as plan literals. At 100 TB you
    materialize the integer feature frame once (parquet/cache) and pay
    iterations+3 scans, nothing else. Magnitudes: |z| ~ 1e6 (heavy tails
    bounded by s >= 1), |e| <= 1e6, so per-row gradient terms <= ~1e12
    and weights grow <= lr*1e9/step — far inside decimal(38,0).

    Returns df + columns: p_micro (long, hard-sigmoid score in micro),
    pred (int, p_micro >= 5e5). Reference parity: the reference has no
    model fitting; this is the curation-pipeline companion to the
    gopher/perplexity filters (train a reference-class probe, score the
    corpus, gate on p_micro).
    """
    fit = fit_logistic_probe(df, y_col, x_cols, iterations, lr_num, lr_den)
    zs = [f"cast({_MICRO} as decimal(38,0))"] + [
        _z_expr(c, fit["m"][j], fit["s"][j]) for j, c in enumerate(x_cols)
    ]
    p = _p_expr(_margin_expr(fit["w"], zs))
    return df.withColumn("p_micro", F.expr(p).cast("long")).withColumn(
        "pred", (F.col("p_micro") >= 500000).cast("int")
    )
