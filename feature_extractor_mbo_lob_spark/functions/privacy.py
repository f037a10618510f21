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


def randomized_response(
    df: DataFrame,
    bit_col: str,
    id_col: str = "user_id",
    group_col: str | None = None,
    salt: str = "rr",
) -> DataFrame:
    """Warner randomized response (JASA 1965) — the classic local-DP
    release for a sensitive binary attribute, fully deterministic here
    via keyed md5 coins so the mechanism is replayable and oracle-exact.

    Each unit reports its TRUE bit with probability 2/3, else a fair
    coin: coin1 = md5(id||salt1) mod 3 (0 => lie), coin2 = md5(id||salt2)
    mod 2. The reported sum is then debiased: E[sum_r] = (2/3)T + n/6,
    so T_hat = (6*sum_r - n) / 4, clamped at 0 before the floor division
    (negative operands floor differently across engines). The released
    row carries only (n, sum_reports, est_true, est_rate_ppm) — the
    per-unit reports never leave the aggregation, which is the entire
    point of the mechanism: the collector itself only ever sees noisy
    bits (epsilon = ln 5 local DP: P[report=1|b=1]/P[report=1|b=0] =
    (5/6)/(1/6)).

    Scale shape: one partial-aggregable groupBy over ``group_col`` (or a
    global 1-row aggregate) — map-side combine does all the work; no
    joins, no sort, no skew exposure.

    Returns ``DataFrame[group?, n: long, sum_reports: long,
    est_true: long, est_rate_ppm: long]``.
    """
    from .corpus import md5_bucket

    sid = F.col(id_col).cast("string")
    truth = F.col(bit_col).cast("int")
    lie = md5_bucket(F.concat(sid, F.lit(f":{salt}1")), 3) == 0
    coin = md5_bucket(F.concat(sid, F.lit(f":{salt}2")), 2).cast("int")
    report = F.when(lie, coin).otherwise(truth)
    base = df.select(
        *( [F.col(group_col)] if group_col else [] ),
        report.alias("_r"),
    )
    keys = [group_col] if group_col else []
    agg = (base.groupBy(*keys) if keys else base.groupBy()).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_r").cast("long").alias("sum_reports"),
    )
    est = F.expr("greatest(6 * sum_reports - n, 0) div 4")
    return agg.select(
        *keys,
        "n",
        "sum_reports",
        est.cast("long").alias("est_true"),
        F.expr("(greatest(6 * sum_reports - n, 0) * 250000) div n")
        .cast("long")
        .alias("est_rate_ppm"),
    )


def dp_histogram(
    df: DataFrame,
    key_cols: list[str],
    epsilon_micro: int = 1_000_000,
    salt: str = "dp",
) -> DataFrame:
    """eps-DP histogram release via the Laplace mechanism (Dwork 2006):
    per-cell count + Lap(delta/eps) noise, delta = 1 for disjoint-cell
    counting queries. Fully DETERMINISTIC here — the noise draw is a
    keyed md5 uniform pushed through the exact inverse CDF — so the
    release is replayable and oracle-exact. That determinism is a
    TEST-HARNESS property, not a privacy property: an adversary who
    knows the salt can invert the noise, so a production release must
    swap the md5 coin for a real entropy source (the mechanism, scale
    shape and quantization are unchanged — same contract as
    randomized_response's keyed coins).

    Engine-exact noise: h = first 7 hex digits of md5(salt||cell key)
    as an integer in [0, 16^7); u = (h + 0.5)/16^7 - 0.5 in (-0.5, 0.5)
    (never hits the poles, so ln never sees 0); noise = -b * sign(u) *
    ln(1 - 2|u|) with b = 1e6/epsilon_micro — every step is the SAME
    fixed-order IEEE expression on the same exact integer h in both
    engines, quantized once to milli units. Released row: key cols +
    noisy_milli (noisy count x 1000, may be negative — standard for an
    unbiased DP release) + epsilon_micro. The TRUE count never appears
    in the output.

    Scale: ONE map-side-combinable groupBy; the noise is a shuffle-free
    projection on the groups frame. No joins, no window, no skew
    exposure beyond the count itself.
    """
    cnt = df.groupBy(*key_cols).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    keystr = F.concat_ws(
        "", F.lit(salt), *[F.col(k).cast("string") for k in key_cols]
    )
    h = F.conv(F.substring(F.md5(keystr), 1, 7), 16, 10).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(16 ** 7)) - F.lit(0.5)
    b = F.lit(1_000_000.0 / float(epsilon_micro))
    noise = -b * F.signum(u) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    return cnt.select(
        *key_cols,
        (
            F.col("_n") * 1000
            + F.floor(noise * F.lit(1000.0) + F.lit(0.5)).cast("long")
        ).alias("noisy_milli"),
        F.lit(int(epsilon_micro)).cast("long").alias("epsilon_micro"),
    )
