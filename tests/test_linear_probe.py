"""Logistic quality probe (functions/linear.logistic_probe_fit_predict):
learning, exactness contracts, edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_extractor_mbo_lob_spark.functions.linear import (
    _tdiv,
    fit_logistic_probe,
    logistic_probe_fit_predict,
)


def test_tdiv_truncates_toward_zero_like_both_engines():
    # Spark decimal `div` and DuckDB hugeint `//` both truncate toward
    # zero (measured, see source_centroid_drift); Python // floors —
    # _tdiv must match the engines, not Python.
    assert _tdiv(7, 2) == 3
    assert _tdiv(-7, 2) == -3          # Python -7 // 2 == -4
    assert _tdiv(7, -2) == -3
    assert _tdiv(-7, -2) == 3
    assert _tdiv(0, 5) == 0


def test_probe_learns_separable_class(spark):
    # y is a threshold on x1; x2 is noise. The probe must separate.
    rows = [(i, 1 if i % 97 >= 50 else 0, (i % 97) * 10_000, (i * 37 % 11) * 90_000)
            for i in range(400)]
    df = spark.createDataFrame(rows, "id long, y int, x1 long, x2 long")
    out = logistic_probe_fit_predict(df, "y", ["x1", "x2"]).collect()
    acc = sum(1 for r in out if r["pred"] == r["y"]) / len(out)
    assert acc >= 0.95, acc
    # scores actually separate, not just tie-break
    hi = [r["p_micro"] for r in out if r["y"] == 1]
    lo = [r["p_micro"] for r in out if r["y"] == 0]
    assert sum(hi) / len(hi) > sum(lo) / len(lo) + 200_000


def test_probe_weights_signs_and_standardization(spark):
    rows = [(i, 1 if i % 97 >= 50 else 0, (i % 97) * 10_000, (i * 37 % 11) * 90_000)
            for i in range(400)]
    df = spark.createDataFrame(rows, "id long, y int, x1 long, x2 long")
    fit = fit_logistic_probe(df, "y", ["x1", "x2"])
    # signal feature gets a positive weight, much larger than noise's
    assert fit["w"][1] > 0
    assert fit["w"][1] > abs(fit["w"][2]) * 3
    # standardization moments are exact trunc-div integers
    xs1 = [(i % 97) * 10_000 for i in range(400)]
    m1 = _tdiv(sum(xs1), 400)
    assert fit["m"][0] == m1
    assert fit["s"][0] == max(_tdiv(sum(abs(x - m1) for x in xs1), 400), 1)


def test_probe_empty_and_constant_inputs(spark):
    empty = spark.createDataFrame([], "id long, y int, x1 long")
    fit = fit_logistic_probe(empty, "y", ["x1"])
    assert fit == {"w": [0, 0], "m": [0], "s": [1]}
    assert logistic_probe_fit_predict(empty, "y", ["x1"]).count() == 0
    # constant feature => meanAbsDev clamps to 1, no divide-by-zero
    const = spark.createDataFrame([(i, i % 2, 5) for i in range(20)],
                                  "id long, y int, x1 long")
    out = logistic_probe_fit_predict(const, "y", ["x1"])
    assert out.count() == 20
