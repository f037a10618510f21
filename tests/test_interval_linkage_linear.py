"""Tests for bucket-grid interval joins, Fellegi-Sunter linkage, exact OLS,
and cohort retention — each checked against a naive in-Spark or pure-Python
reference on small deterministic data."""

import pytest
from pyspark.sql import functions as F

from feature_extractor_mbo_lob_spark.functions.linear import ols2_fit_predict
from feature_extractor_mbo_lob_spark.operators.interval import (
    interval_overlap_join,
    point_in_interval_join,
    session_intervals,
)
from feature_extractor_mbo_lob_spark.operators.linkage import (
    FieldWeight,
    fellegi_sunter,
)
from feature_extractor_mbo_lob_spark.operators.sequence import cohort_retention


def _pairs(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def intervals(spark):
    rows = [
        # (iv_id, start, end) — varied widths incl. multi-bucket spans
        (0, 100, 250),
        (1, 240, 260),
        (2, 0, 1000),     # spans the whole grid
        (3, 500, 500),    # empty: must match nothing
        (4, 990, 1500),
        (5, 300, 301),    # single-unit
    ]
    return spark.createDataFrame(rows, "iv_id long, start_us long, end_us long")


@pytest.fixture(scope="module")
def points(spark):
    rows = [(i, v) for i, v in enumerate([0, 99, 100, 249, 250, 255, 300, 500, 999, 1000, 1499, 1500])]
    return spark.createDataFrame(rows, "pt_id long, ts_us long")


@pytest.mark.parametrize("bucket", [1, 7, 100, 1000, 10_000])
def test_point_in_interval_matches_naive(spark, intervals, points, bucket):
    got = point_in_interval_join(
        points, intervals, point_col="ts_us", bucket_width=bucket
    )
    naive = points.join(
        intervals,
        (F.col("start_us") <= F.col("ts_us")) & (F.col("ts_us") < F.col("end_us")),
    )
    assert _pairs(got, ["pt_id", "iv_id"]) == _pairs(naive, ["pt_id", "iv_id"])


@pytest.mark.parametrize("bucket", [1, 7, 100, 1000, 10_000])
def test_interval_overlap_matches_naive_and_is_duplicate_free(spark, intervals, bucket):
    left = intervals.select(
        F.col("iv_id").alias("l_id"),
        F.col("start_us").alias("l_start_us"),
        F.col("end_us").alias("l_end_us"),
    )
    right = intervals.select(
        F.col("iv_id").alias("r_id"),
        F.col("start_us").alias("r_start_us"),
        F.col("end_us").alias("r_end_us"),
    )
    got = interval_overlap_join(left, right, bucket_width=bucket)
    # half-open semantics: an empty interval [x, x) overlaps nothing, so the
    # naive reference applies the same non-empty precondition
    naive = left.filter(F.col("l_end_us") > F.col("l_start_us")).join(
        right.filter(F.col("r_end_us") > F.col("r_start_us")),
        (F.col("l_start_us") < F.col("r_end_us"))
        & (F.col("r_start_us") < F.col("l_end_us")),
    )
    g = _pairs(got, ["l_id", "r_id"])
    assert g == _pairs(naive, ["l_id", "r_id"])
    assert len(g) == len(set(g))  # owner-bucket rule: no duplicates at any width


def test_session_intervals_shape(transcripts):
    iv = session_intervals(transcripts, gap_us=600_000_000, pad_us=1_000_000)
    rows = iv.collect()
    assert all(r.end_us > r.start_us for r in rows)
    # session ids dense from 0 per conversation
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r.session_id)
    for sids in by_conv.values():
        assert sorted(sids) == list(range(len(sids)))


def test_fellegi_sunter_scores_and_blocking(spark):
    a = spark.createDataFrame(
        [(1, "ann", "x", 10), (2, "bob", "y", 20), (3, "cat", "x", 30)],
        "a_key long, a_name string, a_seg string, a_bal long",
    ).withColumn("a_block", F.substring("a_name", 1, 1))
    b = spark.createDataFrame(
        [(11, "ann", "x", 10), (12, "bea", "y", 20), (13, "dog", "x", 30)],
        "b_key long, b_name string, b_seg string, b_bal long",
    ).withColumn("b_block", F.substring("b_name", 1, 1))
    fields = [
        FieldWeight("name", "a_name", "b_name", 10, -5),
        FieldWeight("seg", "a_seg", "b_seg", 3, -2),
        FieldWeight("bal", "a_bal", "b_bal", 4, -1),
    ]
    out = fellegi_sunter(a, b, "a_block", "b_block", fields, t_link_nanos=15, t_possible_nanos=0)
    got = {(r.a_key, r.b_key): (r.score_nanos, r.decision) for r in out.collect()}
    # only blocks 'a' (ann~ann) and 'b' (bob~bea) produce candidate pairs;
    # cat blocks with nothing ('c' vs 'd')
    assert got == {
        (1, 11): (10 + 3 + 4, "link"),
        (2, 12): (-5 + 3 + 4, "possible"),
    }


def test_ols_exact_solution_on_known_plane(spark):
    # y = 7 + 3*x1 - 2*x2 exactly -> residuals are 0 and yhat == y
    rows = [(i, 7 + 3 * x1 - 2 * x2, x1, x2)
            for i, (x1, x2) in enumerate([(0, 0), (1, 0), (0, 1), (2, 3), (5, 1), (4, 4)])]
    df = spark.createDataFrame(rows, "id long, y long, x1 long, x2 long")
    out = ols2_fit_predict(df, "y", "x1", "x2")
    res = out.select(
        "id", "y",
        (F.col("yhat_num").cast("double") / F.col("det_d").cast("double")).alias("yhat"),
    ).collect()
    for r in res:
        assert abs(r.yhat - r.y) < 1e-9


def test_cohort_retention_small(spark):
    us = 1_000_000
    week = 7 * 86_400 * us

    def ts(wk, off=0):
        return (wk * week + off) // us  # seconds

    rows = []
    # users 1,2 first seen week 0; user 1 returns week 1; user 3 first seen week 1
    for u, wk in [(1, 0), (2, 0), (1, 1), (3, 1), (1, 0), (2, 2)]:
        rows.append((u, ts(wk, 3600 * us)))
    df = spark.createDataFrame(rows, "user_id long, sec long").select(
        "user_id", F.timestamp_seconds("sec").alias("ts")
    )
    out = cohort_retention(df, "user_id", "ts")
    got = {(r.cohort_bucket, r.bucket_offset): (r.n_active, r.retention_ppm)
           for r in out.collect()}
    assert got == {
        (0, 0): (2, 1_000_000),
        (0, 1): (1, 500_000),
        (0, 2): (1, 500_000),
        (1, 0): (1, 1_000_000),
    }
