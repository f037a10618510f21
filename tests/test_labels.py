"""Label operators vs hand computations and a brute-force python oracle."""

import datetime as dt

import pytest
from pyspark.sql import Row

from feature_extractor_mbo_lob_spark.config import LabelConfig, PipelineConfig
from feature_extractor_mbo_lob_spark.labeling import (
    deeplob_labels,
    magnitude_labels,
    multi_horizon_labels,
    opportunity_labels,
    tlob_labels,
    triple_barrier_labels,
)

T0 = dt.datetime(2024, 1, 1)
PRICES = [100.0, 101.0, 103.0, 102.0, 105.0, 107.0, 104.0, 108.0, 110.0, 109.0]


@pytest.fixture(scope="module")
def series(spark):
    return spark.createDataFrame(
        [
            Row(conv_id="a", turn_idx=i, ts=T0 + dt.timedelta(seconds=i), p=p)
            for i, p in enumerate(PRICES)
        ]
    )


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(labels=LabelConfig(smoothing_k=1, horizon=3, threshold=0.01))


def test_tlob(series, cfg):
    out = {r.turn_idx: r for r in tlob_labels(series, cfg).collect()}
    # t=2: w- = avg(p[1..2]) = 102, w+ = avg(p[4..5]) = 106 -> l = 4/102
    l = (106.0 - 102.0) / 102.0
    assert abs(out[2].label_pct_change - l) < 1e-12
    assert out[2].label == 1
    # incomplete frames -> NULL
    assert out[0].label is None  # w- needs k+1=2 points
    assert out[9].label is None  # forward frame incomplete
    assert out[6].label is not None and out[7].label is None


def test_deeplob_m1(series, cfg):
    out = {r.turn_idx: r for r in deeplob_labels(series, cfg, k=2, theta=0.01).collect()}
    # t=0: avg(p[1..2]) = 102 -> l = 0.02 > 0.01 -> 1
    assert out[0].dl_label == 1
    assert abs(out[0].dl_label_pct_change - 0.02) < 1e-12
    assert out[8].dl_label is None  # needs 2 forward points


def test_multi_horizon_fixed_and_dynamic(series, cfg):
    out = multi_horizon_labels(series, cfg, horizons=(2, 3), strategy="fixed")
    rows = {r.turn_idx: r for r in out.collect()}
    assert rows[1].label_h2 is not None
    assert rows[8].label_h2 is None
    out2 = multi_horizon_labels(series, cfg, horizons=(2,), strategy="tlob_dynamic")
    rows2 = {r.turn_idx: r for r in out2.collect()}
    labeled = [r for r in rows2.values() if r.label_h2 is not None]
    assert len(labeled) > 0


def test_opportunity(series, cfg):
    out = {r.turn_idx: r for r in opportunity_labels(
        series, cfg, h=3, up_threshold=0.03, down_threshold=0.03).collect()}
    # t=1 (p=101): fwd [103,102,105]: up = 105/101-1 = ~0.0396 > 0.03; down = 102/101-1 >0
    assert out[1].opp_label == 1
    assert out[9].opp_label is None


def test_magnitude(series, cfg):
    out = {r.turn_idx: r for r in magnitude_labels(series, cfg, h=3).collect()}
    r = out[0]
    assert abs(r.mag_point_return - (102.0 / 100 - 1)) < 1e-12
    assert abs(r.mag_max_return - (103.0 / 100 - 1)) < 1e-12
    assert abs(r.mag_min_return - (101.0 / 100 - 1)) < 1e-12
    assert out[7].mag_point_return is None


def brute_triple_barrier(prices, pt, sl, h, timeout="label_as_timeout"):
    """Obviously-correct reference loop."""
    n = len(prices)
    out = []
    for t in range(n):
        if t + h > n - 1:
            out.append((None, None, None))
            continue
        entry = prices[t]
        up, lo = entry * (1 + pt), entry * (1 - sl)
        hit = None
        for d in range(1, h + 1):
            px = prices[t + d]
            if px >= up:
                hit = (1, d, px / entry - 1)
                break
            if px <= lo:
                hit = (-1, d, px / entry - 1)
                break
        if hit is None:
            ret = prices[t + h] / entry - 1
            lab = 0 if timeout == "label_as_timeout" else (1 if ret > 0 else -1 if ret < 0 else 0)
            hit = (lab, h, ret)
        out.append(hit)
    return out


def test_triple_barrier_matches_bruteforce(series, cfg):
    got = {r.turn_idx: r for r in triple_barrier_labels(
        series, cfg, profit_take=0.04, stop_loss=0.02, horizon=4).collect()}
    want = brute_triple_barrier(PRICES, 0.04, 0.02, 4)
    for t, (lab, off, ret) in enumerate(want):
        g = got[t]
        if lab is None:
            assert g.tb_label is None
        else:
            assert g.tb_label == lab, (t, g, (lab, off, ret))
            assert g.tb_exit_offset == off
            assert abs(g.tb_exit_return - ret) < 1e-12


def test_triple_barrier_multikey_and_return_sign(spark, cfg):
    prices_b = [50.0, 50.1, 50.2, 50.1, 50.3, 50.2]
    df = spark.createDataFrame(
        [Row(conv_id="a", turn_idx=i, ts=T0 + dt.timedelta(seconds=i), p=p)
         for i, p in enumerate(PRICES)]
        + [Row(conv_id="b", turn_idx=i, ts=T0 + dt.timedelta(seconds=i), p=p)
           for i, p in enumerate(prices_b)]
    )
    got = triple_barrier_labels(df, cfg, profit_take=0.5, stop_loss=0.5, horizon=2,
                                timeout="use_return_sign")
    rows = {(r.conv_id, r.turn_idx): r for r in got.collect()}
    want_a = brute_triple_barrier(PRICES, 0.5, 0.5, 2, "use_return_sign")
    want_b = brute_triple_barrier(prices_b, 0.5, 0.5, 2, "use_return_sign")
    for cid, want in (("a", want_a), ("b", want_b)):
        for t, (lab, off, ret) in enumerate(want):
            g = rows[(cid, t)]
            assert (g.tb_label is None) == (lab is None)
            if lab is not None:
                assert g.tb_label == lab


def test_churn_labels_pit_split(spark):
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark.labeling.churn import churn_labels

    # corpus max day = 2024-01-20; horizon 7 -> cutoff day = 2024-01-13
    rows = [
        # user 1: active pre and post -> churned 0
        (1, "2024-01-02", "purchase", 10.0),
        (1, "2024-01-10", "view", 1.0),
        (1, "2024-01-18", "purchase", 5.0),
        # user 2: pre only -> churned 1
        (2, "2024-01-03", "purchase", 2.5),
        (2, "2024-01-13", "view", 0.0),   # exactly on cutoff -> pre
        # user 3: post only -> EXCLUDED
        (3, "2024-01-19", "purchase", 99.0),
        # user 4 defines the max day
        (4, "2024-01-20", "view", 0.0),
        (4, "2024-01-05", "view", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.user_id: r for r in churn_labels(ev, horizon_days=7).collect()}
    assert set(got) == {1, 2, 4}  # user 3 has no pre-cutoff rows
    u1 = got[1]
    assert (u1.n_events_pre, u1.churned) == (2, 0)
    assert u1.spend_cents_pre == 1000 + 100
    u2 = got[2]
    assert (u2.n_events_pre, u2.active_days_pre, u2.churned) == (2, 2, 1)
    assert u2.recency_days_pre == 0  # last pre event exactly on the cutoff
    # feature window never sees post rows: user 1's post purchase (5.0)
    # is absent from spend_cents_pre
    assert u1.spend_cents_pre == 1100


def test_qini_curve_hand_case(spark):
    from feature_extractor_mbo_lob_spark.functions.evalmetrics import qini_curve

    # 8 units, 2 buckets; score ranks 10..3; treated arm 0
    units = [
        # (id, score, arm, resp)
        (1, 10, 0, 1), (2, 9, 1, 0), (3, 8, 0, 1), (4, 7, 1, 0),
        (5, 6, 0, 0), (6, 5, 1, 1), (7, 4, 0, 0), (8, 3, 1, 1),
    ]
    df = spark.createDataFrame(units, "uid long, s long, arm int, resp long")
    got = {r.bucket: r for r in
           qini_curve(df, "s", "arm", "resp", "uid", n_buckets=2).collect()}
    b1 = got[1]  # top half: units 1-4 -> t: {1,3} resp 2; c: {2,4} resp 0
    assert (b1.n_t, b1.n_c, b1.r_t, b1.r_c) == (2, 2, 2, 0)
    assert b1.qini_micro == 2_000_000  # 2 - 0*2/2
    b2 = got[2]
    assert (b2.cum_n_t, b2.cum_n_c, b2.cum_r_t, b2.cum_r_c) == (4, 4, 2, 2)
    # qini at full depth: 2 - 2*4/4 = 0 -> no net uplift overall
    assert b2.qini_micro == 0
