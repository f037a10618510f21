"""Unit tests: as-of join, ffill/bfill, samplers, interval assignment,
lifecycle pairing, sequences."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from feature_extractor_mbo_lob_spark.config import PipelineConfig
from feature_extractor_mbo_lob_spark.operators import asof, lifecycle, sampling, sequence
from feature_extractor_mbo_lob_spark.sources import TRANSCRIPT_SCHEMA

T0 = dt.datetime(2024, 1, 1)
CFG = PipelineConfig(window_sizes=(4,))


def ts(s):
    return T0 + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        ("a", 0, "user", "hello world", None, ts(0)),
        ("a", 1, "assistant", "hi", "t1", ts(10)),       # invoke t1
        ("a", 2, "tool", "result one", "t1", ts(12)),    # result t1
        ("a", 3, "assistant", "done", "t2", ts(20)),     # invoke t2 (no result)
        ("a", 4, "user", "more", None, ts(30)),
        ("a", 5, "assistant", "go", "t1", ts(40)),       # invoke t1 again
        ("a", 6, "tool", "result two", "t1", ts(45)),    # result t1 #2
        ("b", 0, "user", "solo conversation", None, ts(0)),
    ]
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)


# --- as-of join ---------------------------------------------------------------

def test_asof_backward(spark, turns):
    right = spark.createDataFrame(
        [("a", ts(5), 1.0), ("a", ts(12), 2.0), ("a", ts(45), 3.0)],
        "conv_id string, ts timestamp, v double",
    )
    out = asof.asof_join(turns, right, key="conv_id", ts="ts", value_cols=["v"])
    got = {(r.conv_id, r.turn_idx): r.v_asof for r in out.collect()}
    assert got[("a", 0)] is None          # no right row at/before ts 0
    assert got[("a", 1)] == 1.0
    assert got[("a", 2)] == 2.0           # inclusive at equal ts
    assert got[("a", 4)] == 2.0
    assert got[("a", 6)] == 3.0
    assert got[("b", 0)] is None          # key isolation


def test_asof_forward(spark, turns):
    right = spark.createDataFrame(
        [("a", ts(12), 2.0)], "conv_id string, ts timestamp, v double"
    )
    out = asof.asof_join(turns, right, key="conv_id", ts="ts",
                         value_cols=["v"], direction="forward")
    got = {(r.conv_id, r.turn_idx): r.v_asof for r in out.collect()}
    assert got[("a", 0)] == 2.0
    assert got[("a", 2)] == 2.0           # inclusive
    assert got[("a", 3)] is None


def test_asof_tolerance_backward(spark, turns):
    right = spark.createDataFrame(
        [("a", ts(5), 1.0), ("a", ts(12), 2.0)],
        "conv_id string, ts timestamp, v double",
    )
    out = asof.asof_join(turns, right, key="conv_id", ts="ts",
                         value_cols=["v"], tolerance_s=10.0)
    got = {(r.conv_id, r.turn_idx): r.v_asof for r in out.collect()}
    assert got[("a", 1)] == 1.0           # ts 10, match at 5: delta 5 <= 10
    assert got[("a", 2)] == 2.0           # equal ts: delta 0
    assert got[("a", 3)] == 2.0           # ts 20, match at 12: delta 8
    assert got[("a", 4)] is None          # ts 30, match at 12: delta 18 > 10
    assert got[("a", 6)] is None          # ts 45: delta 33


def test_asof_tolerance_matches_pandas(spark, turns):
    import pandas as pd

    right = spark.createDataFrame(
        [("a", ts(5), 1.0), ("a", ts(12), 2.0), ("a", ts(45), 3.0)],
        "conv_id string, ts timestamp, v double",
    )
    out = asof.asof_join(turns.select("conv_id", "turn_idx", "ts"), right,
                         key="conv_id", ts="ts", value_cols=["v"],
                         tolerance_s=7.0)
    got = (out.toPandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    lp = (turns.select("conv_id", "turn_idx", "ts").toPandas()
          .sort_values("ts").reset_index(drop=True))
    rp = right.toPandas().sort_values("ts").reset_index(drop=True)
    exp = pd.merge_asof(lp, rp, on="ts", by="conv_id",
                        tolerance=pd.Timedelta(seconds=7))
    exp = exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["v_asof"].fillna(-1).tolist() == exp["v"].fillna(-1).tolist()


def test_ffill_bfill(spark, turns):
    sparse = turns.withColumn(
        "x", F.when(F.col("role") == "tool", F.length("text").cast("double"))
    )
    f = {r.turn_idx: r.x_ffill for r in asof.ffill(sparse, CFG, ["x"])
         .filter(F.col("conv_id") == "a").collect()}
    assert f[0] is None and f[1] is None
    assert f[2] == 10.0 and f[3] == 10.0 and f[5] == 10.0
    assert f[6] == 10.0  # "result two" length
    b = {r.turn_idx: r.x_bfill for r in asof.bfill(sparse, CFG, ["x"])
         .filter(F.col("conv_id") == "a").collect()}
    assert b[0] == 10.0 and b[3] == 10.0 and b[6] == 10.0


# --- samplers -----------------------------------------------------------------

def test_event_sampler(turns):
    out = sampling.event_sample_flag(turns, CFG, n=3)
    got = {(r.conv_id, r.turn_idx): r.is_sample for r in out.collect()}
    assert [got[("a", i)] for i in range(7)] == [0, 0, 1, 0, 0, 1, 0]


def test_volume_sampler_cumsum_form(spark):
    rows = [("a", i, "user", "x" * ln, None, ts(i)) for i, ln in
            enumerate([40, 40, 40, 10, 100, 5])]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA).withColumn(
        "char_len", F.length("text").cast("double")
    )
    out = sampling.volume_sample_flag(df, CFG, target=100.0)
    got = [r.is_sample for r in out.orderBy("turn_idx").collect()]
    # cumsum: 40 80 120 130 230 235 -> buckets 0 0 1 1 2 2 -> fires at idx 2, 4
    assert got == [0, 0, 1, 0, 1, 0]


def test_volume_sampler_exact_replay(spark):
    rows = [("a", i, "user", "x" * ln, None, ts(i)) for i, ln in
            enumerate([40, 40, 40, 10, 100, 5])]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA).withColumn(
        "char_len", F.length("text").cast("double")
    )
    out = sampling.volume_sample_flag_exact(df, CFG, target=100.0)
    got = [r.is_sample for r in out.orderBy("turn_idx").collect()]
    # acc: 40 80 120* ->0; 10 110* ->0; 5  => fires at idx 2 and 4
    assert got == [0, 0, 1, 0, 1, 0]
    # reset-on-fire differs from cumsum form when remainders accumulate
    rows2 = [("a", i, "user", "x" * ln, None, ts(i)) for i, ln in
             enumerate([60, 60, 60, 60])]
    df2 = spark.createDataFrame(rows2, schema=TRANSCRIPT_SCHEMA).withColumn(
        "char_len", F.length("text").cast("double")
    )
    exact = [r.is_sample for r in
             sampling.volume_sample_flag_exact(df2, CFG, target=100.0)
             .orderBy("turn_idx").collect()]
    assert exact == [0, 1, 0, 1]  # acc 60 120*; 60 120*


def test_interval_assignment(turns):
    flagged = sampling.event_sample_flag(turns, CFG, n=3)
    out = sampling.assign_sample_intervals(flagged, CFG)
    got = {(r.conv_id, r.turn_idx): r.sample_id for r in out.collect()}
    # fires at idx 2 and 5; rows 0-2 -> interval 0, 3-5 -> 1, 6 -> 2
    assert [got[("a", i)] for i in range(7)] == [0, 0, 0, 1, 1, 1, 2]


def test_interval_aggregate_drains_on_fired_rows(turns):
    flagged = sampling.event_sample_flag(
        turns.withColumn("char_len", F.length("text").cast("double")), CFG, n=3
    )
    out = sampling.interval_aggregate(
        flagged, CFG, aggs=[F.sum("char_len").alias("chars"), F.count(F.lit(1)).alias("n")]
    )
    got = {(r.conv_id, r.turn_idx): (r.chars, r.n) for r in out.collect()}
    assert got[("a", 2)] == (11.0 + 2.0 + 10.0, 3)
    assert got[("a", 5)] == (4.0 + 4.0 + 2.0, 3)
    assert ("a", 6) not in got  # unfired tail never drains


# --- lifecycle ------------------------------------------------------------------

def test_tool_episode_pairing(turns):
    ep = lifecycle.tool_episodes(turns, CFG)
    rows = {(r.conv_id, r.tool, r.episode_rank): r for r in ep.collect()}
    e1 = rows[("a", "t1", 1)]
    assert e1.invoke_turn_idx == 1 and e1.result_turn_idx == 2
    assert e1.latency_s == 2.0 and e1.gap_turns == 1 and e1.completed == 1
    e2 = rows[("a", "t1", 2)]
    assert e2.invoke_turn_idx == 5 and e2.result_turn_idx == 6 and e2.latency_s == 5.0
    e3 = rows[("a", "t2", 1)]
    assert e3.result_turn_idx is None and e3.completed == 0


def test_episode_stats(turns):
    st = {r.conv_id: r for r in lifecycle.episode_stats(turns, CFG).collect()}
    a = st["a"]
    assert a.n_episodes == 3 and a.n_completed == 2
    assert abs(a.completion_ratio - 2 / 3) < 1e-12
    assert abs(a.mean_latency_s - 3.5) < 1e-12
    assert "b" not in st  # no tool calls


def test_active_episode_count(turns):
    out = lifecycle.with_active_episode_count(turns, CFG)
    got = {(r.conv_id, r.turn_idx): r.active_episodes for r in out.collect()}
    assert [got[("a", i)] for i in range(7)] == [0, 1, 0, 1, 1, 2, 1]


# --- sequences -------------------------------------------------------------------

def test_sequence_builder(spark):
    rows = [("a", i, "user", "x", None, ts(i)) for i in range(10)]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA).withColumn(
        "f1", F.col("turn_idx").cast("double")
    )
    seq = sequence.build_sequences(df, CFG, ["f1"], window=4, stride=2)
    got = {r.end_turn_idx: r for r in seq.collect()}
    assert sorted(got) == [3, 5, 7, 9]
    assert [v[0] for v in got[5].sequence] == [2.0, 3.0, 4.0, 5.0]
    assert got[9].seq_len == 4 and got[9].duration_s == 3.0


def test_multiscale_decimation(spark):
    cfg = PipelineConfig(window_sizes=(4,), multiscale_decimation=(1, 2))
    rows = [("a", i, "user", "x", None, ts(i)) for i in range(12)]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA).withColumn(
        "f1", F.col("turn_idx").cast("double")
    )
    seq = sequence.build_multiscale_sequences(df, cfg, ["f1"], window=3, stride=1)
    d2 = [r for r in seq.collect() if r.scale == 2]
    # decimation 2 keeps turns 0,2,4,...; windows of 3 kept samples
    ends = sorted(r.end_turn_idx for r in d2)
    assert ends == [4, 6, 8, 10]
    r = [x for x in d2 if x.end_turn_idx == 8][0]
    assert [v[0] for v in r.sequence] == [4.0, 6.0, 8.0]


def test_horizon_aware_params():
    lb, st = sequence.horizon_aware_params(horizon=100, base_lookback=64,
                                           scale=2.0, target_len=32)
    assert lb == 200 and st == 6
    lb, _ = sequence.horizon_aware_params(horizon=1000, max_lookback=512)
    assert lb == 512


def test_lifecycle_point_in_time(turns):
    out = lifecycle.with_lifecycle_point_in_time(turns, CFG)
    got = {(r.conv_id, r.turn_idx): r for r in out.collect()}
    # open-invocation age: t2@20 open since turn 3; t1@40 open at turn 5
    assert got[("a", 4)].active_age_mean_s == 10.0    # (30-20)/1
    assert got[("a", 5)].active_age_mean_s == 10.0    # (2*40-60)/2
    assert got[("a", 6)].active_age_mean_s == 25.0    # only t2@20 open
    # running mean latency over completed episodes
    assert got[("a", 2)].ttf_result_mean_s == 2.0
    assert got[("a", 6)].ttf_result_mean_s == 3.5
    # no re-invocations while open -> mod_score 0 everywhere
    assert got[("a", 6)].mod_score == 0.0
    assert got[("a", 6)].iceberg_proxy == 0.0
    assert got[("b", 0)].active_episodes == 0.0
    assert got[("b", 0)].active_age_mean_s == 0.0
    # feature 82 analog: no activity -> neutral 1.0; else done/started capped
    assert got[("b", 0)].result_to_invoke_ratio == 1.0
    assert got[("a", 6)].result_to_invoke_ratio == 2.0 / 3.0


def test_lifecycle_modifications(spark):
    from feature_extractor_mbo_lob_spark.sources import TRANSCRIPT_SCHEMA

    rows = [
        ("c", 0, "assistant", "go", "t1", ts(0)),    # invoke #1
        ("c", 1, "assistant", "retry", "t1", ts(5)), # invoke #2 while #1 open
        ("c", 2, "tool", "res", "t1", ts(8)),        # result #1: 1 re-invocation
        ("c", 3, "tool", "res", "t1", ts(9)),        # result #2: 0
    ]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    ep = {r.episode_rank: r for r in
          lifecycle.episode_modifications(df, CFG).collect()}
    assert ep[1].mods == 1 and ep[2].mods == 0
    out = {r.turn_idx: r for r in
           lifecycle.with_lifecycle_point_in_time(df, CFG).collect()}
    assert out[2].mod_score == 1.0          # 1 completed, 1 mod
    assert out[3].mod_score == 0.5          # 2 completed, 1 mod
    assert abs(out[3].iceberg_proxy - 1.0 * min(0.5 / 10, 1.0)) < 1e-12


def test_walk_the_book(spark):
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark.operators.book import walk_the_book

    rows = [
        # (prices, sizes, quantity)
        ([10.0, 11.0, 12.0], [5.0, 5.0, 100.0], 8.0),   # fills 5@10 + 3@11
        ([10.0, 11.0], [1.0, 1.0], 5.0),                # cannot fill
        ([10.0, 11.0], [4.0, 4.0], 0.0),                # zero qty
        ([0.0, 11.0], [9.0, 4.0], 2.0),                 # level 0 invalid
    ]
    df = spark.createDataFrame(rows, "prices array<double>, sizes array<double>, quantity double")
    out = walk_the_book(df).collect()
    r0 = out[0]
    assert r0.wtb_best_price == 10.0
    assert r0.wtb_filled_qty == 8.0 and r0.wtb_can_fill == 1
    assert abs(r0.wtb_vwap - (5 * 10 + 3 * 11) / 8) < 1e-12
    assert r0.wtb_levels_consumed == 2
    r1_ = out[1]
    assert r1_.wtb_can_fill == 0 and r1_.wtb_filled_qty == 2.0
    assert abs(r1_.wtb_fill_ratio - 0.4) < 1e-12
    r2_ = out[2]
    assert r2_.wtb_vwap == 10.0 and r2_.wtb_fill_ratio == 1.0 and r2_.wtb_can_fill == 1
    r3_ = out[3]
    assert r3_.wtb_best_price == 11.0  # first VALID level
    assert r3_.wtb_filled_qty == 2.0 and r3_.wtb_levels_consumed == 1


def test_open_tool_queue_matches_simulation(spark, transcripts, cfg):
    """The reflection-based per-turn open-tool stats must equal a naive
    stateful simulation (clamped per-tool counters) over every turn."""
    from collections import defaultdict

    from feature_extractor_mbo_lob_spark.operators import lifecycle

    got = {
        (r.conv_id, r.turn_idx): r
        for r in lifecycle.with_open_tool_queue(transcripts, cfg).collect()
    }
    rows = sorted(
        transcripts.select("conv_id", "turn_idx", "ts", "role", "tool").collect(),
        key=lambda r: (r.conv_id, r.turn_idx, r.ts),
    )
    state = defaultdict(lambda: defaultdict(int))  # conv -> tool -> open
    for r in rows:
        open_c = state[r.conv_id]
        if r.tool is not None:
            if r.role == "assistant":
                open_c[r.tool] += 1
            elif r.role == "tool" and open_c[r.tool] > 0:
                open_c[r.tool] -= 1
        total = sum(open_c.values())
        ntools = sum(1 for v in open_c.values() if v > 0)
        ssq = sum(v * v for v in open_c.values())
        g = got[(r.conv_id, r.turn_idx)]
        assert g.total_open == total, (r.conv_id, r.turn_idx)
        assert g.n_active_tools == ntools, (r.conv_id, r.turn_idx)
        want_hhi = ssq / (total * total) if total > 0 else 0.0
        assert abs(g.open_tool_hhi - want_hhi) < 1e-9, (r.conv_id, r.turn_idx)


# --- cumulative target encoding -------------------------------------------------

def test_target_encoding_vs_bruteforce(spark):
    from feature_extractor_mbo_lob_spark.operators import encoding

    rows = []
    # hot category 'a' (20 rows), cold 'b', NULL category, NULL targets
    for i in range(20):
        rows.append(("c%02d" % i, i, "a", float(i) if i % 5 else None, ts(i)))
    rows += [("cx", 0, "b", 10.0, ts(3)), ("cy", 1, "b", 20.0, ts(7)),
             ("cz", 2, None, 5.0, ts(1)), ("cw", 3, None, 7.0, ts(9))]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string, value double, ts timestamp"
    )
    order = ("ts", "conv_id", "turn_idx")
    naive = encoding.cumulative_target_encoding(df, "tool", "value", order)
    chunk = encoding.cumulative_target_encoding_chunked(
        df, "tool", "value", order, bucket_s=5
    )
    key = ["conv_id", "turn_idx"]
    a = naive.toPandas().sort_values(key).reset_index(drop=True)
    b = chunk.toPandas().sort_values(key).reset_index(drop=True)[a.columns]
    assert a.equals(b), "chunked twin must be bit-identical"

    # brute force on the hot category
    import math
    got = {r.turn_idx: (r.tool_rows_before, r.tool_te)
           for r in naive.filter("tool = 'a'").collect()}
    seen = []
    for i in range(20):
        exp_n = len(seen)
        exp_te = sum(seen) / len(seen) if seen else None
        n, te = got[i]
        assert n == exp_n
        if exp_te is None:
            assert te is None
        else:
            assert math.isclose(te, exp_te, rel_tol=0, abs_tol=1e-12)
        if i % 5:
            seen.append(float(i))

    # NULL category forms its own group in BOTH paths
    got_null = {r.turn_idx: r.tool_rows_before
                for r in naive.filter("tool is null").collect()}
    assert got_null == {2: 0, 3: 1}


def test_target_encoding_no_self_leak(spark):
    """A category's first row must be NULL (its own target never leaks)."""
    from feature_extractor_mbo_lob_spark.operators import encoding

    df = spark.createDataFrame(
        [("c", 0, "x", 99.0, ts(0))],
        "conv_id string, turn_idx int, tool string, value double, ts timestamp",
    )
    r = encoding.cumulative_target_encoding(
        df, "tool", "value", ("ts", "conv_id", "turn_idx")
    ).collect()[0]
    assert r.tool_rows_before == 0 and r.tool_te is None


def test_with_lags_leads(spark, turns):
    from feature_extractor_mbo_lob_spark.operators import ordering as od

    out = od.with_lags(turns, CFG, ["turn_idx"], offsets=(1, 2))
    out = od.with_leads(out, CFG, ["turn_idx"], offsets=(1,))
    a = {r.turn_idx: (r.turn_idx_lag1, r.turn_idx_lag2, r.turn_idx_lead1)
         for r in out.filter("conv_id = 'a'").collect()}
    assert a[0] == (None, None, 1)
    assert a[2] == (1, 0, 3)
    assert a[6] == (5, 4, None)
    # every lag/lead shares ONE window exec: single exchange, single sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    import re
    assert len(re.findall(r"\bSort \[", plan)) == 1


def test_asof_randomized_vs_pandas(spark):
    """Randomized (seeded) corpus: backward / forward / tolerance as-of all
    match pandas merge_asof exactly, including duplicate right timestamps
    (pandas picks the LAST right row at equal ts for backward — the
    union-tag sort (_side right-before-left, last() over cum) does too."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 500, 200
    keys = [f"k{i}" for i in range(8)]
    lp = pd.DataFrame({
        "conv_id": rng.choice(keys, n_l),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n_l) * 1_000_000_000),
        "lid": np.arange(n_l),
    })
    rp = pd.DataFrame({
        "conv_id": rng.choice(keys, n_r),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n_r) * 1_000_000_000),
        "v": rng.normal(size=n_r).round(3),
    })
    # duplicate right timestamps on purpose
    rp = pd.concat([rp, rp.head(20).assign(v=lambda d: d.v + 100)], ignore_index=True)
    rp = rp.sort_values(["ts", "v"], kind="mergesort").reset_index(drop=True)

    ldf = spark.createDataFrame(lp)
    rdf = spark.createDataFrame(rp)

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 500.0):
            got = asof.asof_join(ldf, rdf, key="conv_id", ts="ts",
                                 value_cols=["v"], direction=direction,
                                 tolerance_s=tol)
            g = (got.select("lid", "v_asof").toPandas()
                 .sort_values("lid").reset_index(drop=True))
            kw = {"tolerance": pd.Timedelta(seconds=tol)} if tol else {}
            exp = pd.merge_asof(
                lp.sort_values("ts", kind="mergesort"), rp,
                on="ts", by="conv_id", direction=direction, **kw
            ).sort_values("lid").reset_index(drop=True)
            assert g["v_asof"].fillna(-9e9).tolist() == \
                exp["v"].fillna(-9e9).tolist(), (direction, tol)


def test_context_window(spark, turns):
    from feature_extractor_mbo_lob_spark.operators.sequence import context_window

    # conv 'a' word counts by turn: 2,1,2,1,1,1,2 (turn_idx 0..6)
    out = context_window(turns, CFG, token_budget=4)
    got = {(r.conv_id, r.turn_idx): (r.ctx_tokens, r.in_context)
           for r in out.collect()}
    # suffix sums from the end: t6=2, t5=3, t4=4, t3=5 ...
    assert got[("a", 6)] == (2, 1)
    assert got[("a", 5)] == (3, 1)
    assert got[("a", 4)] == (4, 1)
    assert got[("a", 3)][1] == 0          # 5 > 4: out of context
    assert got[("a", 0)][1] == 0
    assert got[("b", 0)][1] == 1          # newest turn always kept


def test_context_window_oversized_tail(spark):
    import datetime as dt

    from feature_extractor_mbo_lob_spark.operators.sequence import context_window
    from feature_extractor_mbo_lob_spark.sources import TRANSCRIPT_SCHEMA

    t0 = dt.datetime(2024, 1, 1)
    rows = [("c", 0, "user", " ".join(["w"] * 50), None, t0)]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    r = context_window(df, CFG, token_budget=4).collect()[0]
    assert r.in_context == 1              # lone oversized turn still kept


def test_asof_bucketed_equals_plain(spark):
    """The range-bucketed skew form must equal asof_join backward exactly,
    including null right values (per-column last-ignoring-nulls), empty
    buckets between right rows, and ts exactly on bucket edges."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    n_l, n_r = 400, 150
    keys = [f"k{i}" for i in range(5)]
    # second values land on exact multiples of the 100 s bucket span too
    lp = pd.DataFrame({
        "conv_id": rng.choice(keys, n_l),
        "ts": pd.to_datetime(rng.integers(0, 5_000, n_l) * 1_000_000_000),
        "lid": np.arange(n_l),
    })
    v = rng.normal(size=n_r).round(3)
    v[rng.random(n_r) < 0.3] = np.nan          # nulls in the value column
    w = rng.normal(size=n_r).round(3)
    rp = pd.DataFrame({
        "conv_id": rng.choice(keys, n_r),
        "ts": pd.to_datetime(rng.integers(0, 5_000, n_r) * 1_000_000_000),
        "v": v, "w": w,
    })
    ldf, rdf = spark.createDataFrame(lp), spark.createDataFrame(rp)

    plain = asof.asof_join(ldf, rdf, key="conv_id", ts="ts",
                           value_cols=["v", "w"], direction="backward")
    buck = asof.asof_join_bucketed(ldf, rdf, key="conv_id", ts="ts",
                                   value_cols=["v", "w"], bucket_span_s=100.0)
    p = {r.lid: (r.v_asof, r.w_asof) for r in plain.collect()}
    b = {r.lid: (r.v_asof, r.w_asof) for r in buck.collect()}
    assert p.keys() == b.keys()
    for lid in p:
        for x, y in zip(p[lid], b[lid]):
            assert (x is None and y is None) or x == y, (lid, p[lid], b[lid])


# --- ordered-step funnel ------------------------------------------------------

def test_funnel_order_gap_and_stall(spark, turns):
    from feature_extractor_mbo_lob_spark.operators.sequence import funnel

    out = {
        r.conv_id: (r.step1_turn, r.step2_turn, r.step3_turn, r.funnel_depth)
        for r in funnel(
            turns,
            CFG,
            steps=[
                F.col("role") == "user",
                F.col("role") == "assistant",
                F.col("role") == "tool",
            ],
            max_gap=2,
        ).collect()
    }
    # a: user@0 -> assistant@1 (<=0+2) -> tool@2 (<=1+2)
    assert out["a"] == (0, 1, 2, 3)
    # b: user@0, then nothing -> funnel stalls at depth 1
    assert out["b"] == (0, None, None, 1)


def test_funnel_gap_violation_stalls(spark):
    from feature_extractor_mbo_lob_spark.operators.sequence import funnel

    rows = [
        # assistant appears BEFORE the first user turn (must not count),
        # and the next assistant is 3 turns after user with max_gap=2.
        ("c", 0, "assistant", "early", None, ts(0)),
        ("c", 1, "user", "start", None, ts(5)),
        ("c", 2, "tool", "noise", "t1", ts(6)),
        ("c", 3, "tool", "noise", "t1", ts(7)),
        ("c", 4, "assistant", "late", None, ts(8)),
    ]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    r = funnel(
        df,
        CFG,
        steps=[F.col("role") == "user", F.col("role") == "assistant"],
        max_gap=2,
    ).first()
    assert (r.step1_turn, r.step2_turn, r.funnel_depth) == (1, None, 1)
    # without the gap cap the same funnel completes at turn 4
    r2 = funnel(
        df,
        CFG,
        steps=[F.col("role") == "user", F.col("role") == "assistant"],
    ).first()
    assert (r2.step1_turn, r2.step2_turn, r2.funnel_depth) == (1, 4, 2)


# --- SCD2 point-in-time enrichment --------------------------------------------

def test_scd2_enrich_versions_and_retirement(spark):
    from feature_extractor_mbo_lob_spark.operators.asof import scd2_enrich

    dim = spark.createDataFrame(
        [
            # user u1: tier a for [0, 100), tier b for [100, 200), RETIRED at 200
            ("u1", ts(0), ts(100), "a"),
            ("u1", ts(100), ts(200), "b"),
            # user u2: single open-ended version
            ("u2", ts(50), None, "z"),
        ],
        "k: string, valid_from: timestamp, valid_to: timestamp, tier: string",
    )
    facts = spark.createDataFrame(
        [
            ("u1", 1, ts(10)),    # -> a
            ("u1", 2, ts(100)),   # boundary: valid_from inclusive -> b
            ("u1", 3, ts(199)),   # -> b
            ("u1", 4, ts(250)),   # after retirement -> NULL
            ("u2", 5, ts(60)),    # open-ended current version -> z
            ("u2", 6, ts(40)),    # before first version -> NULL
        ],
        "k: string, fact_id: int, ts: timestamp",
    )
    got = {
        r.fact_id: r.tier_dim
        for r in scd2_enrich(facts, dim, key="k").collect()
    }
    assert got == {1: "a", 2: "b", 3: "b", 4: None, 5: "z", 6: None}


# --- CDC merge-apply ----------------------------------------------------------

def test_apply_cdc_upsert_delete_insert(spark):
    from feature_extractor_mbo_lob_spark.operators.cdc import apply_cdc

    snap = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 30)], "k: string, v: long"
    )
    changes = spark.createDataFrame(
        [
            ("a", 1, "U", 11),   # update a
            ("a", 5, "U", 12),   # later update wins
            ("b", 2, "D", 0),    # delete b
            ("d", 3, "I", 40),   # brand-new key
            ("e", 4, "I", 50),   # insert then delete -> gone
            ("e", 6, "D", 0),
        ],
        "k: string, seq: long, op: string, v: long",
    )
    got = {r.k: r.v for r in apply_cdc(snap, changes, key="k").collect()}
    assert got == {"a": 12, "c": 30, "d": 40}


def test_apply_cdc_missing_attr_raises(spark):
    from feature_extractor_mbo_lob_spark.operators.cdc import apply_cdc

    snap = spark.createDataFrame([("a", 1)], "k: string, v: long")
    changes = spark.createDataFrame(
        [("a", 1, "U", 2, "x")], "k: string, seq: long, op: string, v: long, extra: string"
    )
    with pytest.raises(ValueError, match="extra"):
        apply_cdc(snap, changes, key="k")


# --- randomized batch replicas (one Spark job, many random groups) ------------

def test_funnel_random_batch_matches_python(spark):
    """200 random conversations through funnel in ONE job, vs a per-conv
    python replica of the ordered-step-with-gap spec."""
    import random

    from feature_extractor_mbo_lob_spark.operators.sequence import funnel

    rng = random.Random(7)
    rows, expect = [], {}
    roles = ["user", "assistant", "tool"]
    for c in range(200):
        cid = f"c{c}"
        n = rng.randint(1, 12)
        seq = [rng.choice(roles) for _ in range(n)]
        gap = rng.choice([1, 2, 4])
        for i, role in enumerate(seq):
            rows.append((cid, i, role, "x", None, ts(i)))
        # python replica
        steps = ["user", "assistant", "tool"]
        got, prev = [], None
        for p in steps:
            hit = None
            for i, role in enumerate(seq):
                if role != p:
                    continue
                if prev is None:
                    hit = i
                    break
                if i > prev and i <= prev + gap:
                    hit = i
                    break
            got.append(hit)
            if hit is None:
                prev = None
                break
            prev = hit
        while len(got) < 3:
            got.append(None)
        expect[cid] = (got[0], got[1], got[2], sum(g is not None for g in got), gap)

    # group convs by gap so each funnel() call uses one max_gap
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    for gap in (1, 2, 4):
        cids = [c for c, e in expect.items() if e[4] == gap]
        sub = df.filter(F.col("conv_id").isin(cids))
        out = {
            r.conv_id: (r.step1_turn, r.step2_turn, r.step3_turn, r.funnel_depth)
            for r in funnel(
                sub, CFG,
                steps=[F.col("role") == p for p in ("user", "assistant", "tool")],
                max_gap=gap,
            ).collect()
        }
        for cid in cids:
            assert out[cid] == expect[cid][:4], (cid, out[cid], expect[cid])


def test_apply_cdc_random_batch_matches_python(spark):
    import random

    from feature_extractor_mbo_lob_spark.operators.cdc import apply_cdc

    rng = random.Random(11)
    keys = [f"k{i}" for i in range(60)]
    snap_rows = [(k, rng.randint(0, 999)) for k in keys if rng.random() < 0.7]
    chg_rows = []
    seq = 0
    for _ in range(300):
        k = rng.choice(keys)
        op = rng.choice(["U", "U", "U", "I", "D"])
        chg_rows.append((k, seq, op, rng.randint(0, 999)))
        seq += 1
    snap = spark.createDataFrame(snap_rows, "k: string, v: long")
    chg = spark.createDataFrame(chg_rows, "k: string, seq: long, op: string, v: long")
    got = {r.k: r.v for r in apply_cdc(snap, chg, key="k").collect()}

    state = {k: v for k, v in snap_rows}
    last = {}
    for k, s, op, v in chg_rows:
        last[k] = (s, op, v)
    for k, (s, op, v) in last.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == state


def test_incremental_rollup_equals_full_recompute(spark):
    """Merge(state, delta) must be bit-identical to the from-scratch
    aggregate — the materialized-view maintenance invariant."""
    import pyspark.sql.functions as F
    from feature_extractor_mbo_lob_spark.operators import cdc

    rows = [(i, f"u{i % 7}", (i * 13) % 50 - 10) for i in range(200)]
    df = spark.createDataFrame(rows, "event_id long, user_id string, v long")
    state = cdc.partial_aggregate(df.where(F.col("event_id") % 10 != 0), "user_id", "v")
    delta = cdc.partial_aggregate(df.where(F.col("event_id") % 10 == 0), "user_id", "v")
    merged = {r.key: r for r in cdc.merge_partial_aggregates(state, delta).collect()}
    full = {r.key: r for r in cdc.partial_aggregate(df, "user_id", "v").collect()}
    assert set(merged) == set(full)
    for k in full:
        assert (merged[k].cnt, merged[k].sum_v, merged[k].min_v, merged[k].max_v) == (
            full[k].cnt, full[k].sum_v, full[k].min_v, full[k].max_v)


def test_incremental_rollup_delta_only_key(spark):
    """A key present only in the delta batch (or only in state) survives
    the full-outer merge with its own values."""
    from feature_extractor_mbo_lob_spark.operators import cdc

    state = spark.createDataFrame(
        [("a", 2, 10, 3, 7)], "key string, cnt long, sum_v long, min_v long, max_v long"
    )
    delta = spark.createDataFrame(
        [("b", 1, 5, 5, 5)], "key string, cnt long, sum_v long, min_v long, max_v long"
    )
    out = {r.key: r for r in cdc.merge_partial_aggregates(state, delta).collect()}
    assert (out["a"].cnt, out["a"].min_v, out["a"].max_v) == (2, 3, 7)
    assert (out["b"].cnt, out["b"].sum_v) == (1, 5)


def test_fano_burstiness_moments(spark):
    from datetime import datetime
    from feature_extractor_mbo_lob_spark.operators.volatility import fano_burstiness

    # user 1: 3 events in one hour bucket + 1 in another -> counts [3, 1]
    # user 2: 2 events in 2 distinct buckets -> counts [1, 1] (Fano 0)
    rows = [
        (1, datetime(2024, 1, 1, 10, 0)),
        (1, datetime(2024, 1, 1, 10, 20)),
        (1, datetime(2024, 1, 1, 10, 59)),
        (1, datetime(2024, 1, 1, 12, 0)),
        (2, datetime(2024, 1, 1, 10, 5)),
        (2, datetime(2024, 1, 1, 13, 5)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r.user_id: r for r in fano_burstiness(df).collect()}
    assert (out[1].n_buckets, out[1].cnt_sum, out[1].cnt_sumsq) == (2, 4, 10)
    assert (out[2].n_buckets, out[2].cnt_sum, out[2].cnt_sumsq) == (2, 2, 2)
    # Fano = (n*sumsq - sum^2) / (n*sum): user1 = (20-16)/8 = 0.5
    n, s, ss = out[1].n_buckets, out[1].cnt_sum, out[1].cnt_sumsq
    assert (n * ss - s * s) / (n * s) == pytest.approx(0.5)


def test_theil_sen_pacing_hand(spark):
    from datetime import datetime, timedelta
    from feature_extractor_mbo_lob_spark.operators.volatility import theil_sen_pacing

    base = datetime(2024, 1, 1)
    # turns at t=0s, 10s, 20s, 1000s: the stall inflates the mean gap
    # (333s) but Theil-Sen stays near the typical 10s pace.
    rows = [("c1", i, base + timedelta(seconds=s)) for i, s in
            enumerate([0, 10, 20, 1000])]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    out = theil_sen_pacing(df, PipelineConfig()).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_pairs == 6
    # pairwise slopes (us/turn): 10s,10s,10s(0-1,1-2 adj? compute):
    # (0,1)=10s, (0,2)=10s, (0,3)=333.33s, (1,2)=10s, (1,3)=495s, (2,3)=980s
    # sorted: [10,10,10,333.3,495,980] -> lower median (pos 3) = 10s
    assert r.med_slope_us == 10_000_000


def test_path_ngrams_counts(spark):
    from datetime import datetime, timedelta
    from feature_extractor_mbo_lob_spark.operators.sequence import path_ngrams

    base = datetime(2024, 1, 1)
    rows = []
    # user 1: a b c a b c  -> trigrams a>b>c, b>c>a, c>a>b, a>b>c
    for i, e in enumerate("abcabc"):
        rows.append((1, i, base + timedelta(seconds=i), e))
    # user 2: a b c        -> a>b>c
    for i, e in enumerate("abc"):
        rows.append((2, i, base + timedelta(seconds=i), e))
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, event_type string")
    out = {r.path: (r.rank, r.cnt) for r in path_ngrams(df, top_k=10).collect()}
    assert out["a>b>c"] == (1, 3)
    assert out["b>c>a"][1] == 1 and out["c>a>b"][1] == 1
    assert len(out) == 3   # no cross-user grams


def test_knn_label_agreement_flags_outlier(spark):
    from feature_extractor_mbo_lob_spark.operators.similarity import knn_label_agreement

    # two tight clusters; vec 0 sits in cluster A but carries label 9
    rows = []
    for i in range(12):
        a = 1.0 + 0.01 * i
        lbl = 9 if i == 0 else 0
        rows.append((i, [a, 0.1 * i * 0.001], lbl))
    for i in range(12, 24):
        rows.append((i, [0.001 * i, 1.0 + 0.01 * i], 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label long")
    out = {r.query_id: r for r in knn_label_agreement(df, k=5, sample_mod=10).collect()}
    assert out[0].n_agree == 0 and bool(out[0].noise_flag) is True
    assert out[10].n_agree == 5 and bool(out[10].noise_flag) is False
    assert out[20].n_agree == 5 and bool(out[20].noise_flag) is False


def test_pca_top_component_matches_numpy(spark):
    import numpy as np
    from feature_extractor_mbo_lob_spark.operators.similarity import pca_top_component

    rng = np.random.RandomState(7)
    # anisotropic cloud: dominant axis along (1, 2, 0)/sqrt(5)
    t = rng.randn(200, 1) * 5.0
    noise = rng.randn(200, 3) * 0.3
    X = t @ np.array([[1.0, 2.0, 0.0]]) / np.sqrt(5.0) + noise
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(200)], "vec_id long, embedding array<double>"
    )
    v, ratio = pca_top_component(df)
    vn = np.array(v)
    ref = np.array([1.0, 2.0, 0.0]) / np.sqrt(5.0)
    assert abs(abs(float(vn @ ref)) - 1.0) < 0.01
    assert ratio > 0.9


def test_pca_power_direction_dominant_axis(spark):
    from feature_extractor_mbo_lob_spark.operators.similarity import (
        pca_power_direction,
        pca_top_component,
    )

    # zero-mean cloud exactly along direction (2, 1): scatter C ~ [[40,20],[20,10]]
    rows = [(0, [2.0, 1.0]), (1, [-2.0, -1.0]), (2, [4.0, 2.0]), (3, [-4.0, -2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.j: r.v_micro for r in pca_power_direction(df, iterations=3).collect()}
    assert out[0] == 1_000_000          # max-norm: dominant lane is ±1e6
    assert out[1] == 500_000            # exact 2:1 ratio
    # agrees with the numpy eigensolve direction up to scale
    v, _ = pca_top_component(df)
    assert abs(v[0] / v[1] - 2.0) < 1e-9


def test_pca_power_direction_empty_and_centering(spark):
    from feature_extractor_mbo_lob_spark.operators.similarity import pca_power_direction

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert pca_power_direction(empty).count() == 0
    # a constant offset must not change the direction (centering works):
    rows = [(i, [2.0 * s + 10.0, 1.0 * s + 20.0])
            for i, s in enumerate([1.0, -1.0, 2.0, -2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.j: r.v_micro for r in pca_power_direction(df, iterations=3).collect()}
    assert out[0] == 1_000_000 and out[1] == 500_000


def test_loo_target_encoding_hand_case(spark):
    from feature_extractor_mbo_lob_spark.operators import encoding

    df = spark.createDataFrame(
        [
            ("c", 0, "x", 1.00, ts(0)),
            ("c", 1, "x", 2.00, ts(1)),
            ("c", 2, "x", 6.00, ts(2)),
            ("c", 3, "y", 5.00, ts(3)),   # singleton -> NULL
            ("c", 4, None, 3.00, ts(4)),  # NULL tool is a real group
            ("c", 5, None, 7.00, ts(5)),
        ],
        "conv_id string, turn_idx int, tool string, value double, ts timestamp",
    )
    out = {r.turn_idx: r for r in
           encoding.loo_target_encoding(df, "tool", "value").collect()}
    # row 0: peers (2.0, 6.0) -> 4.0; row 1: (1+6)/2 = 3.5; row 2: 1.5
    assert out[0].tool_peers == 2 and out[0].tool_loo_te == 4.0
    assert out[1].tool_loo_te == 3.5 and out[2].tool_loo_te == 1.5
    assert out[3].tool_peers == 0 and out[3].tool_loo_te is None
    assert out[4].tool_peers == 1 and out[4].tool_loo_te == 7.0
    assert out[5].tool_loo_te == 3.0
