"""Hand-computed expectations for cumulative state features."""

import datetime as dt

import pytest
from pyspark.sql import Row

from feature_extractor_mbo_lob_spark.config import PipelineConfig
from feature_extractor_mbo_lob_spark.operators import state

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def mk(spark, rows):
    from feature_extractor_mbo_lob_spark.sources import TRANSCRIPT_SCHEMA

    return spark.createDataFrame(
        [
            (c, i, r, t, None, T0 + dt.timedelta(seconds=off))
            for (c, i, r, t, off) in rows
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


@pytest.fixture(scope="module")
def tiny(spark):
    cfg = PipelineConfig(window_sizes=(4,), warmup_turns=3, session_gap_s=100.0)
    df = mk(
        spark,
        [
            ("a", 0, "user", "hello", 0),
            ("a", 1, "assistant", "hi there", 10),
            ("a", 2, "tool", "x" * 20, 30),
            ("a", 3, "user", "ok", 190),  # gap 160s > 100s -> new session
            ("b", 0, "user", "solo", 0),
        ],
    )
    out = state.with_sessions(state.with_state_features(df, cfg), cfg)
    out = state.with_time_regime(out, cfg)
    return {(r.conv_id, r.turn_idx): r for r in out.collect()}


def test_cumulative_counts(tiny):
    a3 = tiny[("a", 3)]
    assert a3.turns_so_far == 4.0
    assert a3.user_turns_so_far == 2.0
    assert a3.assistant_turns_so_far == 1.0
    assert a3.tool_turns_so_far == 1.0
    assert a3.chars_so_far == 5 + 8 + 20 + 2
    assert tiny[("b", 0)].turns_so_far == 1.0  # no cross-key leakage


def test_dt_and_elapsed(tiny):
    assert tiny[("a", 0)].dt_seconds == 0.0
    assert tiny[("a", 1)].dt_seconds == 10.0
    assert tiny[("a", 3)].dt_seconds == 160.0
    assert tiny[("a", 3)].secs_since_start == 190.0


def test_flow_signals(tiny):
    a1 = tiny[("a", 1)]
    # (user - assistant) / (user + assistant + eps) = (1-1)/(2+eps)
    assert abs(a1.net_role_flow) < 1e-9
    a2 = tiny[("a", 2)]
    # tool=1, non-tool=2, turns=3 -> (1-2)/3
    assert abs(a2.net_tool_flow - (1 - 2) / (3 + 1e-8)) < 1e-12


def test_warmup_flag(tiny):
    assert tiny[("a", 1)].session_ready == 0.0
    assert tiny[("a", 2)].session_ready == 1.0  # warmup_turns=3


def test_sessionization(tiny):
    assert tiny[("a", 0)].is_session_start == 1.0
    assert tiny[("a", 0)].session_id == 0.0
    assert tiny[("a", 2)].session_id == 0.0
    assert tiny[("a", 3)].is_session_start == 1.0
    assert tiny[("a", 3)].session_id == 1.0
    assert tiny[("b", 0)].session_id == 0.0


def test_time_regime(tiny):
    assert tiny[("a", 0)].time_regime == 1.0  # 10:00 UTC -> bucket 1 (06-12)


def test_distinct_so_far(spark, cfg, transcripts):
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark.operators import state as st

    out = st.with_distinct_so_far(transcripts, cfg, col="tool")
    pdf = out.select("conv_id", "turn_idx", "tool", "distinct_tool_so_far") \
        .toPandas().sort_values(["conv_id", "turn_idx"])
    for conv, g in pdf.groupby("conv_id"):
        seen = set()
        for _, r in g.iterrows():
            if r.tool is not None:
                seen.add(r.tool)
            assert r.distinct_tool_so_far == len(seen), (conv, r.turn_idx)


def test_session_features(spark, cfg, transcripts):
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark.operators import state as st

    out = st.with_session_features(transcripts, cfg)
    pdf = out.select("conv_id", "turn_idx", "is_session_start", "session_id",
                     "turn_in_session", "secs_in_session", "ts") \
        .toPandas().sort_values(["conv_id", "turn_idx"])
    for conv, g in pdf.groupby("conv_id"):
        tis = 0
        sid = -1
        start_ts = None
        for _, r in g.iterrows():
            if r.is_session_start == 1.0:
                sid += 1
                tis = 1
                start_ts = r.ts
            else:
                tis += 1
            assert r.session_id == sid
            assert r.turn_in_session == tis
            assert abs(r.secs_in_session - (r.ts - start_ts).total_seconds()) < 1e-6


def test_cusum_matches_recurrence(spark, cfg, transcripts):
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark.operators import state as st

    K, H = 40.0, 200.0
    out = st.with_cusum(transcripts, cfg, F.length("text").cast("double"),
                        k=K, threshold=H)
    pdf = out.selectExpr("conv_id", "turn_idx", "length(text) as x",
                         "cusum_stat", "cusum_alarm") \
        .toPandas().sort_values(["conv_id", "turn_idx"])
    for conv, g in pdf.groupby("conv_id"):
        s = 0.0
        for _, r in g.iterrows():
            s = max(0.0, s + (float(r.x) - K))   # the textbook recurrence
            assert abs(r.cusum_stat - s) < 1e-9, (conv, r.turn_idx)
            assert r.cusum_alarm == int(s >= H)


def test_streaks(spark, cfg, transcripts):
    from feature_extractor_mbo_lob_spark.operators import state as st

    out = st.with_streaks(transcripts, cfg, col="role")
    pdf = out.select("conv_id", "turn_idx", "role",
                     "role_streak_len", "role_streak_ord") \
        .toPandas().sort_values(["conv_id", "turn_idx"])
    for conv, g in pdf.groupby("conv_id"):
        prev = None
        length = 0
        ordn = 0
        for _, r in g.iterrows():
            if r.role != prev:
                ordn += 1
                length = 1
            else:
                length += 1
            prev = r.role
            assert r.role_streak_len == length, (conv, r.turn_idx)
            assert r.role_streak_ord == ordn, (conv, r.turn_idx)


def test_merge_consecutive_turns(spark):
    from feature_extractor_mbo_lob_spark.sources import TRANSCRIPT_SCHEMA

    rows = [
        # conv a: user,user,assistant,user -> 3 merged turns
        ("a", 0, "user", "first", None, 0),
        ("a", 1, "user", "second", None, 10),
        ("a", 2, "assistant", "reply", "search", 20),
        ("a", 3, "user", "done", None, 30),
        # conv b: assistant run with a NULL text in the middle; tool on
        # the FIRST member only
        ("b", 0, "assistant", "x", "calc", 0),
        ("b", 1, "assistant", None, None, 5),
        ("b", 2, "assistant", "y", None, 9),
    ]
    df = spark.createDataFrame(
        [(c, i, r, t, tl, T0 + dt.timedelta(seconds=off))
         for (c, i, r, t, tl, off) in rows],
        schema=TRANSCRIPT_SCHEMA,
    )
    cfg = PipelineConfig()
    out = {(r.conv_id, r.turn_idx): r
           for r in state.merge_consecutive_turns(df, cfg).collect()}

    assert len([k for k in out if k[0] == "a"]) == 3
    a0 = out[("a", 0)]
    assert a0.role == "user" and a0.text == "first\nsecond" and a0.n_merged == 2
    assert a0.chars == len("first") + len("second")
    assert a0.ts == T0 and a0.ts_end == T0 + dt.timedelta(seconds=10)
    assert out[("a", 1)].text == "reply" and out[("a", 1)].tool == "search"
    assert out[("a", 2)].text == "done"

    b0 = out[("b", 0)]
    # null member skipped in the join, counted in n_merged; first tool kept
    assert b0.text == "x\ny" and b0.n_merged == 3 and b0.tool == "calc"
    assert b0.ts_end == T0 + dt.timedelta(seconds=9)


def test_merge_consecutive_turns_randomized_vs_naive(spark):
    import random

    from feature_extractor_mbo_lob_spark.sources import TRANSCRIPT_SCHEMA

    rng = random.Random(7)
    rows = []
    for c in range(6):
        n = rng.randint(1, 25)
        for i in range(n):
            role = rng.choice(["user", "assistant", "tool"])
            text = rng.choice([None, "", "t%d" % i, "x" * rng.randint(1, 5)])
            tool = rng.choice([None, "calc", "web"])
            rows.append((f"c{c}", i, role, text, tool,
                         T0 + dt.timedelta(seconds=i * 3)))
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    got = {(r.conv_id, r.turn_idx): r
           for r in state.merge_consecutive_turns(df, PipelineConfig()).collect()}

    # naive per-conversation merger
    by_conv = {}
    for (c, i, role, text, tool, ts) in rows:
        by_conv.setdefault(c, []).append((i, role, text, tool, ts))
    n_runs_total = 0
    for c, turns in by_conv.items():
        turns.sort()
        runs = []
        for t in turns:
            if runs and runs[-1][0][1] == t[1]:
                runs[-1].append(t)
            else:
                runs.append([t])
        n_runs_total += len(runs)
        for k, run in enumerate(runs):
            r = got[(c, k)]
            assert r.role == run[0][1]
            texts = [t[2] for t in run if t[2] is not None]
            joined = "\n".join(texts)
            assert r.text == (joined if joined != "" else None)
            assert r.tool == run[0][3]
            assert r.n_merged == len(run)
            assert r.chars == sum(len(t[2] or "") for t in run)
            assert r.ts == run[0][4] and r.ts_end == run[-1][4]
    assert len(got) == n_runs_total
