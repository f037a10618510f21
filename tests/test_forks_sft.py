"""Semantic tests for the rollout-curation family: prefix-fork detection,
refusal flag rates, tool-retry trajectories, SFT pair extraction."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from feature_extractor_mbo_lob_spark import PipelineConfig
from feature_extractor_mbo_lob_spark.functions import corpus as cp
from feature_extractor_mbo_lob_spark.functions import text as tx
from feature_extractor_mbo_lob_spark.operators import forks, lifecycle
from feature_extractor_mbo_lob_spark.sources.transcripts import TRANSCRIPT_SCHEMA

CFG = PipelineConfig()

T0 = dt.datetime(2024, 1, 1)


def _ts(i):
    return T0 + dt.timedelta(minutes=i)


def _mk(spark, rows):
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


@pytest.fixture(scope="module")
def forked(spark):
    # a/b share a 2-turn prefix then diverge; c is unique; d is a full copy
    # of a's first 2 turns only (shorter conv).
    rows = []
    for cid, texts in [
        ("a", ["hi", "hello", "branch-a"]),
        ("b", ["hi", "hello", "branch-b"]),
        ("c", ["different", "hello", "branch-c"]),
        ("d", ["hi", "hello"]),
    ]:
        for i, t in enumerate(texts):
            role = "user" if i % 2 == 0 else "assistant"
            rows.append((cid, i, role, t, None, _ts(i)))
    return _mk(spark, rows)


def test_fork_groups_detects_shared_prefix(forked):
    g = forks.fork_groups(forked, CFG).orderBy("prefix_len").collect()
    # depth-1 prefix "hi" shared by a,b,d; depth-2 by a,b,d; depth-3 none
    by_len = {r.prefix_len: r for r in g}
    assert set(by_len) == {1, 2}
    assert by_len[1].n_convs == 3 and by_len[1].keep_conv_id == "a"
    assert by_len[2].n_convs == 3
    # digests differ between depths
    assert by_len[1].prefix_digest != by_len[2].prefix_digest


def test_fork_depth_profile_counts(forked):
    prof = {r.prefix_len: r for r in forks.fork_depth_profile(forked, CFG).collect()}
    # depth 1: prefixes {hi(x3), different(x1)} -> 2 prefixes, 4 convs, 3 forked
    assert prof[1].n_prefixes == 2 and prof[1].n_convs == 4
    assert prof[1].n_forked_convs == 3
    # depth 3: a,b,c reach it, all unique
    assert prof[3].n_prefixes == 3 and prof[3].n_forked_convs == 0


def test_fork_dedup_keep(forked):
    keep = {r.conv_id: r.keep for r in forks.fork_dedup_keep(forked, CFG, depth=2).collect()}
    # at depth 2, {a,b,d} share; min conv_id 'a' kept; c unique -> kept
    assert keep == {"a": True, "b": False, "c": True, "d": False}


def test_fork_role_matters(spark):
    # same text, different role at turn 0 -> NOT a fork (digest covers role)
    rows = [
        ("x", 0, "user", "same", None, _ts(0)),
        ("y", 0, "assistant", "same", None, _ts(0)),
    ]
    df = _mk(spark, rows)
    assert forks.fork_groups(df, CFG).count() == 0


def test_flag_rates(spark):
    rows = [
        ("c1", 0, "user", "please do X", None, _ts(0)),
        ("c1", 1, "assistant", "I cannot help with that", None, _ts(1)),
        ("c1", 2, "assistant", "ok fine", None, _ts(2)),
        ("c2", 0, "assistant", "sure thing", None, _ts(0)),
    ]
    df = _mk(spark, rows)
    out = {
        r.conv_id: r
        for r in tx.flag_rates(df, ("i cannot", "i'm sorry")).collect()
    }
    assert out["c1"].n_flagged == 1 and out["c1"].first_flag_turn == 1
    assert abs(out["c1"].flag_rate - round(1 / 3, 6)) < 2e-6
    assert out["c2"].n_flagged == 0 and out["c2"].first_flag_turn is None
    # role-restricted scan drops the user turn from the denominator
    out_a = {r.conv_id: r for r in tx.flag_rates(df, ("i cannot",), role="assistant").collect()}
    assert out_a["c1"].n_turns == 2


def test_tool_retry_stats(spark):
    # conv r: tools t1 t1 t1 t2 t1 -> 5 calls, 2 retries, max streak 3
    rows = []
    for i, tool in enumerate(["t1", "t1", "t1", "t2", "t1"]):
        rows.append(("r", i, "tool", "call", tool, _ts(i)))
    rows.append(("r", 5, "assistant", "done", None, _ts(5)))  # ignored
    rows.append(("z", 0, "user", "no tools", None, _ts(0)))  # absent from output
    df = _mk(spark, rows)
    out = lifecycle.tool_retry_stats(df, CFG).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_tool_calls, r.n_retries, r.max_retry_streak) == (5, 2, 3)
    assert abs(r.retry_rate - 0.4) < 1e-9


def test_sft_pairs_point_in_time(spark):
    rows = [
        ("s", 0, "user", "aaaa", None, _ts(0)),          # 4 chars
        ("s", 1, "assistant", "bbbbbb", None, _ts(1)),    # pair: ctx=1 turn/4 chars
        ("s", 2, "user", "cc", None, _ts(2)),
        ("s", 3, "assistant", "ddd", None, _ts(3)),       # pair: ctx=3 turns/12 chars
        ("t", 0, "assistant", "no context", None, _ts(0)),  # filtered: 0 ctx turns
    ]
    df = _mk(spark, rows)
    out = {(r.conv_id, r.turn_idx): r for r in cp.sft_pairs(df).collect()}
    assert set(out) == {("s", 1), ("s", 3)}
    p1, p3 = out[("s", 1)], out[("s", 3)]
    # context stats NEVER include the response turn itself
    assert (p1.context_turns, p1.context_chars, p1.context_user_turns) == (1, 4, 1)
    assert p1.response_chars == 6
    assert (p3.context_turns, p3.context_chars, p3.context_user_turns) == (3, 12, 2)
    # deterministic id: md5 of "conv_id:turn_idx", independently computed
    import hashlib

    assert p1.pair_id == hashlib.md5(b"s:1").hexdigest()


def test_dpo_pairs(spark):
    # fork at depth 1: p,q,r share turn-0 "hi"; scores: p=3.00, q=5.00, r=1.00
    rows = [
        ("p", 0, "user", "hi", None, _ts(0), 0.0),
        ("p", 1, "assistant", "ans-p", None, _ts(1), 3.00),
        ("q", 0, "user", "hi", None, _ts(0), 0.0),
        ("q", 1, "assistant", "ans-q", None, _ts(1), 5.00),
        ("r", 0, "user", "hi", None, _ts(0), 0.0),
        ("r", 1, "assistant", "ans-r", None, _ts(1), 1.00),
        ("u", 0, "user", "unique", None, _ts(0), 0.0),
        ("u", 1, "assistant", "ans-u", None, _ts(1), 9.0),
    ]
    from pyspark.sql import types as T
    schema = T.StructType(
        TRANSCRIPT_SCHEMA.fields + [T.StructField("value", T.DoubleType(), True)]
    )
    df = spark.createDataFrame(rows, schema)
    out = forks.dpo_pairs(df, CFG, depth=1).collect()
    # q is chosen; pairs (q,p) and (q,r); u's group has 1 member -> no pairs
    assert len(out) == 2
    pairs = {(r.chosen_conv_id, r.rejected_conv_id): r.margin_cents for r in out}
    assert pairs == {("q", "p"): 200, ("q", "r"): 400}


def test_loop_stats(spark):
    from feature_extractor_mbo_lob_spark.operators import state as st
    # conv L: A B A B A B  -> period-2 loop, eq2 run of 4
    rows = [("L", i, "tool", t, None, _ts(i)) for i, t in
            enumerate(["A", "B", "A", "B", "A", "B"])]
    # conv S: X X X -> period-1 loop, eq1 run of 2
    rows += [("S", i, "tool", "X", None, _ts(i)) for i in range(3)]
    # conv N: all distinct -> no loops
    rows += [("N", i, "tool", f"u{i}", None, _ts(i)) for i in range(4)]
    df = _mk(spark, rows)
    out = {r.conv_id: r for r in st.loop_stats(df, CFG).collect()}
    assert out["L"].max_run_p2 == 4 and out["L"].loop_flag
    assert out["S"].max_run_p1 == 2 and out["S"].loop_flag
    assert out["N"].max_run_p1 == 0 and out["N"].max_run_p2 == 0
    assert not out["N"].loop_flag


def test_loop_stats_interrupted_run(spark):
    from feature_extractor_mbo_lob_spark.operators import state as st
    # X X Y X X -> two separate period-1 runs of 1 each, never 2 -> no flag
    rows = [("I", i, "tool", t, None, _ts(i)) for i, t in
            enumerate(["X", "X", "Y", "X", "X"])]
    out = st.loop_stats(_mk(spark, rows), CFG).collect()[0]
    assert out.max_run_p1 == 1 and not out.loop_flag


def test_canned_responses(spark):
    from feature_extractor_mbo_lob_spark.operators import dedup as dd
    rows = []
    # template "ok  done" normalized == "ok done", used 3x across 2 convs
    rows.append(("c1", 0, "assistant", "ok  done", None, _ts(0)))
    rows.append(("c1", 1, "assistant", "OK DONE", None, _ts(1)))
    rows.append(("c2", 0, "assistant", " ok done ", None, _ts(0)))
    # below threshold
    rows.append(("c2", 1, "assistant", "rare", None, _ts(1)))
    # non-assistant ignored
    rows.append(("c3", 0, "user", "ok done", None, _ts(0)))
    out = dd.canned_responses(_mk(spark, rows), min_uses=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_uses, r.n_convs, r.template_len, r.keep_conv_id) == (3, 2, 7, "c1")


def _naive_loop_stats(turns, max_period=3):
    """Per-conv naive replica: turns = list of digest-comparable tokens."""
    out = {}
    for k in range(1, max_period + 1):
        best = run = 0
        for i in range(len(turns)):
            if i >= k and turns[i] == turns[i - k]:
                run += 1
                best = max(best, run)
            else:
                run = 0
        out[k] = best
    return out


def test_loop_stats_randomized_vs_naive(spark):
    import random

    from feature_extractor_mbo_lob_spark.operators import state as st

    rng = random.Random(1234)
    rows, expect = [], {}
    for c in range(40):
        cid = f"c{c:02d}"
        n = rng.randint(1, 30)
        toks = [rng.choice("ABC") for _ in range(n)]
        rows += [(cid, i, "tool", t, None, _ts(i)) for i, t in enumerate(toks)]
        expect[cid] = _naive_loop_stats(toks)
    out = {r.conv_id: r for r in st.loop_stats(_mk(spark, rows), CFG).collect()}
    assert set(out) == set(expect)
    for cid, e in expect.items():
        got = (out[cid].max_run_p1, out[cid].max_run_p2, out[cid].max_run_p3)
        assert got == (e[1], e[2], e[3]), (cid, got, e)


def test_fork_profile_randomized_vs_naive(spark):
    import random
    from collections import Counter

    rng = random.Random(99)
    rows, convs = [], {}
    for c in range(30):
        cid = f"c{c:02d}"
        n = rng.randint(1, 6)
        toks = [rng.choice("xy") for _ in range(n)]
        convs[cid] = toks
        rows += [(cid, i, "user", t, None, _ts(i)) for i, t in enumerate(toks)]
    out = {r.prefix_len: r for r in forks.fork_depth_profile(_mk(spark, rows), CFG).collect()}
    max_len = max(len(t) for t in convs.values())
    for depth in range(1, max_len + 1):
        prefixes = Counter(
            tuple(t[:depth]) for t in convs.values() if len(t) >= depth
        )
        if not prefixes:
            assert depth not in out
            continue
        r = out[depth]
        assert r.n_prefixes == len(prefixes)
        assert r.n_convs == sum(prefixes.values())
        assert r.n_forked_convs == sum(v for v in prefixes.values() if v >= 2)


def test_tool_attribution(spark):
    from pyspark.sql import types as T

    from feature_extractor_mbo_lob_spark.operators import lifecycle

    schema = T.StructType(
        TRANSCRIPT_SCHEMA.fields + [T.StructField("value", T.DoubleType(), True)]
    )
    # conv v: value 10.00 total; tool turns: t1, t2, t1 -> first=t1 last=t1
    rows = [
        ("v", 0, "user", "q", None, _ts(0), 4.00),
        ("v", 1, "tool", "c", "t1", _ts(1), 2.00),
        ("v", 2, "tool", "c", "t2", _ts(2), 3.00),
        ("v", 3, "tool", "c", "t1", _ts(3), 1.00),
    ]
    df = spark.createDataFrame(rows, schema)
    out = {r.tool: r for r in lifecycle.tool_attribution(df, CFG).collect()}
    # conv_cents = 1000; t1: first+last, 2/3 linear = 666; t2: 1/3 = 333
    assert out["t1"].first_touch_cents == 1000
    assert out["t1"].last_touch_cents == 1000
    assert out["t1"].linear_cents == 666
    assert out["t2"].first_touch_cents == 0
    assert out["t2"].last_touch_cents == 0
    assert out["t2"].linear_cents == 333
    assert out["t1"].n_convs == 1 and out["t2"].n_convs == 1


def test_fork_dedup_keep_gapped_turn_idx(spark):
    # conv "g" has turns at idx {0, 2} (gap at 1): no row at depth-1 for
    # depth=2 -> must SURVIVE, not vanish from the keep map
    rows = [
        ("g", 0, "user", "hi", None, _ts(0)),
        ("g", 2, "assistant", "late", None, _ts(2)),
        ("h", 0, "user", "hi", None, _ts(0)),
        ("h", 1, "assistant", "x", None, _ts(1)),
    ]
    df = _mk(spark, rows)
    keep = {r.conv_id: r.keep for r in forks.fork_dedup_keep(df, CFG, depth=2).collect()}
    assert keep == {"g": True, "h": True}


def test_streaming_sft_state_carries_across_batches(spark, tmp_path):
    """streaming_sft_pairs: context counters accumulated in batch 1 must
    feed pairs emitted for turns arriving in batch 2, with PIT semantics
    (context excludes the response turn itself)."""
    from feature_extractor_mbo_lob_spark.streaming.stream import streaming_sft_pairs

    schema = "conv_id string, turn_idx long, ts string, role string, text string"
    cast = lambda df: df.withColumn("ts", F.col("ts").cast("timestamp"))
    b1 = cast(spark.createDataFrame(
        [("c", 0, "2024-01-01 00:00:00", "user", "aaaa"),
         ("c", 1, "2024-01-01 00:01:00", "assistant", "bb")],
        schema,
    ))
    b2 = cast(spark.createDataFrame(
        [("c", 2, "2024-01-01 00:02:00", "user", "ccc"),
         ("c", 3, "2024-01-01 00:03:00", "assistant", "dddddd")],
        schema,
    ))
    src = str(tmp_path / "sft_src")
    b1.coalesce(1).write.parquet(src + "/f=1")
    b2.coalesce(1).write.parquet(src + "/f=2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = streaming_sft_pairs(stream, PipelineConfig(), min_context_turns=1)
    q = (
        out.writeStream.format("memory")
        .queryName("sft_carry_test")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {r["turn_idx"]: r for r in spark.table("sft_carry_test").collect()}
    assert set(got) == {1, 3}
    # batch-1 pair: 1 context turn, 4 chars, 1 user turn
    assert (got[1].context_turns, got[1].context_chars, got[1].context_user_turns) == (1, 4, 1)
    # batch-2 pair: counters carried (3 turns = aaaa+bb+ccc = 9 chars, 2 user)
    assert (got[3].context_turns, got[3].context_chars, got[3].context_user_turns) == (3, 9, 2)
    assert got[3].response_chars == 6


def test_idempotent_sink_skips_replayed_batches(spark, tmp_path):
    """Exactly-once foreachBatch sink: a second availableNow run over the
    same checkpoint adds only NEW data, and a manually replayed
    (batch_id, df) pair is skipped by the commit marker."""
    from feature_extractor_mbo_lob_spark.streaming.sink import (
        idempotent_parquet_sink,
        make_idempotent_batch_writer,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "conv_id string, turn_idx long, ts string, role string, text string"
    cast = lambda df: df.withColumn("ts", F.col("ts").cast("timestamp"))
    b1 = cast(spark.createDataFrame(
        [("c", 0, "2024-01-01 00:00:00", "user", "a")], schema))
    b1.coalesce(1).write.parquet(src + "/f=1")

    def run():
        stream = spark.readStream.schema(b1.schema).parquet(src + "/*")
        q = (
            idempotent_parquet_sink(stream, out, ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert spark.read.parquet(out + "/batch_id=*").count() == 1

    # second run, same checkpoint, one new file -> exactly one new row
    b2 = cast(spark.createDataFrame(
        [("c", 1, "2024-01-01 00:01:00", "assistant", "b")], schema))
    b2.coalesce(1).write.parquet(src + "/f=2")
    run()
    assert spark.read.parquet(out + "/batch_id=*").count() == 2

    # simulate the crash-replay: re-deliver an already-committed batch id
    writer = make_idempotent_batch_writer(out)
    writer(b1.withColumn("text", F.lit("DUPLICATE")), 0)
    rows = spark.read.parquet(out + "/batch_id=*").collect()
    assert len(rows) == 2 and not any(r.text == "DUPLICATE" for r in rows)


def test_sft_loss_spans_naive(spark):
    rows = []
    texts = {
        "a": [("user", "one two three"), ("assistant", "four five"),
              ("user", "six"), ("assistant", "seven eight nine ten")],
        "b": [("user", "x"), ("tool", "y z"), ("assistant", "w")],
    }
    for cid, turns in texts.items():
        for i, (role, t) in enumerate(turns):
            rows.append((cid, i, role, t, None, _ts(i)))
    df = _mk(spark, rows)
    out = {(r["conv_id"], r["turn_idx"]): r
           for r in forks.sft_loss_spans(df, CFG, budget=6).collect()}

    for cid, turns in texts.items():
        off = 0
        for i, (role, t) in enumerate(turns):
            nt = len(t.split())
            r = out[(cid, i)]
            assert r["n_tokens"] == nt
            assert r["span_start"] == min(off, 6)
            assert r["span_end"] == min(off + nt, 6)
            assert r["mask"] == (1 if role == "assistant" else 0)
            expect_loss = (min(off + nt, 6) - min(off, 6)) if role == "assistant" else 0
            assert r["loss_tokens"] == expect_loss
            off += nt
    # conversation a: 13 tokens, budget 6 => turn 3 fully clipped
    assert out[("a", 3)]["span_start"] == out[("a", 3)]["span_end"] == 6
    assert out[("a", 3)]["loss_tokens"] == 0
    # count-preserving: every turn still emitted
    assert len(out) == 7
