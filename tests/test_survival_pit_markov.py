"""Unit tests for the round-3 late families: Kaplan-Meier survival,
feature-store PIT assembly, Markov role-path log-likelihood, and the
mutual-information feature screen — semantics checked against tiny
hand-computable cases and naive recomputations, independent of the
DuckDB oracle gate."""

import math

import pytest
from pyspark.sql import functions as F

from feature_extractor_mbo_lob_spark import PipelineConfig
from feature_extractor_mbo_lob_spark.functions.corpus import mi_feature_screen
from feature_extractor_mbo_lob_spark.operators.asof import pit_training_set
from feature_extractor_mbo_lob_spark.operators.state import markov_role_loglik
from feature_extractor_mbo_lob_spark.operators.survival import (
    episode_durations,
    km_risk_table,
)


def _ts(s):
    return F.lit(s).cast("timestamp")


def test_km_risk_table_hand_case(spark):
    # durations: events at 2, 2, 5; censored at 3, 5
    rows = [(2, 1), (2, 1), (3, 0), (5, 1), (5, 0)]
    df = spark.createDataFrame(rows, "dur_s long, event long")
    out = {
        r["t_s"]: r
        for r in km_risk_table(df, "dur_s", "event").collect()
    }
    assert set(out) == {2, 3, 5}
    assert (out[2]["n_risk"], out[2]["d_events"], out[2]["c_censored"]) == (5, 2, 0)
    assert (out[3]["n_risk"], out[3]["d_events"], out[3]["c_censored"]) == (3, 0, 1)
    assert (out[5]["n_risk"], out[5]["d_events"], out[5]["c_censored"]) == (2, 1, 1)
    # KM invariant: n_risk at the smallest time == total subjects
    assert out[2]["n_risk"] == len(rows)


def test_km_risk_table_stratified(spark):
    rows = [("a", 1, 1), ("a", 4, 0), ("b", 1, 1)]
    df = spark.createDataFrame(rows, "g string, dur_s long, event long")
    out = km_risk_table(df, "dur_s", "event", group_cols=["g"]).collect()
    by = {(r["g"], r["t_s"]): r["n_risk"] for r in out}
    assert by[("a", 1)] == 2 and by[("a", 4)] == 1 and by[("b", 1)] == 1


def test_episode_durations_censoring(spark, cfg):
    # one conv: invoke t0 (completed at t0+10s), invoke t20 (never completed,
    # conv ends at t30 -> censored with duration 10s)
    rows = [
        ("c1", 0, "assistant", "x", "t1", "2024-01-01 00:00:00"),
        ("c1", 1, "tool", "y", "t1", "2024-01-01 00:00:10"),
        ("c1", 2, "assistant", "x", "t1", "2024-01-01 00:00:20"),
        ("c1", 3, "user", "z", None, "2024-01-01 00:00:30"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = episode_durations(df, cfg, granularity_s=1).collect()
    got = sorted((r["dur_s"], r["event"]) for r in out)
    assert got == [(10, 0), (10, 1)]


def test_pit_training_set_ttl_and_leakage(spark):
    spine = spark.createDataFrame(
        [("c", 0, "2024-01-01 00:10:00"), ("c", 1, "2024-01-01 02:00:00")],
        "conv_id string, turn_idx int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    f1 = spark.createDataFrame(
        [("c", "2024-01-01 00:05:00", 7), ("c", "2024-01-01 03:00:00", 9)],
        "conv_id string, ts string, v long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["turn_idx"]: r["v"]
        for r in pit_training_set(spine, [(f1, 1800.0)]).collect()
    }
    # anchor 0: feature 5 min old, inside TTL -> 7.  anchor 1: the only past
    # feature is 115 min old (> 30 min TTL) -> NULL; the 03:00 future row
    # must NEVER leak backward.
    assert out[0] == 7
    assert out[1] is None


def test_markov_loglik_matches_naive(spark, transcripts, cfg):
    out = {r["conv_id"]: r for r in markov_role_loglik(transcripts, cfg).collect()}
    rows = sorted(
        transcripts.select("conv_id", "turn_idx", "ts", "role").collect(),
        key=lambda r: (r["conv_id"], r["turn_idx"], r["ts"]),
    )
    edges = []
    prev = {}
    for r in rows:
        if r["conv_id"] in prev:
            edges.append((prev[r["conv_id"]], r["role"]))
        prev[r["conv_id"]] = r["role"]
    from collections import Counter

    n_pq = Counter(edges)
    n_p = Counter(p for p, _ in edges)
    n_roles = len({q for _, q in edges})
    nano = {
        (p, q): math.floor(
            math.log((c + 1) / (n_p[p] + n_roles)) * 1e9 + 0.5
        )
        for (p, q), c in n_pq.items()
    }
    expect = {}
    prev = {}
    for r in rows:
        cid = r["conv_id"]
        if cid in prev:
            n, s = expect.get(cid, (0, 0))
            expect[cid] = (n + 1, s + nano[(prev[cid], r["role"])])
        prev[cid] = r["role"]
    for cid, (n, s) in expect.items():
        assert out[cid]["n_transitions"] == n
        assert out[cid]["ll_nanos"] == s


def test_mi_features_nonnegative_and_consistent(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta", "en"),
            (1, "alpha beta", "en"),
            (2, "gamma delta", "fr"),
            (3, "gamma delta", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["word"]: r for r in mi_feature_screen(docs, vocab_k=10).collect()}
    # perfectly label-separating words: I = ln 2 nats exactly
    for w in ("alpha", "gamma"):
        mi = out[w]["mi_num_nanos"] / out[w]["n_docs"] / 1e9
        assert mi == pytest.approx(math.log(2), abs=1e-6)
    assert out["alpha"]["n_docs_with"] == 2
    # MI of the presence indicator is bounded by label entropy (ln 2 here)
    for r in out.values():
        assert r["mi_num_nanos"] / r["n_docs"] / 1e9 <= math.log(2) + 1e-9


def test_dbscan_from_pairs_hand_case(spark):
    from feature_extractor_mbo_lob_spark.operators.density import dbscan_from_pairs

    # chain 1-2-3-4 (2,3 are cores at min_pts=3), 5 borders on nothing,
    # 6 isolated noise; 10-11-12 triangle: all cores, one cluster
    pts = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 6, 10, 11, 12)], "vec_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12)], "id_a long, id_b long"
    )
    out = {r["vec_id"]: r for r in dbscan_from_pairs(pts, pairs, min_pts=3).collect()}
    # 2 and 3 have degree 2 -> core; 1 and 4 degree 1 -> border of cluster 2
    assert out[2]["is_core"] == 1 and out[3]["is_core"] == 1
    assert out[2]["cluster_id"] == 2 and out[3]["cluster_id"] == 2
    assert out[1]["is_core"] == 0 and out[1]["cluster_id"] == 2
    assert out[4]["is_core"] == 0 and out[4]["cluster_id"] == 2
    # triangle: everyone core, cluster = min id 10
    for i in (10, 11, 12):
        assert out[i]["is_core"] == 1 and out[i]["cluster_id"] == 10
    # isolated points: noise
    assert out[5]["cluster_id"] == -1 and out[6]["cluster_id"] == -1


def test_dbscan_core_singleton_cluster(spark):
    from feature_extractor_mbo_lob_spark.operators.density import dbscan_from_pairs

    # star: center 0 with 3 border leaves; only 0 is core (deg 3), leaves
    # deg 1 -> border; core has NO core neighbor -> singleton cluster id 0
    pts = spark.createDataFrame([(i,) for i in range(4)], "vec_id long")
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "id_a long, id_b long")
    out = {r["vec_id"]: r for r in dbscan_from_pairs(pts, pairs, min_pts=4).collect()}
    assert out[0]["is_core"] == 1 and out[0]["cluster_id"] == 0
    for i in (1, 2, 3):
        assert out[i]["is_core"] == 0 and out[i]["cluster_id"] == 0


def test_random_projection_exact_vs_numpy(spark):
    import numpy as np

    from feature_extractor_mbo_lob_spark.operators.similarity import (
        hyperplanes,
        random_projection,
    )

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(20, 16)).astype("float64")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    out = random_projection(emb, out_dim=4, seed=11, dim=16).collect()
    H = np.array(hyperplanes(16, 4, 11))  # [4, 16] of +-1
    Q = np.floor(vecs * 1e6 + 0.5).astype("int64")
    expect = Q @ H.T.astype("int64")  # [20, 4]
    for r in out:
        assert r["proj_micro"] == expect[r["vec_id"], r["j"]]
    assert len(out) == 80


def test_streaming_pit_state_carries_across_batches(spark, tmp_path):
    """streaming_pit_enrich: a feature row ingested in batch 1 must enrich
    an anchor arriving in batch 2 (state persistence), TTL expiry must
    NULL a stale feature, and a future feature must never leak backward."""
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark import PipelineConfig
    from feature_extractor_mbo_lob_spark.streaming.stream import streaming_pit_enrich

    cfg = PipelineConfig()
    schema = "conv_id string, ts string, turn_idx long, side int, fval long"
    src = str(tmp_path / "pit_src")
    cast = lambda df: df.withColumn("ts", F.col("ts").cast("timestamp"))
    # batch 1: feature at t=0s (val 7); anchor at t=60s (fresh -> 7)
    b1 = cast(spark.createDataFrame(
        [("c", "2024-01-01 00:00:00", 0, 0, 7), ("c", "2024-01-01 00:01:00", 1, 1, None)],
        schema,
    ))
    # batch 2 (separate file): anchor at t=120s (still fresh -> 7),
    # anchor at t=2h (stale beyond 3600s TTL -> NULL),
    # feature val 9 AFTER that anchor (must not leak)
    b2 = cast(spark.createDataFrame(
        [
            ("c", "2024-01-01 00:02:00", 2, 1, None),
            ("c", "2024-01-01 02:00:00", 3, 1, None),
            ("c", "2024-01-01 03:00:00", 4, 0, 9),
        ],
        schema,
    ))
    b1.coalesce(1).write.parquet(src + "/f=1")
    b2.coalesce(1).write.parquet(src + "/f=2")

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = streaming_pit_enrich(stream, cfg, ttl_s=3600.0, value_col="fval")
    q = (
        out.writeStream.format("memory")
        .queryName("pit_carry_test")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {r["turn_idx"]: r["fval"] for r in spark.table("pit_carry_test").collect()}
    assert got[1] == 7        # same-batch enrichment
    assert got[2] == 7        # state carried into batch 2
    assert got[3] is None     # TTL expired
    assert 4 not in got       # feature rows emit nothing


def test_banded_lsh_dominates_single_band(spark):
    """OR-of-ANDs amplification: the 16x4 banded candidate graph must
    recover at least every pair the single 8-plane band recovers, and the
    tuning-table recalls must reflect that ordering."""
    from feature_extractor_mbo_lob_spark.operators.density import neighbor_recall

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    r = neighbor_recall(emb, eps_micro=1_300_000, sample_buckets=2).first()
    assert r["n_exact"] > 0
    assert r["recall_banded_ppm"] >= r["recall_single_ppm"]
    assert r["inter_single"] == r["n_single"]  # LSH pairs are exact-filtered
    assert r["inter_banded"] == r["n_banded"]
    # amplification must be material on near-uniform vectors
    assert r["recall_banded_ppm"] >= 500_000


def test_nelson_aalen_hand_case(spark):
    from feature_extractor_mbo_lob_spark.operators.survival import nelson_aalen_table

    # events at 2, 2, 5; censored at 3, 5 (same fixture as the KM case)
    rows = [(2, 1), (2, 1), (3, 0), (5, 1), (5, 0)]
    df = spark.createDataFrame(rows, "dur_s long, event long")
    rt = km_risk_table(df, "dur_s", "event")
    out = {r["t_s"]: r for r in nelson_aalen_table(rt, scale=10**9).collect()}
    S = 10**9
    # t=2: d=2, n=5 -> inc = 2S//5; var = 2S//25
    assert out[2]["h_cum_fp"] == 2 * S // 5
    assert out[2]["var_cum_fp"] == 2 * S // 25
    # t=3: censoring only, hazard unchanged
    assert out[3]["h_cum_fp"] == out[2]["h_cum_fp"]
    # t=5: d=1, n=2 -> + S//2; var + S//4
    assert out[5]["h_cum_fp"] == 2 * S // 5 + S // 2
    assert out[5]["var_cum_fp"] == 2 * S // 25 + S // 4
    # monotone nondecreasing in t
    ts = sorted(out)
    assert all(
        out[a]["h_cum_fp"] <= out[b]["h_cum_fp"] for a, b in zip(ts, ts[1:])
    )


def test_nelson_aalen_wide_counts_no_wrap(spark):
    """d * scale beyond int64: decimal(38,0) widening must keep the
    increment exact (the HITS round-4 lesson)."""
    from feature_extractor_mbo_lob_spark.operators.survival import nelson_aalen_table

    d = 10_000_000_000  # 1e10 events at one time: d * 1e9 = 1e19 > int64 max
    rt = spark.createDataFrame(
        [(1, d, d, 0)], "t_s long, n_risk long, d_events long, c_censored long"
    )
    out = nelson_aalen_table(rt, scale=10**9).collect()[0]
    assert out["h_cum_fp"] == 10**9  # d == n -> hazard exactly 1.0
    assert out["var_cum_fp"] == 0  # 1e9 // 1e10 == 0


# --- log-rank test -------------------------------------------------------------------


def _naive_logrank_chi2(obs):
    """Independent float log-rank: obs = [(t, event, grp)]."""
    times = sorted({t for t, e, g in obs if e == 1})
    o1 = e1 = v = 0.0
    for t in times:
        at_risk = [(e, g) for tt, e, g in obs if tt >= t]
        n = len(at_risk)
        n1 = sum(g for _, g in at_risk)
        d = sum(e for tt, e, g in obs if tt == t and e == 1)
        d1 = sum(e * g for tt, e, g in obs if tt == t and e == 1)
        o1 += d1
        e1 += d * n1 / n
        if n > 1:
            v += d * n1 * (n - n1) * (n - d) / (n * n * (n - 1))
    return (o1 - e1) ** 2 / v if v > 0 else 0.0


def test_logrank_matches_naive_float_reference(spark):
    from feature_extractor_mbo_lob_spark.operators.survival import logrank_test

    obs = [
        (1, 1, 0), (2, 1, 0), (3, 1, 0), (4, 0, 0), (7, 1, 0),
        (2, 1, 1), (3, 0, 1), (5, 1, 1), (6, 1, 1), (8, 0, 1),
    ]
    df = spark.createDataFrame(obs, "dur_s long, event long, grp long")
    r = logrank_test(df, "dur_s", "event", "grp").collect()[0]
    assert r.o1 == sum(e * g for _, e, g in obs)
    assert r.o2 == sum(e * (1 - g) for _, e, g in obs)
    naive = _naive_logrank_chi2(obs)
    # fixed-point floors introduce <=1e-9 per accumulated term
    assert abs(r.chi2_raw - naive) < 1e-6


def test_logrank_symmetric_groups_near_zero(spark):
    from feature_extractor_mbo_lob_spark.operators.survival import logrank_test

    # identical duration/event multisets in both groups
    base = [(1, 1), (2, 1), (3, 0), (5, 1), (9, 0)]
    obs = [(t, e, g) for t, e in base for g in (0, 1)]
    df = spark.createDataFrame(obs, "dur_s long, event long, grp long")
    r = logrank_test(df, "dur_s", "event", "grp").collect()[0]
    assert r.o1 == r.o2
    assert r.chi2_raw < 1e-9
