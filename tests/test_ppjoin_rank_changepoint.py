"""Round-3 late additions: exact PPJoin similarity join, trailing
percentile-rank PIT feature, CUSUM changepoint locator."""

import pytest
from pyspark.sql import functions as F

from feature_extractor_mbo_lob_spark import PipelineConfig
from feature_extractor_mbo_lob_spark.operators.dedup import ppjoin_pairs
from feature_extractor_mbo_lob_spark.operators.rolling import with_trailing_rank
from feature_extractor_mbo_lob_spark.operators.state import conv_changepoint


# --------------------------------------------------------------------------
# ppjoin: losslessness vs brute force
# --------------------------------------------------------------------------

def _brute_force_pairs(spark, docs, pct):
    """All Jaccard >= pct/100 pairs via the quadratic co-occurrence join —
    the semantics, with no filtering cleverness to share bugs with."""
    from feature_extractor_mbo_lob_spark.functions.repetition import (
        normalized_words,
    )

    tok = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(normalized_words("text"))).alias("word"),
    )
    m = tok.groupBy("id").agg(F.count(F.lit(1)).alias("m"))
    co = (
        tok.alias("a")
        .join(tok.alias("b"), "word")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    j = (
        co.join(m.withColumnRenamed("id", "id_a").withColumnRenamed("m", "ma"), "id_a")
        .join(m.withColumnRenamed("id", "id_b").withColumnRenamed("m", "mb"), "id_b")
        .withColumn("union_sz", (F.col("ma") + F.col("mb") - F.col("inter")).cast("long"))
        .filter(F.lit(100) * F.col("inter") >= F.lit(pct) * F.col("union_sz"))
    )
    return {
        (r["id_a"], r["id_b"], r["inter"], r["union_sz"])
        for r in j.select("id_a", "id_b", "inter", "union_sz").collect()
    }


@pytest.mark.parametrize("pct", [60, 90])
def test_ppjoin_lossless_vs_brute_force(spark, pct):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    got = {
        (r["id_a"], r["id_b"], r["inter"], r["union_sz"])
        for r in ppjoin_pairs(docs, threshold_pct=pct).collect()
    }
    want = _brute_force_pairs(spark, docs, pct)
    assert got == want
    assert len(got) > 0  # the corpus is template-heavy; emptiness = broken


def test_ppjoin_handcrafted_semantics(spark):
    rows = [
        (1, "a b c d e"),          # vs 2: inter 4, union 6 -> 0.667
        (2, "a b c d x"),
        (3, "a b c d e"),          # identical to 1 -> J = 1.0
        (4, "z y"),                # no qualifying partner
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["union_sz"], r["jaccard_ppm"])
        for r in ppjoin_pairs(docs, threshold_pct=60).collect()
    }
    assert got[(1, 3)] == (5, 5, 1_000_000)
    assert got[(1, 2)] == (4, 6, 666_666)
    assert got[(2, 3)] == (4, 6, 666_666)
    assert (1, 4) not in got and (2, 4) not in got and (3, 4) not in got
    # tau = 0.7 kills the 0.667 pairs but keeps the exact dup
    got70 = {
        (r["id_a"], r["id_b"]) for r in ppjoin_pairs(docs, threshold_pct=70).collect()
    }
    assert got70 == {(1, 3)}


# --------------------------------------------------------------------------
# trailing rank
# --------------------------------------------------------------------------

def test_trailing_rank_exact_semantics(spark):
    # one conversation, values engineered for known ranks at w=4
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    vals = [10, 20, 20, 5, 30]
    rows = [
        ("c1", i, "user", "x" * v, None, t0 + dt.timedelta(seconds=i))
        for i, v in enumerate(vals)
    ]
    from feature_extractor_mbo_lob_spark.sources.transcripts import (
        TRANSCRIPT_SCHEMA,
    )

    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    cfg = PipelineConfig()
    out = with_trailing_rank(df, cfg, window_sizes=(4,))
    got = {
        r["turn_idx"]: r["rank_ppm_w4"]
        for r in out.select("turn_idx", "rank_ppm_w4").collect()
    }
    # turn 0: window [10]            n=1 -> 0
    # turn 1: [10,20]    cnt_le=2 -> (2-1)*1e6 div 1 = 1_000_000
    # turn 2: [10,20,20] cnt_le=3 -> (3-1)*1e6 div 2 = 1_000_000 (weak max)
    # turn 3: [10,20,20,5] cnt_le=1 -> 0 (strict min)
    # turn 4: [20,20,5,30] cnt_le=4 -> 1_000_000
    assert got == {0: 0, 1: 1_000_000, 2: 1_000_000, 3: 0, 4: 1_000_000}


def test_trailing_rank_is_pit_safe(spark, transcripts, cfg):
    """Appending future turns must not change any existing turn's rank."""
    out_full = with_trailing_rank(transcripts, cfg, window_sizes=(8,))
    cut = transcripts.filter(F.col("turn_idx") <= 10)
    out_cut = with_trailing_rank(cut, cfg, window_sizes=(8,))
    full = {
        (r["conv_id"], r["turn_idx"]): r["rank_ppm_w8"]
        for r in out_full.filter(F.col("turn_idx") <= 10).collect()
    }
    cutv = {
        (r["conv_id"], r["turn_idx"]): r["rank_ppm_w8"]
        for r in out_cut.collect()
    }
    assert full == cutv


# --------------------------------------------------------------------------
# changepoint
# --------------------------------------------------------------------------

def _naive_changepoint(xs):
    n = len(xs)
    sn = sum(xs)
    best = None
    for k in range(1, n):
        sk = sum(xs[:k])
        stat = abs(n * sk - k * sn)
        if best is None or stat > best[1]:
            best = (k, stat)
    return best


def test_changepoint_level_shift(spark):
    from feature_extractor_mbo_lob_spark.sources.transcripts import (
        TRANSCRIPT_SCHEMA,
    )

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # 6 short turns then 6 long turns: the shift enters at k = 6
    vals = [10] * 6 + [100] * 6
    rows = [
        ("c1", i, "user", "x" * v, None, t0 + dt.timedelta(seconds=i))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    r = conv_changepoint(df, PipelineConfig()).first()
    k, stat = _naive_changepoint(vals)
    assert (r["cp_k"], r["cp_stat"], r["n_turns"]) == (k, stat, 12)
    assert r["cp_k"] == 6


def test_changepoint_matches_naive_on_corpus(spark, transcripts, cfg):
    got = {
        r["conv_id"]: (r["cp_k"], r["cp_stat"], r["n_turns"])
        for r in conv_changepoint(transcripts, cfg).collect()
    }
    pdf = (
        transcripts.select("conv_id", "turn_idx", "ts", F.length("text").alias("x"))
        .orderBy("conv_id", "turn_idx", "ts")
        .toPandas()
    )
    for conv, grp in pdf.groupby("conv_id"):
        xs = list(grp["x"])
        if len(xs) < 2:
            assert conv not in got
            continue
        k, stat = _naive_changepoint(xs)
        assert got[conv] == (k, stat, len(xs)), conv


def test_changepoint_tie_takes_smallest_k(spark):
    from feature_extractor_mbo_lob_spark.sources.transcripts import (
        TRANSCRIPT_SCHEMA,
    )

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # constant series: every k has stat 0 -> smallest k = 1 wins
    rows = [
        ("c1", i, "user", "xxxx", None, t0 + dt.timedelta(seconds=i))
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    r = conv_changepoint(df, PipelineConfig()).first()
    assert (r["cp_k"], r["cp_stat"]) == (1, 0)


# --------------------------------------------------------------------------
# association rules
# --------------------------------------------------------------------------

def test_association_rules_handcrafted(spark):
    from feature_extractor_mbo_lob_spark.functions.corpus import association_rules

    rows = [
        ("c1", "a"), ("c1", "b"),
        ("c2", "a"), ("c2", "b"),
        ("c3", "a"),
        ("c4", "b"), ("c4", "a"),   # duplicate-free after distinct
        ("c4", "b"),
        ("c5", "c"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, tool string")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(df).collect()
    }
    r = got[("a", "b")]
    # N=5 groups; n_a=4, n_b=3, n_ab=3
    assert (r["n_ab"], r["n_a"], r["n_b"], r["n_groups"]) == (3, 4, 3, 5)
    assert r["support_ppm"] == 3 * 1_000_000 // 5
    assert r["confidence_ppm"] == 3 * 1_000_000 // 4
    assert r["lift_ppm"] == 3 * 5 * 1_000_000 // (4 * 3)
    # reverse direction: confidence differs, lift is symmetric
    rb = got[("b", "a")]
    assert rb["confidence_ppm"] == 1_000_000
    assert rb["lift_ppm"] == r["lift_ppm"]
    # c co-occurs with nothing
    assert ("c", "a") not in got and ("a", "c") not in got


# --------------------------------------------------------------------------
# embedding source drift
# --------------------------------------------------------------------------

def test_source_centroid_drift_naive_replica(spark):
    import numpy as np
    from feature_extractor_mbo_lob_spark.operators.similarity import (
        source_centroid_drift,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (r["group_a"], r["group_b"]): (r["n_a"], r["n_b"], r["centroid_d2_micro2"])
        for r in source_centroid_drift(emb, docs).collect()
    }

    epdf = emb.select("vec_id", "embedding").toPandas()
    dpdf = docs.select("doc_id", "source").toPandas()
    src = dict(zip(dpdf["doc_id"], dpdf["source"]))
    groups = {}
    for vid, v in zip(epdf["vec_id"], epdf["embedding"]):
        g = src.get(vid)
        if g is None:
            continue
        q = np.floor(np.asarray(v, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)
        groups.setdefault(g, []).append(q)
    cent = {}
    for g, qs in groups.items():
        s = np.sum(np.stack(qs), axis=0)
        n = len(qs)
        # truncation toward zero (both engines' div semantics)
        c = (np.sign(s) * (np.abs(s) // n)).astype(np.int64)
        cent[g] = (c, n)
    names = sorted(cent)
    want = {}
    for i, ga in enumerate(names):
        for gb in names[i + 1:]:
            ca, na = cent[ga]
            cb, nb = cent[gb]
            want[(ga, gb)] = (na, nb, int(((ca - cb) ** 2).sum()))
    assert got == want


# --------------------------------------------------------------------------
# quantile normalization
# --------------------------------------------------------------------------

def test_quantile_normalize_naive_replica(spark):
    import math

    from feature_extractor_mbo_lob_spark.normalization import quantile_normalize

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r["doc_id"]: (r["source"], r["n_chars"], r["n_chars_qnorm"])
        for r in quantile_normalize(docs, "n_chars").collect()
    }
    pdf = docs.select("doc_id", "source", "n_chars").toPandas()
    pooled = sorted(pdf["n_chars"])
    N = len(pooled)
    want = {}
    for _, grp in pdf.groupby("source"):
        rows = sorted(zip(grp["n_chars"], grp["doc_id"]))
        ng = len(rows)
        for rk, (val, did) in enumerate(rows, start=1):
            rt = (rk * N + ng - 1) // ng
            want[did] = (int(val), int(pooled[rt - 1]))
    assert len(got) == len(want)
    for did, (src, val, qn) in got.items():
        assert (val, qn) == want[did], did
    # invariants: every group's top rank maps to the global max; the
    # pooled max is reproduced in every group
    gmax = max(pooled)
    for _, grp in pdf.groupby("source"):
        top_doc = grp.sort_values(["n_chars", "doc_id"]).iloc[-1]["doc_id"]
        assert got[top_doc][2] == gmax


# --------------------------------------------------------------------------
# greedy k-center
# --------------------------------------------------------------------------

def test_kcenter_matches_naive_greedy(spark):
    import numpy as np
    from feature_extractor_mbo_lob_spark.operators.similarity import kcenter_select

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = [
        (r["step"], r["vec_id"], r["radius_d2"])
        for r in kcenter_select(emb, k=5).orderBy("step").collect()
    ]

    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    Q = np.floor(
        np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])[order]
        * 1e6 + 0.5
    ).astype(np.int64)
    chosen = [0]  # index of min id
    mind2 = ((Q - Q[0]) ** 2).sum(axis=1)
    want = [(1, int(ids[0]), 0)]
    for step in range(2, 6):
        # argmax with smallest-id tie (ids sorted asc, so first argmax wins)
        j = int(np.argmax(mind2))
        want.append((step, int(ids[j]), int(mind2[j])))
        mind2 = np.minimum(mind2, ((Q - Q[j]) ** 2).sum(axis=1))
    assert got == want
    # radii must be non-increasing from step 2 on (greedy invariant)
    radii = [r for s, _, r in got if s >= 2]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_k_exceeding_corpus_clamps(spark):
    from feature_extractor_mbo_lob_spark.operators.similarity import kcenter_select

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        "vec_id < 3"
    )
    rows = kcenter_select(emb, k=10).collect()
    assert len(rows) == 3
    assert len({r["vec_id"] for r in rows}) == 3  # no duplicate picks


# --------------------------------------------------------------------------
# review-hardening regressions
# --------------------------------------------------------------------------

def test_trailing_rank_null_values_and_string_col(spark):
    """NULL values get NULL ranks (not negative ppm); string col names
    resolve via F.col like the sibling operators."""
    import datetime as dt

    from feature_extractor_mbo_lob_spark.sources.transcripts import (
        TRANSCRIPT_SCHEMA,
    )
    from pyspark.sql import types as T

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "user", "aaaa", None, t0),
        ("c1", 1, "user", None, None, t0 + dt.timedelta(seconds=1)),
        ("c1", 2, "user", "aaaaaaaa", None, t0 + dt.timedelta(seconds=2)),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).withColumn(
        "xlen", F.length("text")
    )
    out = with_trailing_rank(df, PipelineConfig(), col="xlen", window_sizes=(4,))
    got = {r["turn_idx"]: r["rank_ppm_w4"] for r in out.collect()}
    assert got[0] == 0            # first row, 1-element window
    assert got[1] is None         # NULL value -> NULL rank, never negative
    assert got[2] == 1_000_000    # max among non-null history {4, 8}


def test_changepoint_accepts_string_col(spark, transcripts, cfg):
    a = conv_changepoint(transcripts, cfg).collect()
    b = conv_changepoint(
        transcripts.withColumn("xlen", F.length("text")), cfg, col="xlen"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kcenter_empty_input(spark):
    from feature_extractor_mbo_lob_spark.operators.similarity import kcenter_select

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        "vec_id < 0"
    )
    assert kcenter_select(emb, k=5).count() == 0


def test_exact_eps_pairs_empty_and_cap(spark):
    import pytest as pt

    from feature_extractor_mbo_lob_spark.operators.density import exact_eps_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e = emb.selectExpr("cast(vec_id as long) as id",
                       "cast(embedding as array<double>) as v")
    assert exact_eps_pairs(e.filter("id < 0"), 1_300_000).count() == 0
    with pt.raises(ValueError, match="max_broadcast_rows"):
        exact_eps_pairs(e, 1_300_000, max_broadcast_rows=10).count()


def test_quantile_normalize_float_passthrough(spark):
    """Float features must NOT be truncated: values pass through exactly."""
    from feature_extractor_mbo_lob_spark.normalization import quantile_normalize

    rows = [(i, f"s{i % 2}", 0.1 * i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, x double")
    out = {r["doc_id"]: (r["x"], r["x_qnorm"])
           for r in quantile_normalize(df, "x").collect()}
    xs = sorted(0.1 * i for i in range(10))
    assert out[9][0] == 0.9 and out[9][1] == xs[-1]   # not truncated to 0
    assert all(isinstance(v[1], float) for v in out.values())


def test_source_drift_single_source_and_profile_job_guard(spark):
    """One source -> zero pair rows (and profile job reports None, not a
    TypeError)."""
    from feature_extractor_mbo_lob_spark.operators.similarity import (
        source_centroid_drift,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").withColumn(
        "source", F.lit("only")
    )
    assert source_centroid_drift(emb, docs).count() == 0


def test_source_drift_ragged_dims_yield_null_not_duplicates(spark):
    """A ragged-dimension vector must not split its group into duplicate
    pair rows; a cross-group dim mismatch surfaces as NULL d2."""
    from feature_extractor_mbo_lob_spark.operators.similarity import (
        source_centroid_drift,
    )

    rows = [
        (0, [1.0, 2.0], "a"), (1, [2.0, 3.0], "a"),
        (2, [1.0], "a"),                      # ragged inside group a
        (3, [5.0, 6.0], "b"),
    ]
    emb = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    )
    docs = spark.createDataFrame(
        [(i, s) for i, _, s in rows], "doc_id long, source string"
    )
    out = source_centroid_drift(emb, docs).collect()
    assert len(out) == 1                      # exactly one (a, b) row
    r = out[0]
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    assert r["centroid_d2_micro2"] is not None  # same max dim -> computable


def test_trailing_rank_kernel_matches_spark_path(spark, transcripts, cfg):
    """The numpy throughput twin is bit-identical to the JVM HOF path."""
    import numpy as np

    from feature_extractor_mbo_lob_spark.operators.order_stats import (
        trailing_rank_kernel,
    )

    out = with_trailing_rank(transcripts, cfg, window_sizes=(8, 32))
    pdf = (
        out.select("conv_id", "turn_idx", "ts", F.length("text").alias("x"),
                   "rank_ppm_w8", "rank_ppm_w32")
        .orderBy("conv_id", "turn_idx", "ts")
        .toPandas()
    )
    for _, g in pdf.groupby("conv_id"):
        xs = g["x"].to_numpy(dtype=np.int64)
        for w in (8, 32):
            want = trailing_rank_kernel(xs, w)
            got = g[f"rank_ppm_w{w}"].to_numpy(dtype=np.int64)
            assert (want == got).all()


# --------------------------------------------------------------------------
# Wald SPRT
# --------------------------------------------------------------------------

def test_ab_sprt_naive_replica_and_wald_semantics(spark):
    import hashlib

    from feature_extractor_mbo_lob_spark.functions.stats import (
        ab_sprt,
        sprt_constants,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {r["arm"]: r.asDict() for r in ab_sprt(
        ev, "user_id",
        (F.col("event_type") == "purchase") & (F.col("value") > 150.0),
    ).collect()}

    pdf = ev.toPandas()
    pdf["conv"] = ((pdf["event_type"] == "purchase") & (pdf["value"] > 150.0))
    users = pdf.groupby("user_id").agg(conv=("conv", "max"), ts0=("ts", "min"))
    C = sprt_constants()
    arms = {0: [], 1: []}
    for uid, row in users.iterrows():
        h = int(hashlib.md5(str(uid).encode()).hexdigest()[:7], 16) % 2
        arms[h].append((row["ts0"], uid, int(row["conv"])))
    for arm, rows in arms.items():
        rows.sort()
        k = 0
        dec = None
        for n, (_, _, c) in enumerate(rows, start=1):
            k += c
            llr = k * C["succ"] + (n - k) * C["fail"]
            if dec is None and (llr >= C["upper"] or llr <= C["lower"]):
                dec = ("h1" if llr >= C["upper"] else "h0", n, llr)
        g = got[arm]
        assert g["n_users"] == len(rows)
        assert g["n_conv"] == sum(r[2] for r in rows)
        assert g["llr_final_nano"] == k * C["succ"] + (len(rows) - k) * C["fail"]
        if dec is None:
            assert g["decision"] == "continue" and g["n_at_decision"] is None
        else:
            assert (g["decision"], g["n_at_decision"],
                    g["llr_at_decision_nano"]) == dec


def test_cuped_reduces_variance_and_preserves_effect_shape(spark):
    """CUPED sanity on the driver corpus: theta is finite; the adjusted
    effect equals the raw effect minus theta times the pre-period arm
    imbalance (algebraic identity), verified against a pandas replica."""
    import hashlib

    from feature_extractor_mbo_lob_spark.functions.stats import (
        cuped_adjusted_effect,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    r = cuped_adjusted_effect(ev, "user_id").first()

    pdf = ev.toPandas()
    us = pdf["ts"].astype("int64") // 1000  # ns -> us
    cut = (int(us.min()) + int(us.max())) // 2
    pdf["c"] = (pdf["value"] * 100.0 + 0.5).apply(lambda v: int(v // 1))
    pdf["x"] = pdf["c"].where(us < cut, 0)
    pdf["y"] = pdf["c"].where(us >= cut, 0)
    users = pdf.groupby("user_id")[["x", "y"]].sum()
    users["arm"] = [
        int(hashlib.md5(str(u).encode()).hexdigest()[:7], 16) % 2
        for u in users.index
    ]
    n = len(users)
    sx, sy = int(users["x"].sum()), int(users["y"].sum())
    sxx = int((users["x"] ** 2).sum())
    sxy = int((users["x"] * users["y"]).sum())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a, b = users[users["arm"] == 0], users[users["arm"] == 1]
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    assert (r["sx_a"], r["sy_a"]) == (int(a["x"].sum()), int(a["y"].sum()))
    assert abs(r["theta"] - theta) < 1e-6
    eff_raw = b["y"].mean() - a["y"].mean()
    eff_cuped = (b["y"].mean() - theta * b["x"].mean()) - (
        a["y"].mean() - theta * a["x"].mean()
    )
    assert abs(r["effect_raw_cents"] - eff_raw) < 1e-4
    assert abs(r["effect_cuped_cents"] - eff_cuped) < 1e-4
    # algebraic identity: adj = raw - theta * (mean_x_b - mean_x_a)
    assert abs(
        r["effect_cuped_cents"]
        - (r["effect_raw_cents"] - theta * (b["x"].mean() - a["x"].mean()))
    ) < 1e-4
