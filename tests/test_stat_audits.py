"""Tests for the statistical-audit family: Mann-Whitney U, Mann-Kendall
trend, stratified A/B (CMH/Simpson) audit, k-anonymity gate, RAKE."""

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from feature_extractor_mbo_lob_spark.functions.privacy import k_anonymity_audit
from feature_extractor_mbo_lob_spark.functions.stats import (
    mann_kendall_trend,
    mann_whitney_u,
    stratified_ab_audit,
)
from feature_extractor_mbo_lob_spark.functions.text import rake_keywords


def _arms(spark, uids):
    from feature_extractor_mbo_lob_spark.functions.corpus import md5_bucket

    df = spark.createDataFrame([(u,) for u in uids], "uid long")
    return {r.uid: r.arm for r in
            df.select("uid", md5_bucket("uid", 2).alias("arm")).collect()}


def test_mann_whitney_matches_naive_midranks(spark):
    import datetime

    # per-user single event; values engineered with ties
    vals = {u: [3.0, 5.0, 5.0, 7.0, 9.0, 5.0, 3.0, 11.0][u % 8] for u in range(40)}
    ts = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(u, ts, vals[u]) for u in range(40)], "user_id long, ts timestamp, value double"
    )
    out = mann_whitney_u(ev, "user_id").collect()[0]

    arms = _arms(spark, range(40))
    cents = {u: round(vals[u] * 100) for u in range(40)}
    # naive midranks (doubled): sort all, 2*midrank = min_rank + max_rank
    allv = sorted(cents.values())
    first = {}
    for i, v in enumerate(allv, 1):
        first.setdefault(v, i)
    cnt = Counter(allv)
    two_mid = {v: 2 * first[v] + cnt[v] - 1 for v in cnt}
    n_a = sum(1 for u in range(40) if arms[u] == 0)
    r2_a = sum(two_mid[cents[u]] for u in range(40) if arms[u] == 0)
    tie = sum(c ** 3 - c for c in cnt.values())
    assert out.n_a == n_a
    assert out.n_b == 40 - n_a
    assert out.r2_sum_a == r2_a
    assert out.u2_a == r2_a - n_a * (n_a + 1)
    assert out.tie_term == tie


def test_mann_kendall_monotone_and_ties(spark):
    import datetime

    # day d gets d+1 events for d in 0..5, then two tied days with 3 events
    rows = []
    for d in range(6):
        for i in range(d + 1):
            rows.append((datetime.datetime(2024, 1, 1 + d, 12, 0, i),))
    for d in (6, 7):
        for i in range(3):
            rows.append((datetime.datetime(2024, 1, 1 + d, 12, 0, i),))
    ev = spark.createDataFrame(rows, "ts timestamp")
    out = mann_kendall_trend(ev).collect()[0]
    counts = [1, 2, 3, 4, 5, 6, 3, 3]
    s = sum(
        (1 if counts[j] > counts[i] else -1 if counts[j] < counts[i] else 0)
        for i in range(8) for j in range(i + 1, 8)
    )
    t = Counter(counts)
    assert out.n_days == 8
    assert out.n_pairs == 28
    assert out.s_stat == s
    assert out.tie_term == sum(c * (c - 1) * (2 * c + 5) for c in t.values())
    assert out.n_distinct_counts == len(t)


def test_stratified_audit_matches_naive_and_flags_reversal(spark):
    import datetime

    # conv iff value > 10; strata 'x' and 'y'
    arms = _arms(spark, range(60))
    rows = []
    for u in range(60):
        for s in ("x", "y"):
            v = 20.0 if (u + len(s)) % 3 == 0 else 1.0
            rows.append((u, s, datetime.datetime(2024, 1, 1), v))
    ev = spark.createDataFrame(rows, "user_id long, stratum string, ts timestamp, value double")
    out = {r.stratum: r for r in
           stratified_ab_audit(ev, "user_id", "stratum", F.col("value") > 10.0).collect()}

    naive = defaultdict(lambda: [0, 0, 0, 0])  # n_a, conv_a, n_b, conv_b
    for u in range(60):
        for s in ("x", "y"):
            conv = 1 if (u + len(s)) % 3 == 0 else 0
            c = naive[s]
            if arms[u] == 0:
                c[0] += 1
                c[1] += conv
            else:
                c[2] += 1
                c[3] += conv
    tot = [sum(naive[s][i] for s in naive) for i in range(4)]
    o_xp = tot[3] * tot[0] - tot[1] * tot[2]
    o_sign = 1 if o_xp > 0 else -1 if o_xp < 0 else 0
    for s in ("x", "y"):
        n_a, conv_a, n_b, conv_b = naive[s]
        xp = conv_b * n_a - conv_a * n_b
        sign = 1 if xp > 0 else -1 if xp < 0 else 0
        r = out[s]
        assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (n_a, conv_a, n_b, conv_b)
        assert r.stratum_sign == sign
        assert r.overall_sign == o_sign
        assert r.simpson_flag == (o_sign != 0 and sign != 0 and sign != o_sign)


def test_k_anonymity_audit_exact(spark):
    # classes: (a,1)x12 users 0..3 repeating, (a,2)x3 single user, (b,1)x1
    rows = (
        [("a", 1, u % 4) for u in range(12)]
        + [("a", 2, 7)] * 3
        + [("b", 1, 9)]
    )
    df = spark.createDataFrame(rows, "qa string, qb int, sens long")
    out = k_anonymity_audit(df, ["qa", "qb"], "sens",
                            k_threshold=10, l_threshold=3).collect()[0]
    assert out.n_classes == 3
    assert out.min_k == 1
    assert out.min_l == 1
    assert out.rows_below_k == 4      # the k=3 and k=1 classes
    assert out.classes_below_k == 2
    assert out.classes_below_l == 2   # l=1 and l=1 (the k=12 class has l=4)
    assert out.n_rows == 16


def test_rake_matches_naive_reference(spark):
    docs = [
        (0, "deep learning of the neural network and deep learning"),
        (1, "neural network in a gradient descent"),
        (2, "gradient descent is that gradient descent"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r.phrase, r.n_words, r.n_occurrences, r.score_ppm)
           for r in rake_keywords(df, top_k=10).collect()]

    stop = {"the", "a", "of", "and", "to", "in", "is", "that"}
    phrases = []
    for _, text in docs:
        cur = []
        for w in text.split(" "):
            if w in stop or w == "":
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    freq, deg = Counter(), Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    score = {w: (deg[w] * 1_000_000) // freq[w] for w in freq}
    by_phrase = {}
    occ = Counter(" ".join(p) for p in phrases)
    for p in phrases:
        by_phrase[" ".join(p)] = (len(p), occ[" ".join(p)],
                                  sum(score[w] for w in p))
    want = sorted(
        ((k, v[0], v[1], v[2]) for k, v in by_phrase.items()),
        key=lambda t: (-t[3], t[0]),
    )[:10]
    assert got == want


def test_qte_matches_naive_order_statistics(spark):
    import datetime

    vals = {u: float((u * 7) % 23 + 1) for u in range(50)}
    ts = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(u, ts, vals[u]) for u in range(50)],
        "user_id long, ts timestamp, value double",
    )
    from feature_extractor_mbo_lob_spark.functions.stats import (
        quantile_treatment_effects,
    )

    out = quantile_treatment_effects(ev, "user_id").collect()[0]
    arms = _arms(spark, range(50))
    per_arm = {0: [], 1: []}
    for u in range(50):
        per_arm[arms[u]].append(round(vals[u] * 100))
    for a, tag in ((0, "a"), (1, "b")):
        xs = sorted(per_arm[a])
        n = len(xs)
        assert getattr(out, f"n_{tag}") == n
        for q in (25, 50, 75):
            k = (n - 1) * q // 100 + 1
            assert getattr(out, f"p{q}_{tag}") == xs[k - 1], (a, q)
    for q in (25, 50, 75):
        assert getattr(out, f"qte{q}") == (
            getattr(out, f"p{q}_b") - getattr(out, f"p{q}_a")
        )


def test_post_stratified_effect_exact_micro_units(spark):
    import datetime

    arms = _arms(spark, range(40))
    rows = []
    conv_of = {}
    for u in range(40):
        for s in ("p", "q"):
            conv = 1 if (u + ord(s)) % 4 == 0 else 0
            conv_of[(s, u)] = conv
            rows.append((u, s, datetime.datetime(2024, 1, 1), 200.0 if conv else 1.0))
    ev = spark.createDataFrame(
        rows, "user_id long, stratum string, ts timestamp, value double"
    )
    from feature_extractor_mbo_lob_spark.functions.stats import (
        post_stratified_effect,
    )

    out = post_stratified_effect(
        ev, "user_id", "stratum", F.col("value") > 10.0
    ).collect()[0]
    num = 0
    n_units = 0
    used = 0
    for s in ("p", "q"):
        n_a = sum(1 for u in range(40) if arms[u] == 0)
        n_b = 40 - n_a
        c_a = sum(conv_of[(s, u)] for u in range(40) if arms[u] == 0)
        c_b = sum(conv_of[(s, u)] for u in range(40) if arms[u] == 1)
        n_s = n_a + n_b
        n_units += n_s
        if n_a > 0 and n_b > 0:
            used += n_s
            num += (n_s * 1_000_000 * c_b) // n_b - (n_s * 1_000_000 * c_a) // n_a
    assert out.n_units == n_units
    assert out.n_strata == 2
    assert out.n_units_used == used
    assert out.effect_num_micro == num


def test_mcnemar_cells_exact(spark):
    import datetime

    # 20 users; pre window is Jan 1-15, post Jan 16-31 (midpoint split).
    # pre conv iff u%4==0, post conv iff u%3==0
    rows = []
    for u in range(20):
        rows.append((u, datetime.datetime(2024, 1, 1),
                     200.0 if u % 4 == 0 else 1.0))
        rows.append((u, datetime.datetime(2024, 1, 31),
                     200.0 if u % 3 == 0 else 1.0))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    from feature_extractor_mbo_lob_spark.functions.stats import mcnemar_paired

    out = mcnemar_paired(ev, "user_id", F.col("value") > 10.0).collect()[0]
    cells = Counter(
        (1 if u % 4 == 0 else 0, 1 if u % 3 == 0 else 0) for u in range(20)
    )
    assert (out.n00, out.n01, out.n10, out.n11) == (
        cells[(0, 0)], cells[(0, 1)], cells[(1, 0)], cells[(1, 1)]
    )
    assert out.chi2_num == (out.n01 - out.n10) ** 2
    assert out.chi2_den == out.n01 + out.n10


def test_srm_check_counts_and_chi2_pieces(spark):
    import datetime

    ev = spark.createDataFrame(
        [(u, datetime.datetime(2024, 1, 1), 1.0) for u in range(30) for _ in range(2)],
        "user_id long, ts timestamp, value double",
    )
    from feature_extractor_mbo_lob_spark.functions.stats import srm_check

    rows = {r.arm: r for r in srm_check(ev, "user_id").collect()}
    arms = _arms(spark, range(30))
    n0 = sum(1 for a in arms.values() if a == 0)
    assert rows[0].n_units == n0
    assert rows[1].n_units == 30 - n0
    for a in (0, 1):
        assert rows[a].n_total == 30
        assert rows[a].chi2_num_term == (2 * rows[a].n_units - 30) ** 2
        assert rows[a].chi2_den == 60


def test_experiment_report_job_cli(tmp_path):
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    out = tmp_path / "report.json"
    r = subprocess.run(
        [sys.executable, str(repo / "jobs" / "experiment_report.py"),
         "--input", "/root/testdata/sf0.001", "--out", str(out)],
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    rep = json.loads(out.read_text())
    for section in ("srm", "ztest", "sprt", "cuped", "mann_whitney",
                    "qte", "strata", "post_strat", "mcnemar"):
        assert section in rep, section
    assert rep["srm"]["pass"] is True
    assert rep["ztest"]["n_a"] == rep["mann_whitney"]["n_a"]
    assert rep["strata"]["n_strata"] == 5
    # stdout's last JSON line matches the file (driver-parsable contract)
    last = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    assert json.loads(last) == rep


def test_streaming_sprt_cross_batch_matches_batch_and_freezes_decision(
    spark, tmp_path
):
    """Two availableNow runs over a growing source dir sharing one
    checkpoint: the second run only sees the late file, state carries the
    early users, and the final snapshot equals the batch ab_sprt on the
    full set. A decision crossed in run 1 must stay frozen in run 2."""
    import datetime

    from feature_extractor_mbo_lob_spark.functions.corpus import md5_bucket
    from feature_extractor_mbo_lob_spark.functions.stats import ab_sprt
    from feature_extractor_mbo_lob_spark.streaming.stream import streaming_sprt

    # all arm-0 users convert early -> h1 crossing within the first file
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for u in range(400):
        early = u < 200
        ts = base + datetime.timedelta(minutes=u)
        conv = 1 if (early and u % 2 == 0) or (not early and u % 11 == 0) else 0
        rows.append((u, ts, 200.0 if conv else 1.0, "purchase" if conv else "view"))
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_type string"
    )
    pred = (F.col("event_type") == "purchase") & (F.col("value") > 150.0)
    pu = (
        ev.groupBy(F.col("user_id").alias("uid"))
        .agg(
            F.max(F.when(pred, 1).otherwise(0)).cast("int").alias("conv"),
            F.min("ts").alias("ts0"),
        )
        .select(
            md5_bucket("uid", 2).cast("int").alias("arm"),
            F.col("uid").cast("long").alias("uid"),
            "conv",
            F.unix_micros(F.col("ts0").cast("timestamp")).alias("ts0_us"),
        )
    )
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    pu.filter("uid < 200").coalesce(1).write.mode("append").parquet(str(src))

    def run():
        stream = spark.readStream.schema(pu.schema).parquet(str(src))
        q = (
            streaming_sprt(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        # latest snapshot per arm = the one with the largest n_users
        rows = spark.read.parquet(sink).collect()
        best = {}
        for r in rows:
            if r.arm not in best or r.n_users > best[r.arm].n_users:
                best[r.arm] = r
        return best

    first = run()
    batch_first = {
        r.arm: r
        for r in ab_sprt(ev.filter("user_id < 200"), "user_id", pred).collect()
    }
    for a in first:
        assert (first[a].n_users, first[a].n_conv, first[a].decision) == (
            batch_first[a].n_users, batch_first[a].n_conv, batch_first[a].decision
        )

    pu.filter("uid >= 200").coalesce(1).write.mode("append").parquet(str(src))
    second = run()
    batch_all = {r.arm: r for r in ab_sprt(ev, "user_id", pred).collect()}
    for a in batch_all:
        s, b = second[a], batch_all[a]
        assert (s.n_users, s.n_conv, s.llr_final_nano) == (
            b.n_users, b.n_conv, b.llr_final_nano
        )
        # decisions reached in run 1 stay frozen even though run 2's
        # full-set replay order differs from the streaming arrival order
        if first[a].decision != "continue":
            assert (s.decision, s.n_at_decision) == (
                first[a].decision, first[a].n_at_decision
            )
    assert any(first[a].decision != "continue" for a in first)


def test_randomized_response_exact_replica(spark):
    import hashlib

    from feature_extractor_mbo_lob_spark.functions.privacy import (
        randomized_response,
    )

    def bucket(s, m):
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16) % m

    rows = [(u, u % 3 == 0, "g%d" % (u % 2)) for u in range(200)]
    df = spark.createDataFrame(rows, "user_id long, bit boolean, grp string")
    out = {r.grp: r for r in randomized_response(
        df, "bit", id_col="user_id", group_col="grp").collect()}

    for g in ("g0", "g1"):
        units = [(u, b) for u, b, gg in rows if gg == g]
        reps = []
        for u, b in units:
            lie = bucket(f"{u}:rr1", 3) == 0
            coin = bucket(f"{u}:rr2", 2)
            reps.append(coin if lie else int(b))
        n, s = len(units), sum(reps)
        r = out[g]
        assert (r.n, r.sum_reports) == (n, s)
        assert r.est_true == max(6 * s - n, 0) // 4
        assert r.est_rate_ppm == max(6 * s - n, 0) * 250000 // n
    # debiased estimate should land near the true 1/3 rate on 100 units
    truth = sum(1 for u, b, g in rows if g == "g0" and b)
    assert abs(out["g0"].est_true - truth) <= 15


def test_randomized_response_global_no_group(spark):
    from feature_extractor_mbo_lob_spark.functions.privacy import (
        randomized_response,
    )

    df = spark.createDataFrame(
        [(i, True) for i in range(60)], "user_id long, bit boolean")
    r = randomized_response(df, "bit", id_col="user_id").collect()[0]
    assert r.n == 60 and 0 <= r.sum_reports <= 60
    assert r.est_true == max(6 * r.sum_reports - 60, 0) // 4


def test_spearman_rho_exact_and_ties(spark):
    from feature_extractor_mbo_lob_spark.functions.stats import spearman_rho

    # perfect monotone -> rho = 1 -> rho_plus1_micro = 2_000_000
    df = spark.createDataFrame([(i, i * 10) for i in range(7)], "x long, y long")
    r = spearman_rho(df, "x", "y").collect()[0]
    assert (r.n, r.sum_d2x4, r.rho_plus1_micro) == (7, 0, 2_000_000)

    # perfect reverse -> rho = -1 -> 0
    df = spark.createDataFrame([(i, -i) for i in range(7)], "x long, y long")
    r = spearman_rho(df, "x", "y").collect()[0]
    assert r.rho_plus1_micro == 0

    # tie-averaged midranks vs a hand computation:
    # x = [1,2,2,3], y = [10,30,20,40]
    # rank_x avg = [1, 2.5, 2.5, 4]; rank_y = [1, 3, 2, 4]
    # d = [0, -.5, .5, 0]; sum d^2 = 0.5 -> sum_d2x4 = 2
    # rho = 1 - 6*0.5/(4*15) = 0.95 -> plus1 = 1_950_000
    df = spark.createDataFrame(
        [(1, 10), (2, 30), (2, 20), (3, 40)], "x long, y long")
    r = spearman_rho(df, "x", "y").collect()[0]
    assert (r.n, r.sum_d2x4, r.rho_plus1_micro) == (4, 2, 1_950_000)

    # grouped path + n < 2 guard
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("a", 3, 1), ("b", 9, 9)],
        "g string, x long, y long")
    out = {r.g: r for r in spearman_rho(df, "x", "y", group_col="g").collect()}
    assert out["b"].rho_plus1_micro is None and out["b"].n == 1
    assert out["a"].n == 3


def _naive_bleu_counts(ref, cand, max_n=4):
    from collections import Counter

    rw, cw = ref.split(), cand.split()
    out = {}
    for n in range(1, max_n + 1):
        rg = Counter(tuple(rw[i:i + n]) for i in range(len(rw) - n + 1))
        cg = Counter(tuple(cw[i:i + n]) for i in range(len(cw) - n + 1))
        out[n] = (sum(min(c, rg[g]) for g, c in cg.items()),
                  max(len(cw) - n + 1, 0))
    return out


def test_bleu_components_matches_naive(spark):
    from feature_extractor_mbo_lob_spark.operators.dedup import bleu_components

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat the cat sat on a mat"),
        (3, "completely different words here"),
        (4, "the"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long")
    got = {(r.id_a, r.id_b): r for r in bleu_components(pairs, df).collect()}
    texts = dict(docs)
    for (a, b), r in got.items():
        naive = _naive_bleu_counts(texts[a], texts[b])
        assert r.ref_len == len(texts[a].split())
        assert r.cand_len == len(texts[b].split())
        for n in range(1, 5):
            m, c = naive[n]
            assert (getattr(r, f"m{n}"), getattr(r, f"c{n}")) == (m, c), (a, b, n)
    # clipping: cand's "the"x2 matches ref's 2; "cat"x2 clips to ref's 1
    assert got[(1, 2)].m1 == 2 + 1 + 1 + 1 + 1  # the, cat(clip), sat, on, mat


def test_diff_in_differences_exact_cells(spark):
    import datetime as _dt
    import hashlib

    from feature_extractor_mbo_lob_spark.functions.stats import (
        diff_in_differences,
    )

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:7], 16) % 2

    rows = []
    for u in range(40):
        # pre spend 10.00, post spend 10.00 + 5.00 lift for arm B
        rows.append((u, _dt.datetime(2024, 1, 5), 10.0))
        rows.append((u, _dt.datetime(2024, 1, 20),
                     10.0 + (5.0 if arm(u) == 1 else 0.0)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    r = diff_in_differences(ev, "user_id", cutover_day=16).collect()[0]

    nb = sum(1 for u in range(40) if arm(u) == 1)
    na = 40 - nb
    assert (r.n_a_pre, r.n_a_post, r.n_b_pre, r.n_b_post) == (na, na, nb, nb)
    assert r.sum_a_pre == na * 1000 and r.sum_b_post == nb * 1500
    assert r.mean_a_pre_micro == 1000 * 1_000_000
    assert r.mean_b_post_micro == 1500 * 1_000_000
    # the parallel-trends effect is exactly the 5.00 lift (500 cents)
    assert r.did_micro == 500 * 1_000_000


def test_krippendorff_alpha_binary_hand_computed(spark):
    from feature_extractor_mbo_lob_spark.functions.stats import (
        krippendorff_alpha_binary,
    )

    # u1 [1,1], u2 [0,0,0], u3 [1,0], u4 [1] (dropped: m < 2)
    rows = [("u1", 1), ("u1", 1), ("u2", 0), ("u2", 0), ("u2", 0),
            ("u3", 1), ("u3", 0), ("u4", 1)]
    df = spark.createDataFrame(rows, "unit string, bit int")
    r = krippendorff_alpha_binary(df, "unit", "bit").collect()[0]
    # n=7, P1=3, P0=4; Do = (2*1*1/1)/7 = 2/7; De = 2*4*3/(7*6) = 4/7
    # alpha = 1 - (2/7)/(4/7) = 0.5
    assert (r.n_units, r.n, r.p1, r.o_num) == (3, 7, 3, 1_000_000)
    assert r.alpha_ppm == 500_000

    # perfect agreement on a mixed margin -> alpha = 1
    rows = [("a", 1), ("a", 1), ("b", 0), ("b", 0)]
    r = krippendorff_alpha_binary(
        spark.createDataFrame(rows, "unit string, bit int"), "unit", "bit"
    ).collect()[0]
    assert r.alpha_ppm == 1_000_000 and r.o_num == 0

    # systematic disagreement -> negative alpha (released exactly)
    rows = [("a", 1), ("a", 0), ("b", 1), ("b", 0)]
    r = krippendorff_alpha_binary(
        spark.createDataFrame(rows, "unit string, bit int"), "unit", "bit"
    ).collect()[0]
    # n=4, P0=P1=2, o_num=2e6; alpha = 1e6 - 3*2e6 div 4 = -500000
    assert r.alpha_ppm == -500_000


def test_diff_in_differences_cutover_ts_multi_month(spark):
    """ADVICE r3: dayofmonth-only cutover misclassifies multi-month panels
    (every month's days >= 16 would land 'post'); cutover_ts splits on the
    full timestamp."""
    import datetime as _dt
    import hashlib

    from feature_extractor_mbo_lob_spark.functions.stats import (
        diff_in_differences,
    )

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:7], 16) % 2

    rows = []
    for u in range(40):
        # pre period spans TWO months (Jan 20 would break dayofmonth>=16);
        # cutover is Feb 15, post carries the 5.00 arm-B lift
        rows.append((u, _dt.datetime(2024, 1, 20), 10.0))
        rows.append((u, _dt.datetime(2024, 2, 20),
                     10.0 + (5.0 if arm(u) == 1 else 0.0)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    r = diff_in_differences(
        ev, "user_id", cutover_ts="2024-02-15 00:00:00"
    ).collect()[0]

    nb = sum(1 for u in range(40) if arm(u) == 1)
    na = 40 - nb
    assert (r.n_a_pre, r.n_a_post, r.n_b_pre, r.n_b_post) == (na, na, nb, nb)
    assert r.did_micro == 500 * 1_000_000

    # the dayofmonth path on the same data is the documented failure mode:
    # BOTH rows (day 20 >= 16) land post -> no pre cells at all
    bad = diff_in_differences(ev, "user_id", cutover_day=16).collect()[0]
    assert bad.n_a_pre == 0 and bad.n_b_pre == 0


def test_fk_orphan_audit_counts_nulls_and_orphans(spark):
    from feature_extractor_mbo_lob_spark.validation import fk_orphan_audit

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = fk_orphan_audit(child, parent, "fk", "pk", "c->p").collect()[0]
    assert (r.relation, r.n_child, r.n_null_keys, r.n_orphans) == (
        "c->p", 5, 1, 1)
    assert r.orphan_ppm == (1 * 1_000_000) // 4
    # clean relation -> zero everywhere
    clean = spark.createDataFrame([(1,), (2,)], "fk long")
    r2 = fk_orphan_audit(clean, parent, "fk", "pk", "ok").collect()[0]
    assert r2.n_orphans == 0 and r2.orphan_ppm == 0


def test_coldstart_coverage_temporal_split(spark):
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark.validation import coldstart_coverage

    # max day = 2024-01-20, cutoff = 13: tools a (old, active post),
    # b (old, quiet post), c (first seen post -> cold), NULL ignored
    rows = [
        ("a", "2024-01-02"), ("a", "2024-01-18"),
        ("b", "2024-01-05"),
        ("c", "2024-01-19"),
        (None, "2024-01-20"),
    ]
    df = spark.createDataFrame(rows, "tool string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    r = coldstart_coverage(df, "tool", "ts", "tool", horizon_days=7).collect()[0]
    # NOTE: the NULL row is excluded entirely, so max day comes from
    # non-null rows: 2024-01-19 -> cutoff 2024-01-12
    assert r.entity == "tool"
    assert r.n_train_entities == 2          # a, b first seen <= cutoff
    assert r.n_holdout_active == 2          # a, c active after cutoff
    assert r.n_coldstart == 1               # c
    assert r.coldstart_ppm == 500_000


def test_capture_recapture_chapman_hand_case(spark):
    from feature_extractor_mbo_lob_spark.functions.corpus import capture_recapture

    # source A vocab {x, y, z}; source B vocab {y, z, w, u}
    docs = spark.createDataFrame(
        [(1, "x y z", "A"), (2, "y z w u", "B")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in capture_recapture(docs, "source").collect()}
    a = got["A"]
    # n1=3, exclusive to A = {x} -> m=2, corpus vocab 5 -> n2 = 5-1 = 4
    assert (a.n1, a.n2, a.m, a.v_total) == (3, 4, 2, 5)
    assert a.chapman_micro == ((3 + 1) * (4 + 1) * 1_000_000) // 3 - 1_000_000
    b = got["B"]
    assert (b.n1, b.n2, b.m) == (4, 3, 2)


def test_revenue_rollup_levels_consistent(spark):
    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    out = QUERIES["revenue_rollup"](spark, "/root/testdata/sf0.001").collect()
    grand = [r for r in out if r.gid == 3]
    assert len(grand) == 1 and grand[0].region is None
    regions = [r for r in out if r.gid == 1]
    nations = [r for r in out if r.gid == 0]
    assert grand[0].revenue_cents == sum(r.revenue_cents for r in regions)
    assert grand[0].revenue_cents == sum(r.revenue_cents for r in nations)
    assert grand[0].n_items == sum(r.n_items for r in regions)
    # per-region subtotal equals the sum of its nations
    for reg in regions:
        subs = [n for n in nations if n.region == reg.region]
        assert reg.revenue_cents == sum(n.revenue_cents for n in subs)


def test_customer_distribution_includes_zero_order_customers(spark, tmp_path):
    """Q13 hand case: the LEFT OUTER + coalesce(0) must surface orderless
    customers as a real c_count=0 bucket, and the histogram masses must
    sum to the customer cardinality."""
    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    cust = spark.createDataFrame([(1,), (2,), (3,), (4,)], "c_custkey long")
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2)], "o_orderkey long, o_custkey long"
    )
    sf = tmp_path / "q13"
    cust.coalesce(1).write.parquet(str(sf / "customer.parquet"))
    orders.coalesce(1).write.parquet(str(sf / "orders.parquet"))
    out = QUERIES["customer_distribution"](spark, str(sf)).collect()
    hist = {r.c_count: r.custdist for r in out}
    assert hist == {0: 2, 1: 1, 2: 1}
    # on the real table the masses conserve customer cardinality
    out2 = QUERIES["customer_distribution"](spark, "/root/testdata/sf0.001").collect()
    ncust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").count()
    assert sum(r.custdist for r in out2) == ncust


def test_waiting_suppliers_exists_not_exists_semantics(spark, tmp_path):
    """Q21 hand case: the waiting supplier is late on a multi-supplier
    order where no co-supplier is late; sole-supplier orders and orders
    with a late co-supplier are excluded."""
    import datetime as dt

    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    d0 = dt.date(1995, 1, 1)
    late = d0 + dt.timedelta(days=100)
    ok = d0 + dt.timedelta(days=10)
    li = spark.createDataFrame(
        [
            # order 1: supplier 1 late, co-supplier 2 on time -> S1 waits
            (1, 1, late), (1, 2, ok),
            # order 2: both late -> neither counted (NOT EXISTS fails)
            (2, 1, late), (2, 2, late),
            # order 3: single-supplier late -> excluded (EXISTS fails)
            (3, 3, late),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate date",
    )
    od = spark.createDataFrame(
        [(1, d0), (2, d0), (3, d0)], "o_orderkey long, o_orderdate date"
    )
    supp = spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3")], "s_suppkey long, s_name string"
    )
    sf = tmp_path / "q21"
    li.coalesce(1).write.parquet(str(sf / "lineitem.parquet"))
    od.coalesce(1).write.parquet(str(sf / "orders.parquet"))
    supp.coalesce(1).write.parquet(str(sf / "supplier.parquet"))
    out = {r.s_name: r.numwait for r in QUERIES["waiting_suppliers"](spark, str(sf)).collect()}
    assert out == {"S1": 1}


def test_top_supplier_preserves_ties(spark, tmp_path):
    """Q15 hand case: two suppliers with identical max quarterly revenue
    must BOTH be returned (the correlated-max equi join keeps ties)."""
    import datetime as dt

    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    q1 = dt.datetime(1996, 2, 1)
    li = spark.createDataFrame(
        [
            (1, 10.0, 0.0, q1), (2, 10.0, 0.0, q1),  # tied at 10.00
            (3, 5.0, 0.0, q1),                        # below max
            (1, 99.0, 0.0, dt.datetime(1997, 1, 1)),  # outside the quarter
        ],
        "l_suppkey long, l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    supp = spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3")], "s_suppkey long, s_name string"
    )
    sf = tmp_path / "q15"
    li.coalesce(1).write.parquet(str(sf / "lineitem.parquet"))
    supp.coalesce(1).write.parquet(str(sf / "supplier.parquet"))
    out = {r.s_name: r.total_revenue for r in QUERIES["top_supplier"](spark, str(sf)).collect()}
    assert out == {"S1": 10.0, "S2": 10.0}


def test_trade_flow_excludes_domestic(spark, tmp_path):
    """Q7 hand case: same-nation supplier→customer revenue is excluded;
    cross-nation cells carry exact revenue and year."""
    import datetime as dt

    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    t96 = dt.datetime(1996, 6, 1)
    li = spark.createDataFrame(
        [(100, 1, 20.0, 0.0, t96), (101, 2, 30.0, 0.0, t96)],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        [(100, 7), (101, 8)], "o_orderkey long, o_custkey long"
    )
    # supplier 1 in nation 0, supplier 2 in nation 1;
    # customer 7 in nation 1 (cross), customer 8 in nation 1 (domestic for s2)
    supp = spark.createDataFrame([(1, 0), (2, 1)], "s_suppkey long, s_nationkey long")
    cust = spark.createDataFrame([(7, 1), (8, 1)], "c_custkey long, c_nationkey long")
    nation = spark.createDataFrame(
        [(0, "N0"), (1, "N1")], "n_nationkey long, n_name string"
    )
    sf = tmp_path / "q7"
    for name, df in [("lineitem", li), ("orders", orders), ("supplier", supp),
                     ("customer", cust), ("nation", nation)]:
        df.coalesce(1).write.parquet(str(sf / f"{name}.parquet"))
    rows = QUERIES["trade_flow"](spark, str(sf)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.supp_nation, r.cust_nation, r.ship_year) == ("N0", "N1", 1996)
    assert r.revenue == 20.0 and r.n_items == 1


def test_dp_histogram_noise_exact_and_scales_with_epsilon(spark):
    """The Laplace draw replays from the md5 coin: hand-compute one
    cell's noise; eps=4e6 noise is exactly 1/4 of eps=1e6 noise in
    pre-quantization units (same uniform, scaled b)."""
    import hashlib
    import math

    from feature_extractor_mbo_lob_spark.functions.privacy import dp_histogram

    df = spark.createDataFrame(
        [("x",)] * 7 + [("y",)] * 3, "k string"
    )
    out1 = {r.k: r.noisy_milli for r in dp_histogram(df, ["k"]).collect()}
    out4 = {r.k: r.noisy_milli
            for r in dp_histogram(df, ["k"], epsilon_micro=4_000_000).collect()}

    def noise(cell, b):
        h = int(hashlib.md5(("dp" + cell).encode()).hexdigest()[:7], 16)
        u = (h + 0.5) / 16 ** 7 - 0.5
        return -b * math.copysign(1.0, u) * math.log(1.0 - 2.0 * abs(u))

    for cell, n in (("x", 7), ("y", 3)):
        assert out1[cell] == n * 1000 + math.floor(noise(cell, 1.0) * 1000 + 0.5)
        assert out4[cell] == n * 1000 + math.floor(noise(cell, 0.25) * 1000 + 0.5)


def test_pricing_summary_exact_money(spark, tmp_path):
    """Q1 hand case: one line ep=100.00 d=0.05 t=0.08 -> disc price
    95.00, charge 102.60 (exact c6 integer path); the shipdate cutoff
    drops the second line; averages are exact ratios."""
    import datetime as dt

    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    li = spark.createDataFrame(
        [
            ("A", "F", 4.0, 100.0, 0.05, 0.08, dt.datetime(1998, 1, 1)),
            ("A", "F", 9.0, 999.0, 0.10, 0.02, dt.datetime(1998, 12, 1)),
        ],
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_shipdate timestamp",
    )
    sf = tmp_path / "q1"
    li.coalesce(1).write.parquet(str(sf / "lineitem.parquet"))
    rows = QUERIES["pricing_summary"](spark, str(sf)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.sum_qty == 4 and r.count_order == 1
    assert r.sum_base_price == 100.0
    assert r.sum_disc_price == 95.0
    assert r.sum_charge == 102.6
    assert r.avg_qty == 4.0 and r.avg_price == 100.0 and r.avg_disc == 0.05


def test_supplier_part_counts_exclusions_and_dedup(spark, tmp_path):
    """Q16 hand case: a negative-acctbal supplier is excluded, an
    off-whitelist size is excluded, and repeat (part, supplier)
    shipments count once."""
    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    li = spark.createDataFrame(
        # part 1: suppliers 1 (good, ships twice) + 2 (bad acctbal);
        # part 2: off-whitelist size; part 3: excluded brand
        [(1, 1), (1, 1), (1, 2), (2, 1), (3, 1)],
        "l_partkey long, l_suppkey long",
    )
    part = spark.createDataFrame(
        [
            (1, "Brand#1", "SMALL x", 9),
            (2, "Brand#1", "SMALL x", 2),
            (3, "Brand#5", "SMALL x", 9),
        ],
        "p_partkey long, p_brand string, p_type string, p_size int",
    )
    supp = spark.createDataFrame(
        [(1, 50.0), (2, -3.0)], "s_suppkey long, s_acctbal double"
    )
    sf = tmp_path / "q16"
    li.coalesce(1).write.parquet(str(sf / "lineitem.parquet"))
    part.coalesce(1).write.parquet(str(sf / "part.parquet"))
    supp.coalesce(1).write.parquet(str(sf / "supplier.parquet"))
    rows = QUERIES["supplier_part_counts"](spark, str(sf)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.p_brand, r.p_type, r.p_size, r.supplier_cnt) == (
        "Brand#1", "SMALL x", 9, 1)


def test_lorenz_revenue_hand_case(spark, tmp_path):
    """Three users with revenue [10, 30, 60] land in deciles 1/4/7
    (closed-form ntile) with ascending cumulative shares 10%/40%/100%
    of revenue and 1/3, 2/3, 3/3 of users."""
    import datetime as dt

    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    t = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, t, 1, "purchase", 10.0, ""),
            (2, t, 2, "purchase", 30.0, ""),
            (3, t, 3, "purchase", 25.0, ""),
            (4, t, 3, "purchase", 35.0, ""),
            (5, t, 1, "click", 999.0, ""),   # non-purchase ignored
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = tmp_path / "lorenz"
    ev.coalesce(1).write.parquet(str(sf / "events.parquet"))
    rows = {r.decile: r for r in QUERIES["lorenz_revenue"](spark, str(sf)).collect()}
    assert set(rows) == {1, 4, 7}
    assert [rows[d].cum_user_ppm for d in (1, 4, 7)] == [333333, 666666, 1000000]
    assert [rows[d].cum_rev_ppm for d in (1, 4, 7)] == [100000, 400000, 1000000]


def test_fairness_audit_integer_gate_and_ratio(spark, tmp_path):
    """Engineered cohorts: source A keeps 2/2, source B keeps 1/2 ->
    di_vs_best = 500000; too-short, too-punctuated and mash docs all
    fail the integer gate."""
    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    good = "this is a perfectly reasonable document with normal words"
    bad_punct = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) !!! ??? ### $$$"
    docs = spark.createDataFrame(
        [
            (1, good, "en", "A", 1), (2, good + " more words", "en", "A", 1),
            (3, good, "en", "B", 1), (4, bad_punct, "en", "B", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = tmp_path / "fair"
    docs.coalesce(1).write.parquet(str(sf / "documents.parquet"))
    rows = {r.source: r for r in QUERIES["fairness_audit"](spark, str(sf)).collect()}
    assert (rows["A"].n_kept, rows["B"].n_kept) == (2, 1)
    assert rows["A"].di_vs_best_ppm == 1000000
    assert rows["B"].di_vs_best_ppm == 500000


def test_poisson_and_interarrival_hand_cases(spark, tmp_path):
    """Daily counts [2,2,2] are equidispersed -> VMR = 0-variance ->
    vmr = 0; user gaps [10, 30] -> CV2 = A*n/((n-1)S^2) = 200*2/400 = 1."""
    import datetime as dt

    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 3 days x 2 events -> zero dispersion
    for day in range(3):
        for j in range(2):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day, hours=j), 1,
                         "click", 0.0, ""))
    sf = tmp_path / "pois"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(sf / "events.parquet"))
    r = QUERIES["poisson_dispersion"](spark, str(sf)).collect()[0]
    assert (r.n, r.vmr_micro, r.chi2_micro) == (3, 0, 0)

    # one user, events at t=0, 10s, 40s -> gaps [10, 30]
    rows2 = [(1, base, 7, "click", 0.0, ""),
             (2, base + dt.timedelta(seconds=10), 7, "click", 0.0, ""),
             (3, base + dt.timedelta(seconds=40), 7, "click", 0.0, "")]
    sf2 = tmp_path / "gap"
    spark.createDataFrame(
        rows2,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(sf2 / "events.parquet"))
    r2 = QUERIES["interarrival_cv"](spark, str(sf2)).collect()[0]
    # n=2, S=40, Q=1000, A = 2*1000-1600 = 400; cv2 = 400*2/(1*1600) = 0.5
    assert (r2.n_gaps, r2.cv2_micro) == (2, 500000)


def test_funnel_strict_ordering(spark, tmp_path):
    """A purchase BEFORE the first click does not convert stage 3; a
    click before the first view does not convert stage 2."""
    import datetime as dt

    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, sec, uid, typ):
        return (eid, t0 + dt.timedelta(seconds=sec), uid, typ, 0.0, "")

    rows = [
        # user 1: view -> click -> purchase (full conversion)
        ev(1, 0, 1, "view"), ev(2, 10, 1, "click"), ev(3, 20, 1, "purchase"),
        # user 2: purchase BEFORE click: stage 2 yes, stage 3 no
        ev(4, 0, 2, "view"), ev(5, 5, 2, "purchase"), ev(6, 10, 2, "click"),
        # user 3: click before any view: stage 2 no
        ev(7, 0, 3, "click"), ev(8, 10, 3, "view"),
        # user 4: never views
        ev(9, 0, 4, "purchase"),
    ]
    sf = tmp_path / "funnel"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(sf / "events.parquet"))
    r = QUERIES["user_funnel"](spark, str(sf)).collect()[0]
    assert (r.n_view, r.n_click, r.n_purchase) == (3, 2, 1)
    assert r.view_to_click_ppm == (2 * 1000000) // 3
    assert r.click_to_purchase_ppm == 500000
    assert r.overall_ppm == 333333


def test_dow_and_gaps_hand_cases(spark, tmp_path):
    """Perfectly uniform days -> chi2 = 0; engineered gaps pin max/p99
    and the over-1h accounting."""
    import datetime as dt

    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(days=i % 14), 1, "click", 0.0, "")
            for i in range(28)]  # 2 events per dow
    sf = tmp_path / "dow"
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(sf / "events.parquet"))
    r = QUERIES["dow_uniformity"](spark, str(sf)).collect()[0]
    assert (r.k_days, r.n_events, r.chi2_micro) == (7, 28, 0)

    gaps = [0, 10, 20, 4000, 8000]  # gaps: 10, 10, 3980, 4000
    rows2 = [(i, t0 + dt.timedelta(seconds=s), 1, "click", 0.0, "")
             for i, s in enumerate(gaps)]
    sf2 = tmp_path / "gaps"
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(sf2 / "events.parquet"))
    g = QUERIES["availability_gaps"](spark, str(sf2)).collect()[0]
    assert (g.n_gaps, g.max_gap_s, g.n_over_1h) == (4, 4000, 2)
    assert g.silent_s_over_1h == 7980
    assert g.p99_gap_s == 4000


def test_dow_eta_squared_hand_cases(spark, tmp_path):
    """A perfect weekly cycle (totals depend only on dow) -> eta2 near
    1 (exactly 1 up to the micro trunc of the u_g terms); flat days ->
    SST = 0 -> NULL."""
    import datetime as dt

    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    t0 = dt.datetime(2024, 1, 1)
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    rows, eid = [], 0
    for day in range(14):
        for _ in range((day % 7) + 1):  # totals cycle 1..7 twice
            eid += 1
            rows.append((eid, t0 + dt.timedelta(days=day), 1, "click", 0.0, ""))
    sf = tmp_path / "eta"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(sf / "events.parquet"))
    r = QUERIES["dow_eta_squared"](spark, str(sf)).collect()[0]
    assert (r.k, r.n_days) == (7, 14)
    assert r.eta2_ppm >= 999999  # within-dow variance is exactly zero

    flat, eid = [], 0
    for day in range(14):
        for _ in range(3):
            eid += 1
            flat.append((eid, t0 + dt.timedelta(days=day), 1, "click", 0.0, ""))
    sf2 = tmp_path / "flat"
    spark.createDataFrame(flat, schema).coalesce(1).write.parquet(
        str(sf2 / "events.parquet"))
    assert QUERIES["dow_eta_squared"](spark, str(sf2)).collect()[0].eta2_ppm is None


def test_standardized_rate_adjusts_user_mix(spark, tmp_path):
    """Two arms with IDENTICAL within-stratum purchase rates but
    different user mixes: crude rates differ, standardized rates are
    equal — the Simpson-reversal the adjustment exists for. Strata and
    arms engineered via the real md5 bucketing (probed, not assumed)."""
    import datetime as dt

    from feature_extractor_mbo_lob_spark.functions.corpus import md5_bucket
    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    # probe the md5 arm of candidate user ids
    probe = spark.createDataFrame([(u,) for u in range(1, 200)], "uid long")
    arms = {r.uid: r.arm for r in probe.select(
        "uid", md5_bucket("uid", 2).alias("arm")).collect()}
    arm0 = [u for u, a in arms.items() if a == 0]
    arm1 = [u for u, a in arms.items() if a == 1]

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0

    def add_user(uid, n_ev, n_buy):
        nonlocal eid
        for i in range(n_ev):
            eid += 1
            typ = "purchase" if i < n_buy else "click"
            rows.append((eid, t0 + dt.timedelta(minutes=eid), uid, typ, 0.0, ""))

    # light users: 2 events, 1 purchase (rate 1/2)
    # heavy users: 10 events, 1 purchase (rate 1/10)
    # arm0: 8 light + 2 heavy; arm1: 2 light + 8 heavy -> crude rates differ
    for u in arm0[:8]:
        add_user(u, 2, 1)
    for u in arm0[8:10]:
        add_user(u, 10, 1)
    for u in arm1[:2]:
        add_user(u, 2, 1)
    for u in arm1[2:10]:
        add_user(u, 10, 1)

    sf = tmp_path / "std"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(sf / "events.parquet"))
    out = {r.arm: r for r in QUERIES["standardized_rate"](spark, str(sf)).collect()}
    assert set(out) == {0, 1}
    # terciles of n_ev in {2, 10}: t1 = 2, t2 = 10 -> strata 0 (light)
    # and 1 (heavy); within each stratum both arms' rates are equal
    # (500000 and 100000 ppm), so the standardized rates coincide.
    assert out[0].std_rate_ppm == out[1].std_rate_ppm
    # crude rates differ by construction
    crude0 = (8 * 1 + 2 * 1) * 1_000_000 // (8 * 2 + 2 * 10)
    crude1 = (2 * 1 + 8 * 1) * 1_000_000 // (2 * 2 + 8 * 10)
    assert crude0 != crude1


def test_topk_churn_jaccard(spark, tmp_path):
    """Week A uses tools {t0, t1}, week B uses {t1, t2} (tool identity
    is event_id mod 5 on purchase/error events): one common tool over a
    3-tool union -> Jaccard = 1/3."""
    import datetime as dt

    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    wk0 = dt.datetime(2024, 1, 1)
    wk1 = wk0 + dt.timedelta(days=7)
    rows = []
    # week A: purchases with event_id % 5 in {0, 1}
    for eid in (10, 11, 15, 16):
        rows.append((eid, wk0 + dt.timedelta(minutes=eid), eid, "purchase",
                     0.0, ""))
    # week B: purchases with event_id % 5 in {1, 2}
    for eid in (21, 22, 26, 27):
        rows.append((eid, wk1 + dt.timedelta(minutes=eid), eid, "purchase",
                     0.0, ""))
    sf = tmp_path / "churn"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(sf / "events.parquet"))
    out = QUERIES["topk_churn"](spark, str(sf)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_common == 1
    assert r.jaccard_ppm == 1000000 // 3


def test_rayleigh_hours_concentrated_and_uniform(spark):
    import datetime
    import math

    from feature_extractor_mbo_lob_spark.functions.stats import (
        rayleigh_hour_uniformity,
    )

    ct = [int(math.floor(math.cos(2 * math.pi * h / 24) * 1e6 + 0.5)) for h in range(24)]
    st = [int(math.floor(math.sin(2 * math.pi * h / 24) * 1e6 + 0.5)) for h in range(24)]

    # all events at hour 0 -> quantized R_bar^2 is exactly 1e6 ppm,
    # Z = n in micro units
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    ev = spark.createDataFrame(
        [(i, base) for i in range(10)], "event_id long, ts timestamp"
    )
    r = rayleigh_hour_uniformity(ev).collect()[0]
    assert r.n_events == 10
    assert r.c_micro == 10 * ct[0] and r.s_micro == 10 * st[0]
    assert r.r2_ppm == (r.c_micro ** 2 + r.s_micro ** 2) // (10 * 10 * 10 ** 6)
    assert r.r2_ppm == 10 ** 6
    assert r.z_micro == 10 * 10 ** 6

    # perfectly uniform 24-hour histogram -> resultant collapses to the
    # literal-table rounding residue (|C|,|S| <= 24, r2/z floor to 0)
    ev2 = spark.createDataFrame(
        [(h, base + datetime.timedelta(hours=h)) for h in range(24)] * 2,
        "event_id long, ts timestamp",
    )
    r2 = rayleigh_hour_uniformity(ev2).collect()[0]
    assert r2.n_events == 48
    assert r2.c_micro == 2 * sum(ct) and r2.s_micro == 2 * sum(st)
    assert abs(r2.c_micro) <= 48 and abs(r2.s_micro) <= 48
    assert r2.r2_ppm == 0 and r2.z_micro == 0


def test_fleiss_kappa_binary_hand_computed(spark):
    from feature_extractor_mbo_lob_spark.functions.stats import fleiss_kappa_binary

    # 6 items, 3 raters: n1 per item = [3, 3, 0, 0, 2, 1]
    rows = [(1, 1, 1), (1, 1, 1), (0, 0, 0), (0, 0, 0), (1, 1, 0), (1, 0, 0)]
    df = spark.createDataFrame(rows, "r1 int, r2 int, r3 int")
    r = fleiss_kappa_binary(df).collect()[0]
    n1s = [sum(t) for t in rows]
    N, m = 6, 3
    s1 = sum(n1s)
    pnum = sum(v * v + (m - v) * (m - v) - m for v in n1s)
    p_bar = pnum * 10 ** 6 // (N * m * (m - 1))
    pe = (s1 * s1 + (m * N - s1) * (m * N - s1)) * 10 ** 6 // ((m * N) ** 2)
    sign = 1 if p_bar > pe else (-1 if p_bar < pe else 0)
    kappa = sign * (abs(p_bar - pe) * 10 ** 6 // (10 ** 6 - pe))
    assert (r.n_items, r.m_raters, r.s1) == (N, m, s1)
    assert r.p_bar_ppm == p_bar and r.pe_ppm == pe
    assert r.kappa_ppm == kappa

    # unanimous raters -> kappa exactly 1e6
    uni = spark.createDataFrame(
        [(1, 1, 1)] * 4 + [(0, 0, 0)] * 4, "r1 int, r2 int, r3 int"
    )
    ru = fleiss_kappa_binary(uni).collect()[0]
    assert ru.p_bar_ppm == 10 ** 6 and ru.kappa_ppm == 10 ** 6


def test_spiegelhalter_z_hand_computed(spark):
    from feature_extractor_mbo_lob_spark.functions.stats import spiegelhalter_z

    # p = 0.25 for all four pairs; y = [1,1,0,0] (observed rate 0.5)
    df = spark.createDataFrame(
        [(1, 250000), (1, 250000), (0, 250000), (0, 250000)],
        "y long, p_ppm long",
    )
    r = spiegelhalter_z(df).collect()[0]
    # num = 2*(750000*500000) - 2*(250000*500000) = 5e11 -> micro 5e5
    assert r.n == 4 and r.z_sign == 1 and r.num_micro == 500000
    # den2 = 4 * (5e5)^2 * 250000*750000 = 1.875e23 -> /1e12 = 1.875e11
    assert r.var_micro6 == 187500000000
    # z^2 = (5e11)^2 / 1.875e23 = 1.3333 -> ppm floor 1333333
    assert r.z2_ppm == 1333333

    # perfectly calibrated: y mean == p -> num 0, sign 0
    df2 = spark.createDataFrame(
        [(1, 250000), (0, 250000), (0, 250000), (0, 250000)],
        "y long, p_ppm long",
    )
    r2 = spiegelhalter_z(df2).collect()[0]
    assert r2.num_micro == 0 and r2.z_sign == 0 and r2.z2_ppm == 0


def test_ols_influence_topk_hand_computed(spark):
    from feature_extractor_mbo_lob_spark.functions.stats import ols_influence_topk

    # clean line y = 100x plus one influential point at extreme x
    pts = [(1, 1, 100), (2, 2, 200), (3, 3, 300), (4, 4, 400), (5, 10, 0)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    rows = ols_influence_topk(df, k=5).collect()

    # integer mirror of the released formulas
    n = len(pts)
    sx = sum(p[1] for p in pts); sy = sum(p[2] for p in pts)
    sxx = sum(p[1] ** 2 for p in pts); sxy = sum(p[1] * p[2] for p in pts)
    bden = n * sxx - sx * sx; bnum = n * sxy - sx * sy
    exp = {}
    for i, x, y in pts:
        dx = n * x - sx
        h = 10 ** 6 // n + (dx * dx * 10 ** 6) // (n * bden)
        ee = bden * (n * y - sy) - bnum * dx
        eq = (1 if ee >= 0 else -1) * (abs(ee) // (n * bden))
        exp[i] = (x, y, eq, h)
    s2q = sum(v[2] ** 2 for v in exp.values()) // (n - 2)
    cooks = {
        i: (v[2] ** 2 * v[3] * 10 ** 12)
        // (2 * s2q * (10 ** 6 - v[3]) ** 2)
        for i, v in exp.items()
    }
    assert rows[0].id == 5  # the extreme-x point dominates
    for r in rows:
        x, y, eq, h = exp[r.id]
        assert (r.x, r.y, r.e_q, r.h_ppm) == (x, y, eq, h)
        assert r.cook_micro == cooks[r.id]
    got_order = [r.id for r in rows]
    want_order = sorted(exp, key=lambda i: (-cooks[i], i))
    assert got_order == want_order


def test_watson_u2_uniform_point_and_bimodal(spark):
    import datetime

    from feature_extractor_mbo_lob_spark.functions.stats import (
        rayleigh_hour_uniformity,
        watson_u2_hours,
    )

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    # perfectly uniform histogram -> U^2 exactly 0
    ev = spark.createDataFrame(
        [(h, base + datetime.timedelta(hours=h)) for h in range(24)] * 2,
        "event_id long, ts timestamp",
    )
    r = watson_u2_hours(ev).collect()[0]
    assert r.n_events == 48 and r.u2_micro == 0

    # point mass at hour 0: N_h = n*(23-h); mirror the closed form
    n = 4
    ev2 = spark.createDataFrame(
        [(i, base) for i in range(n)], "event_id long, ts timestamp"
    )
    r2 = watson_u2_hours(ev2).collect()[0]
    sn = n * sum(23 - h for h in range(24))
    sn2 = n * n * sum((23 - h) ** 2 for h in range(24))
    assert r2.u2_micro == (24 * sn2 - sn * sn) * 10 ** 6 // (331776 * n)
    assert r2.u2_micro > 0

    # antipodal bimodal day (hours 6 and 18): Rayleigh cancels to ~0,
    # Watson U^2 sees the departure — the omnibus claim, pinned
    ev3 = spark.createDataFrame(
        [(i, base + datetime.timedelta(hours=6)) for i in range(6)]
        + [(100 + i, base + datetime.timedelta(hours=18)) for i in range(6)],
        "event_id long, ts timestamp",
    )
    ray = rayleigh_hour_uniformity(ev3).collect()[0]
    wat = watson_u2_hours(ev3).collect()[0]
    assert ray.r2_ppm == 0          # first moment blind
    assert wat.u2_micro > 100000    # omnibus sees it


def test_page_hinkley_constant_and_step(spark):
    from feature_extractor_mbo_lob_spark.functions.stats import page_hinkley

    flat = spark.createDataFrame(
        [(d, 10) for d in range(6)], "d long, x long"
    )
    rows = page_hinkley(flat, idx_col="d", y_col="x").collect()
    assert all(r.mean_q == 10 and r.m_t == 0 and r.ph_t == 0 for r in rows)

    xs = [10, 10, 10, 10, 20, 20, 20, 20]
    step = spark.createDataFrame(list(enumerate(xs)), "d long, x long")
    got = {r.d: r for r in page_hinkley(step, idx_col="d", y_col="x").collect()}
    cum = m = 0
    mn = 0
    for t, x in enumerate(xs, 1):
        cum += x
        mean_q = cum // t
        m += x - mean_q
        mn = min(mn, m)
        r = got[t - 1]
        assert (r.mean_q, r.m_t, r.ph_t) == (mean_q, m, m - mn)
    # the drift statistic rises after the step
    assert got[7].ph_t > got[3].ph_t


def test_hoeffding_d_monotone_ushape_and_cap(spark):
    import pytest

    from feature_extractor_mbo_lob_spark.functions.stats import hoeffding_d

    def mirror(pts):
        n = len(pts)
        order_x = sorted(range(n), key=lambda i: (pts[i][1], pts[i][0]))
        order_y = sorted(range(n), key=lambda i: (pts[i][2], pts[i][0]))
        r = [0] * n
        s = [0] * n
        for k, i in enumerate(order_x, 1):
            r[i] = k
        for k, i in enumerate(order_y, 1):
            s[i] = k
        q = [1 + sum(1 for j in range(n) if r[j] < r[i] and s[j] < s[i])
             for i in range(n)]
        d1 = sum((qi - 1) * (qi - 2) for qi in q)
        d2 = sum((r[i] - 1) * (r[i] - 2) * (s[i] - 1) * (s[i] - 2)
                 for i in range(n))
        d3 = sum((r[i] - 2) * (s[i] - 2) * (q[i] - 1) for i in range(n))
        num = 30 * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3)
        den = n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
        sign = 1 if num >= 0 else -1
        return d1, d2, d3, sign * (abs(num) * 10 ** 6 // den)

    # perfect monotone dependence -> normalized D at its maximum 1.0
    pts = [(i, i, 10 * i) for i in range(1, 11)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    r = hoeffding_d(df).collect()[0]
    d1, d2, d3, dm = mirror(pts)
    assert (r.d1, r.d2, r.d3, r.d_micro) == (d1, d2, d3, dm)
    assert r.d_micro == 10 ** 6  # the 30-scaled (SAS) normalization

    # U-shape: y = (x-5)^2 — monotone ranks cancel, Hoeffding still fires
    pts2 = [(i, i, (i - 5) ** 2 * 100) for i in range(11)]
    df2 = spark.createDataFrame(pts2, "id long, x long, y long")
    r2 = hoeffding_d(df2).collect()[0]
    assert r2.d_micro == mirror(pts2)[3]
    assert r2.d_micro > 0

    with pytest.raises(ValueError, match="max_rows"):
        hoeffding_d(df, max_rows=5)


def test_breusch_pagan_homo_and_hetero(spark):
    from feature_extractor_mbo_lob_spark.functions.stats import breusch_pagan

    # exact line: residuals identically 0 -> no heteroscedasticity signal
    line = [(x, 3 * x) for x in range(1, 9)]
    df = spark.createDataFrame(line, "x long, y long")
    r = breusch_pagan(df).collect()[0]
    assert r.sz_str == "0" and r.r2_signed_raw == 0.0 and r.lm_micro == 0

    # symmetric residuals whose magnitude grows with x -> LM fires
    het = []
    for i, x in enumerate(range(1, 21)):
        e = x * 50 * (1 if i % 2 == 0 else -1)
        het.append((x, 100 * x + e))
    df2 = spark.createDataFrame(het, "x long, y long")
    r2 = breusch_pagan(df2).collect()[0]
    assert r2.lm_micro > 10 ** 6  # n*R^2 > 1 for this engineered spread
    assert r2.r2_signed_raw != 0.0


def test_kupiec_pof_hand_computed(spark):
    import math

    from feature_extractor_mbo_lob_spark.functions.stats import kupiec_pof

    # train: 1..100 once each -> p95 exact order statistic = 95
    rows = [(v, 0) for v in range(1, 101)]
    # test: 19 values below threshold + one exceedance = exactly 5%
    rows += [(50, 1)] * 19 + [(96, 1)]
    df = spark.createDataFrame(rows, "v long, arm int")
    r = kupiec_pof(df, p_ppm=50000).collect()[0]
    assert (r.n_train, r.thr, r.n_test, r.x_exceptions) == (100, 95, 20, 1)

    def nln(c):
        return math.floor(math.log(c) * 1e9 + 0.5)

    lnp = math.floor(math.log(0.05) * 1e9 + 0.5)
    lnq = math.floor(math.log(0.95) * 1e9 + 0.5)
    n, x = 20, 1
    null_side = (n - x) * (nln(n - x) - nln(n)) + x * (nln(x) - nln(n))
    lr = -2 * ((n - x) * lnq + x * lnp - null_side)
    assert r.lr_nano == lr
    # realized rate == nominal p -> LR collapses to quantization residue
    assert abs(r.lr_nano) < 10 ** 6  # < 0.001 in natural units

    # gross coverage failure: half the test half exceeds
    rows2 = [(v, 0) for v in range(1, 101)] + [(50, 1)] * 10 + [(99, 1)] * 10
    r2 = kupiec_pof(
        spark.createDataFrame(rows2, "v long, arm int"), p_ppm=50000
    ).collect()[0]
    assert r2.x_exceptions == 10
    assert r2.lr_nano > 10 * 10 ** 9  # LR >> critical value 3.84


def test_gwet_ac1_resists_kappa_paradox(spark):
    from feature_extractor_mbo_lob_spark.functions.stats import (
        fleiss_kappa_binary,
        gwet_ac1_binary,
    )

    # extreme prevalence: 19 unanimous-positive items, one 2/3 item
    rows = [(1, 1, 1)] * 19 + [(1, 1, 0)]
    df = spark.createDataFrame(rows, "r1 int, r2 int, r3 int")
    kap = fleiss_kappa_binary(df).collect()[0]
    ac1 = gwet_ac1_binary(df).collect()[0]

    N, m = 20, 3
    s1 = 19 * 3 + 2
    pnum = 19 * (9 + 0 - 3) + (4 + 1 - 3)
    p_bar = pnum * 10 ** 6 // (N * 6)
    pe_f = (s1 ** 2 + (60 - s1) ** 2) * 10 ** 6 // 3600
    pe_g = 2 * s1 * (60 - s1) * 10 ** 6 // 3600
    assert kap.p_bar_ppm == p_bar and ac1.p_bar_ppm == p_bar
    assert kap.pe_ppm == pe_f and ac1.pe_gwet_ppm == pe_g
    k_val = (1 if p_bar > pe_f else -1) * (
        abs(p_bar - pe_f) * 10 ** 6 // (10 ** 6 - pe_f)
    )
    a_val = (1 if p_bar > pe_g else -1) * (
        abs(p_bar - pe_g) * 10 ** 6 // (10 ** 6 - pe_g)
    )
    assert kap.kappa_ppm == k_val and ac1.ac1_ppm == a_val
    # the paradox: near-unanimous data, kappa craters, AC1 stays high
    assert kap.kappa_ppm < 0 < ac1.ac1_ppm
    assert ac1.ac1_ppm > 900000


def test_taylor_law_quadratic_scaling(spark):
    import datetime
    import math

    from feature_extractor_mbo_lob_spark.functions.stats import taylor_law

    # three groups engineered with var = mean^2 / 4 -> slope exactly 2
    # g1: days [1,3], g2: [2,6], g3: [4,12]
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for g, counts in (("a", [1, 3]), ("b", [2, 6]), ("c", [4, 12])):
        for day, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, g, base + datetime.timedelta(days=day)))
                eid += 1
    ev = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    r = taylor_law(ev).collect()[0]
    assert r.n_groups == 3

    def nln(v):
        return math.floor(math.log(v) * 1e9 + 0.5)

    pts = []
    for counts in ([1, 3], [2, 6], [4, 12]):
        k = len(counts)
        s = sum(counts)
        q = sum(c * c for c in counts)
        mean_micro = s * 10 ** 6 // k
        var_micro = (k * q - s * s) * 10 ** 6 // (k * k)
        pts.append((nln(mean_micro), nln(var_micro)))
    k = len(pts)
    sx = sum(p[0] for p in pts); sy = sum(p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts); sxy = sum(p[0] * p[1] for p in pts)
    num = k * sxy - sx * sy; den = k * sxx - sx * sx
    want = (1 if num >= 0 else -1) * (abs(num) * 10 ** 6 // den)
    assert r.slope_micro == want
    assert abs(r.slope_micro - 2 * 10 ** 6) < 100  # b = 2 up to ln residue

    # flat groups (zero variance) are filtered -> slope NULL
    flat = spark.createDataFrame(
        [(i, "a", base) for i in range(3)] + [(9 + i, "b", base) for i in range(5)],
        "event_id long, event_type string, ts timestamp",
    )
    r2 = taylor_law(flat).collect()[0]
    assert r2.n_groups == 0 and r2.slope_micro is None


def test_dickey_fuller_mean_reversion_hand_computed(spark):
    from feature_extractor_mbo_lob_spark.functions.stats import dickey_fuller

    # noisy alternation: strong mean reversion -> rho strongly negative
    ys = [10, 0, 10, 0, 9, 1, 9, 1, 10, 0]
    df = spark.createDataFrame(list(enumerate(ys)), "d long, y long")
    r = dickey_fuller(df, idx_col="d", y_col="y").collect()[0]

    xs = ys[:-1]
    dys = [b - a for a, b in zip(ys, ys[1:])]
    k = len(xs)
    sx, sy = sum(xs), sum(dys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * d for x, d in zip(xs, dys))
    syy = sum(d * d for d in dys)
    sxx_c = k * sxx - sx * sx
    sxy_c = k * sxy - sx * sy
    syy_c = k * syy - sy * sy
    rho = (1 if sxy_c >= 0 else -1) * (abs(sxy_c) * 10 ** 6 // sxx_c)
    den = sxx_c * syy_c - sxy_c * sxy_c
    t2 = (k - 2) * sxy_c * sxy_c * 10 ** 6 // den
    assert r.n_obs == k
    assert (r.rho_micro, r.t_sign, r.t2_micro) == (rho, -1, t2)
    assert r.rho_micro < -1500000  # near-full reversion each step
    assert r.t2_micro > 10 * 10 ** 6  # decisive rejection of the unit root

    # perfect deterministic fit -> Cauchy-Schwarz denominator 0 -> NULL
    perfect = spark.createDataFrame(
        list(enumerate([10, 0, 10, 0, 10, 0])), "d long, y long"
    )
    rp = dickey_fuller(perfect, idx_col="d", y_col="y").collect()[0]
    assert rp.t2_micro is None and rp.t_sign is None


def test_seasonal_mann_kendall_cycle_robustness(spark):
    import datetime

    from feature_extractor_mbo_lob_spark.functions.stats import (
        mann_kendall_trend,
        seasonal_mann_kendall,
    )

    # 4 weeks, period 2: even days heavy (100+w), odd days light (1+w) —
    # a monotone +1/week trend under a huge 2-day cycle
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(28):
        week = day // 7
        c = (100 + week) if day % 2 == 0 else (1 + week)
        for _ in range(c):
            rows.append((eid, base + datetime.timedelta(days=day)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")

    r = seasonal_mann_kendall(ev, period=2).collect()[0]
    assert r.n_seasons == 2 and r.n_days == 28
    # mirror: within a season, same-week days tie (equal counts), pairs
    # across weeks are all concordant (+1 per week of trend)
    from collections import Counter

    s_mirror = pairs_mirror = tie_mirror = 0
    for season in (0, 1):
        days = [day for day in range(28) if day % 2 == season]
        cnts = [(100 if day % 2 == 0 else 1) + day // 7 for day in days]
        n = len(days)
        pairs_mirror += n * (n - 1) // 2
        s_mirror += sum(
            1 if cj > ci else (-1 if cj < ci else 0)
            for i, ci in enumerate(cnts) for cj in cnts[i + 1:]
        )
        for t in Counter(cnts).values():
            tie_mirror += t * (t - 1) * (2 * t + 5)
    assert r.s_stat == s_mirror == 146
    assert r.n_pairs == pairs_mirror
    assert r.tie_term == tie_mirror == 888

    # plain MK on the same data: the cycle floods S with discordant
    # cross-season pairs (|S| much smaller relative to n_pairs)
    # plain MK on the same data: cross-season pairs flood S with cycle
    # noise — the seasonal concordance fraction is far higher
    mk = mann_kendall_trend(ev).collect()[0]
    frac_seasonal = r.s_stat / r.n_pairs
    frac_plain = mk.s_stat / mk.n_pairs
    assert frac_seasonal > 0.8 > frac_plain + 0.25


def test_lorenz_asymmetry_hand_cases(spark):
    from feature_extractor_mbo_lob_spark.functions.stats import lorenz_asymmetry

    # symmetric around the mean: S = F + L = 1/2 + (sum below)/T
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], "v long")
    r = lorenz_asymmetry(df).collect()[0]
    # mean 2.5: below = {1, 2} -> m=2, sb=3, S = 500000 + 300000
    assert (r.n, r.total, r.m_below, r.sum_below) == (4, 10, 2, 3)
    assert r.s_ppm == 500000 + 300000

    # one dominant unit: nearly everyone below the mean -> S > 1
    dom = spark.createDataFrame([(1,)] * 9 + [(91,)], "v long")
    rd = lorenz_asymmetry(dom).collect()[0]
    # mean 10: below = nine 1s -> F = 0.9, L = 9/100 -> S = 0.99e6? no:
    # 900000 + 90000 = 990000 — check against the mirror, then the
    # qualitative claim via a small-units case
    assert rd.s_ppm == (9 * 10 ** 6) // 10 + (9 * 10 ** 6) // 100

    # many tiny + mid mass: mean pulled low -> F small -> S < 1
    low = spark.createDataFrame([(10,)] * 9 + [(1,)], "v long")
    rl = lorenz_asymmetry(low).collect()[0]
    # mean 9.1: below = the single 1 -> F = 0.1, L = 1/91
    assert rl.s_ppm == 10 ** 6 // 10 + 10 ** 6 // 91
    assert rl.s_ppm < r.s_ppm  # floor-driven < symmetric


def test_forecast_error_decomp_hand_cases(spark):
    import math

    from feature_extractor_mbo_lob_spark.functions.stats import (
        forecast_error_decomp,
    )

    # pure level shift: second week = first week + 10 -> all error is
    # bias (U_M = 1, U_S = U_C = 0)
    ys = [20, 30, 25, 35, 40, 22, 28] + [30, 40, 35, 45, 50, 32, 38]
    df = spark.createDataFrame(list(enumerate(ys)), "d long, y long")
    r = forecast_error_decomp(df, lag=7).collect()[0]
    assert r.n == 7
    assert r.mse_micro == 100 * 10 ** 6 and r.mae_micro == 10 * 10 ** 6
    assert r.u_m_ppm == 10 ** 6
    assert r.u_s_q == 0 and r.u_c_q == 0

    # pure amplitude change: second week = 2x first (mean-zero base
    # would make it all U_S; with nonzero mean it splits — mirror it)
    base = [10, -10, 20, -20, 5, -5, 0]
    ys2 = [100 + b for b in base] + [100 + 2 * b for b in base]
    df2 = spark.createDataFrame(list(enumerate(ys2)), "d long, y long")
    r2 = forecast_error_decomp(df2, lag=7).collect()[0]
    fs = [100 + b for b in base]
    as_ = [100 + 2 * b for b in base]
    n = 7
    ds = [f - a for f, a in zip(fs, as_)]
    sdd = sum(d * d for d in ds)
    assert r2.mse_micro == sdd * 10 ** 6 // n
    assert r2.u_m_ppm == (sum(ds)) ** 2 * 10 ** 6 // (n * sdd)
    sfd = math.sqrt(n * sum(f * f for f in fs) - sum(fs) ** 2)
    sad = math.sqrt(n * sum(a * a for a in as_) - sum(as_) ** 2)
    cov = n * sum(f * a for f, a in zip(fs, as_)) - sum(fs) * sum(as_)
    nden = float(n * sdd)
    assert r2.u_s_q == math.floor((sfd - sad) ** 2 / nden * 1e6 + 0.5)
    assert r2.u_c_q == math.floor(2.0 * (sfd * sad - cov) / nden * 1e6 + 0.5)
    # amplitude doubling with zero-mean deviations: U_S dominates
    assert r2.u_s_q > 900000 and r2.u_m_ppm == 0
    # shares sum to ~1 (quantization residue only)
    assert abs(r2.u_m_ppm + r2.u_s_q + r2.u_c_q - 10 ** 6) <= 2


def test_rosner_esd_removal_trajectory(spark):
    from feature_extractor_mbo_lob_spark.functions.stats import rosner_esd

    # tight cluster + three separated outliers at 100, 60, 40
    vals = {1: 10, 2: 11, 3: 9, 4: 10, 5: 12, 6: 100, 7: 60, 8: 40}
    df = spark.createDataFrame(list(vals.items()), "id long, v long")
    rows = {r.round: r for r in rosner_esd(df, k=3).collect()}
    assert [rows[r].outlier_id for r in (1, 2, 3)] == [6, 7, 8]
    assert [rows[r].n_remaining for r in (1, 2, 3)] == [8, 7, 6]

    # mirror round 1 exactly
    n = len(vals); s = sum(vals.values()); q = sum(v * v for v in vals.values())
    dev2 = {i: (n * v - s) ** 2 for i, v in vals.items()}
    top = max(dev2, key=lambda i: (dev2[i], -i))
    r2 = (n - 1) * dev2[top] * 10 ** 6 // (n * (n * q - s * s))
    assert rows[1].outlier_id == top and rows[1].r2_ppm == r2

    # argmax tie -> smallest id (two symmetric extremes around the mean)
    sym = [(1, 0), (2, 20), (3, 10), (4, 10), (5, 10)]
    rt = {r.round: r for r in rosner_esd(
        spark.createDataFrame(sym, "id long, v long"), k=2).collect()}
    assert rt[1].outlier_id == 1  # dev2 equal for ids 1 and 2 -> id 1
    assert rt[2].outlier_id == 2
