"""Hand-computed expectations for the evaluation-metric family."""

import math

import pytest

from feature_extractor_mbo_lob_spark.functions import evalmetrics as em


def test_auc_perfect_separation(spark):
    df = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)], "s double, y int"
    )
    r = em.binary_auc(df, "s", "y").collect()[0]
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 1.0)


def test_auc_ties_average_rank(spark):
    # scores {1,1,2,2}, one positive at each score -> AUC = 0.5
    df = spark.createDataFrame(
        [(1, 0), (1, 1), (2, 0), (2, 1)], "s int, y int"
    )
    r = em.binary_auc(df, "s", "y").collect()[0]
    assert r.auc == 0.5


def test_auc_matches_pairwise_definition(spark):
    # AUC = P(score_pos > score_neg) + 0.5 * P(equal), brute-forced
    rows = [((i * 7) % 13, 1 if (i * 5) % 3 == 0 else 0) for i in range(40)]
    df = spark.createDataFrame(rows, "s int, y int")
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    expected = wins / (len(pos) * len(neg))
    r = em.binary_auc(df, "s", "y").collect()[0]
    # result is canonicalized to 6 decimals
    assert abs(r.auc - expected) < 1e-6


def test_confusion_report(spark):
    df = spark.createDataFrame(
        [(10, 1), (10, 0), (1, 1), (1, 0), (1, 0)], "s int, y int"
    )
    r = em.confusion_report(df, "s", "y", 5).collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (1, 1, 1, 2)
    assert r.accuracy == 0.6
    assert r.precision == 0.5
    assert r.recall == 0.5
    assert r.f1 == 0.5


def test_calibration_perfectly_calibrated_bin(spark):
    # bin 0: probs 0/10 .. handcrafted: prob_num/den with den=10
    # two rows at num=2 (p=0.2), one positive -> conf 0.2, acc 0.5
    df = spark.createDataFrame([(2, 0), (2, 1)], "pnum int, y int")
    r = em.calibration_bins(df, "pnum", 10, "y", n_bins=5).collect()
    assert len(r) == 1
    b = r[0]
    assert b.bin == 1  # floor(2*5/10) = 1
    assert b.n == 2 and b.conf == 0.2 and b.acc == 0.5
    assert abs(b.abs_gap - 0.3) < 1e-9


def test_ece_single_sum_form(spark):
    # bins: num=1 (p=.1) y=0 ; num=9 (p=.9) y=1 -> gaps .1 and .1,
    # ECE = (1/2)*(0.1+0.1) = 0.1
    df = spark.createDataFrame([(1, 0), (9, 1)], "pnum int, y int")
    r = em.expected_calibration_error(df, "pnum", 10, "y", n_bins=10).collect()[0]
    assert r.n_rows == 2 and r.n_bins_used == 2
    assert abs(r.ece - 0.1) < 1e-9


def test_ks_identical_distributions(spark):
    rows = [(v, g) for v in (1, 2, 3, 4) for g in ("a", "b")]
    df = spark.createDataFrame(rows, "v int, g string")
    r = em.ks_two_sample(df, "v", "g", "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.d_stat) == (4, 4, 0.0)


def test_ks_disjoint_distributions(spark):
    rows = [(v, "a") for v in (1, 2, 3)] + [(v, "b") for v in (10, 11)]
    df = spark.createDataFrame(rows, "v int, g string")
    r = em.ks_two_sample(df, "v", "g", "a", "b").collect()[0]
    assert r.d_stat == 1.0


def test_ks_known_value(spark):
    # a = {1,2,3,4}, b = {3,4,5,6}: max ECDF gap = 0.5 at v=2
    rows = [(v, "a") for v in (1, 2, 3, 4)] + [(v, "b") for v in (3, 4, 5, 6)]
    df = spark.createDataFrame(rows, "v int, g string")
    r = em.ks_two_sample(df, "v", "g", "a", "b").collect()[0]
    assert r.d_stat == 0.5


def test_gini_equal_values_zero(spark):
    df = spark.createDataFrame([(5, "g")] * 4, "x int, g string")
    r = em.gini_by_group(df, "x", "g").collect()[0]
    assert (r.n, r.total, r.gini) == (4, 20, 0.0)


def test_gini_single_holder(spark):
    # one non-zero among n=4 -> G = (n-1)/n = 0.75
    df = spark.createDataFrame([(0, "g"), (0, "g"), (0, "g"), (8, "g")], "x int, g string")
    r = em.gini_by_group(df, "x", "g").collect()[0]
    assert r.gini == 0.75


def test_gini_hand_value(spark):
    # x = [1,2,3,4]: G = (2*(1+4+9+16) - 5*10) / (4*10) = (60-50)/40 = 0.25
    df = spark.createDataFrame([(i, "g") for i in (1, 2, 3, 4)], "x int, g string")
    r = em.gini_by_group(df, "x", "g").collect()[0]
    assert r.gini == 0.25


def test_entropy_uniform(spark):
    df = spark.createDataFrame(
        [(k, "g") for k in ("a", "b", "c", "d") for _ in range(3)], "k string, g string"
    )
    r = em.entropy_by_group(df, "k", "g").collect()[0]
    assert r.n == 12 and r.k_distinct == 4
    assert abs(r.entropy - math.log(4)) < 1e-6


def test_entropy_degenerate_zero(spark):
    df = spark.createDataFrame([("a", "g")] * 5, "k string, g string")
    r = em.entropy_by_group(df, "k", "g").collect()[0]
    assert r.k_distinct == 1 and r.entropy == 0.0


def test_entropy_hand_value(spark):
    # counts 1,3 -> H = ln(4) - (1*ln1 + 3*ln3)/4
    df = spark.createDataFrame(
        [("a", "g")] + [("b", "g")] * 3, "k string, g string"
    )
    r = em.entropy_by_group(df, "k", "g").collect()[0]
    expected = math.log(4) - 3 * math.log(3) / 4
    assert abs(r.entropy - expected) < 1e-6


def test_cohens_kappa_perfect_agreement(spark):
    from feature_extractor_mbo_lob_spark.functions import evalmetrics as em2

    df = spark.createDataFrame([(1, 1), (0, 0), (1, 1), (0, 0)], "p int, y int")
    r = em2.cohens_kappa(df, "p", "y").collect()[0]
    assert r.kappa == 1.0 and r.po == 1.0


def test_cohens_kappa_hand_value(spark):
    from feature_extractor_mbo_lob_spark.functions import evalmetrics as em2

    # classic 2x2: tp=20, fp=5, fn=10, tn=15, n=50
    # po = 35/50 = 0.7; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    rows = ([(1, 1)] * 20 + [(1, 0)] * 5 + [(0, 1)] * 10 + [(0, 0)] * 15)
    df = spark.createDataFrame(rows, "p int, y int")
    r = em2.cohens_kappa(df, "p", "y").collect()[0]
    assert (r.n, r.po, r.pe) == (50, 0.7, 0.5)
    assert abs(r.kappa - 0.4) < 1e-9


def test_cohens_kappa_degenerate_constant(spark):
    from feature_extractor_mbo_lob_spark.functions import evalmetrics as em2

    df = spark.createDataFrame([(1, 1), (1, 1)], "p int, y int")
    r = em2.cohens_kappa(df, "p", "y").collect()[0]
    assert r.kappa == 0.0  # pe = 1 guard


# --- Pk segmentation metric ----------------------------------------------------------


def _pk_frame(spark, pred, ref):
    rows = [("c", i, p, r) for i, (p, r) in enumerate(zip(pred, ref))]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, pred_b int, ref_b int"
    )


def test_segmentation_pk_perfect_prediction_is_zero(spark):
    from feature_extractor_mbo_lob_spark.functions.evalmetrics import segmentation_pk

    ref = [0, 0, 0, 0, 0, 1, 0, 0, 0, 0]
    out = segmentation_pk(_pk_frame(spark, ref, ref), k=2).collect()[0]
    assert out.n_windows == 8
    assert out.n_disagree == 0 and out.pk_raw == 0.0


def test_segmentation_pk_missed_boundary_counts_straddling_windows(spark):
    from feature_extractor_mbo_lob_spark.functions.evalmetrics import segmentation_pk

    ref = [0, 0, 0, 0, 0, 1, 0, 0, 0, 0]
    pred = [0] * 10
    out = segmentation_pk(_pk_frame(spark, pred, ref), k=2).collect()[0]
    # windows (3,5) and (4,6) straddle the reference boundary at 5
    assert out.n_windows == 8 and out.n_disagree == 2
    assert abs(out.pk_raw - 0.25) < 1e-12


def test_roc_curve_points_hand_case(spark):
    # scores desc: 3 (1 pos), 2 (1 pos + 1 neg), 1 (1 neg); P=2, N=2
    df = spark.createDataFrame(
        [(3, 1), (2, 1), (2, 0), (1, 0)], "score long, y int"
    )
    rows = {r.score: r for r in em.roc_curve_points(df, "score", "y").collect()}
    assert rows[3].cum_pos == 1 and rows[3].cum_neg == 0
    assert rows[3].tpr_ppm == 500000 and rows[3].fpr_ppm == 0
    assert rows[3].precision_ppm == 1000000
    assert rows[2].cum_pos == 2 and rows[2].cum_neg == 1
    assert rows[2].tpr_ppm == 1000000 and rows[2].fpr_ppm == 500000
    assert rows[2].precision_ppm == 666666  # trunc(2e6/3)
    assert rows[1].tpr_ppm == 1000000 and rows[1].fpr_ppm == 1000000


def test_roc_curve_points_degenerate_single_class(spark):
    df = spark.createDataFrame([(5, 1), (4, 1)], "score long, y int")
    rows = em.roc_curve_points(df, "score", "y").collect()
    assert all(r.fpr_ppm == 0 for r in rows)  # no negatives: guard, not crash
    assert all(r.precision_ppm == 1000000 for r in rows)


def test_brier_decomposition_perfectly_calibrated_bins(spark):
    # one bin at p=0.2 with 20% positives, one at p=0.8 with 80% positives:
    # reliability = 0, uncertainty = base(1-base) with base = 0.5
    rows = [(200000, 1 if i < 2 else 0) for i in range(10)] + [
        (800000, 1 if i < 8 else 0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "p long, y int")
    r = em.brier_decomposition(df, "p", "y", n_bins=10).collect()[0]
    assert r.n == 20
    assert r.reliability_micro2 == 0
    base = 500000
    assert r.uncertainty_micro2 == base * (1000000 - base)
    # resolution = mean of n_k*(ybar_k - base)^2 = (10*(3e5)^2 * 2)/20
    assert r.resolution_micro2 == (300000 ** 2)
    # brier = mean (p - y)^2 in micro^2: bin1: 2*(8e5)^2+8*(2e5)^2 ... symmetric
    expect = (2 * 800000**2 + 8 * 200000**2) * 2 // 20
    assert r.brier_micro2 == expect


def test_brier_decomposition_miscalibrated_is_flagged(spark):
    # constant p=0.9 but only 10% positives: reliability ~ (0.8)^2
    rows = [(900000, 1 if i == 0 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "p long, y int")
    r = em.brier_decomposition(df, "p", "y", n_bins=10).collect()[0]
    assert r.reliability_micro2 == (900000 - 100000) ** 2
    assert r.resolution_micro2 == 0  # single bin: ybar == base


def test_v_measure_perfect_and_degenerate(spark):
    # perfect clustering: clusters == labels -> h = c = v = 1
    rows = [(i, i % 3, f"l{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, cluster int, label string")
    r = em.v_measure(df, "cluster", "label").collect()[0]
    assert r.homogeneity_raw == 1.0 and r.completeness_raw == 1.0
    assert r.v_measure_raw == 1.0
    assert r.hlk_nanos == 0 and r.hkl_nanos == 0

    # single cluster: perfectly complete, homogeneity < 1
    one = spark.createDataFrame(
        [(i, 0, f"l{i % 3}") for i in range(30)], "id long, cluster int, label string"
    )
    r = em.v_measure(one, "cluster", "label").collect()[0]
    assert r.completeness_raw == 1.0          # H(cluster) = 0 guard
    assert r.homogeneity_raw < 0.01           # labels fully mixed in the cluster


def test_v_measure_matches_sklearn_formula(spark):
    import math

    # 2 clusters x 2 labels with a known contingency [[8,2],[3,7]]
    rows = (
        [(i, 0, "a") for i in range(8)] + [(100 + i, 0, "b") for i in range(2)]
        + [(200 + i, 1, "a") for i in range(3)] + [(300 + i, 1, "b") for i in range(7)]
    )
    df = spark.createDataFrame(rows, "id long, cluster int, label string")
    r = em.v_measure(df, "cluster", "label").collect()[0]

    def ent(counts, n):
        return -sum(x / n * math.log(x / n) for x in counts if x)

    n = 20.0
    h_l = ent([11, 9], n)
    h_k = ent([10, 10], n)
    h_lk = -sum(
        nij / n * math.log(nij / nk)
        for nij, nk in ((8, 10), (2, 10), (3, 10), (7, 10))
    )
    h_kl = -sum(
        nij / n * math.log(nij / nc)
        for nij, nc in ((8, 11), (2, 9), (3, 11), (7, 9))
    )
    h = 1 - h_lk / h_l
    c = 1 - h_kl / h_k
    v = 2 * h * c / (h + c)
    assert abs(r.homogeneity_raw - h) < 1e-6
    assert abs(r.completeness_raw - c) < 1e-6
    assert abs(r.v_measure_raw - v) < 1e-6


def test_adjusted_rand_index_hand_cases(spark):
    # identical partitions -> ARI = 1
    same = spark.createDataFrame(
        [(i, i % 3, f"l{i % 3}") for i in range(30)], "id long, cluster int, label string"
    )
    r = em.adjusted_rand_index(same, "cluster", "label").collect()[0]
    assert r.ari_raw == 1.0

    # known contingency [[8,2],[3,7]] -> sklearn adjusted_rand_score value
    rows = (
        [(i, 0, "a") for i in range(8)] + [(100 + i, 0, "b") for i in range(2)]
        + [(200 + i, 1, "a") for i in range(3)] + [(300 + i, 1, "b") for i in range(7)]
    )
    df = spark.createDataFrame(rows, "id long, cluster int, label string")
    r = em.adjusted_rand_index(df, "cluster", "label").collect()[0]
    # exact rational check against the doubled-binomial closed form
    sij = 8*7 + 2*1 + 3*2 + 7*6
    sa = 10*9 + 10*9
    sb = 11*10 + 9*8
    cc = 20*19
    num = cc*sij - sa*sb
    den = (cc*(sa+sb))//2 - sa*sb
    assert abs(r.ari_raw - num/den) < 1e-12
    assert (r.sij, r.sa, r.sb) == (sij, sa, sb)

    # single cluster vs varied labels: chance-level agreement -> 0
    one = spark.createDataFrame(
        [(i, 0, f"l{i % 3}") for i in range(30)], "id long, cluster int, label string"
    )
    r = em.adjusted_rand_index(one, "cluster", "label").collect()[0]
    assert abs(r.ari_raw) < 1e-12  # Sa collapses the adjustment to 0


def test_gains_table_perfect_ranking(spark):
    from feature_extractor_mbo_lob_spark.functions.evalmetrics import gains_table

    # 20 rows, top-5 scores are exactly the positives -> bucket 1+2 capture all
    rows = [(i, 100 - i, 1 if i < 5 else 0) for i in range(20)]
    df = spark.createDataFrame(rows, "rid long, s long, y int")
    out = {r.bucket: r for r in gains_table(df, "s", "y", "rid", n_buckets=10).collect()}
    assert len(out) == 10
    assert out[1].n == 2 and out[1].n_pos == 2
    # first 5 positions are positives: cum capture hits 1.0 at bucket 3
    assert out[2].cum_pos == 4 and out[3].cum_pos == 5
    assert out[3].capture_ppm == 1_000_000
    # bucket-1 lift = (2/2) / (5/20) = 4x
    assert out[1].lift_ppm == 4_000_000
    # monotone non-decreasing capture
    caps = [out[b].capture_ppm for b in range(1, 11)]
    assert caps == sorted(caps) and caps[-1] == 1_000_000


def test_gains_table_tie_handling_deterministic(spark):
    from feature_extractor_mbo_lob_spark.functions.evalmetrics import gains_table

    # all scores tied: buckets cut by rid order, equal sizes, lift = 1 everywhere
    rows = [(i, 7, i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "rid long, s long, y int")
    out = gains_table(df, "s", "y", "rid", n_buckets=4).collect()
    assert [r.n for r in sorted(out, key=lambda r: r.bucket)] == [10, 10, 10, 10]
    last = max(out, key=lambda r: r.bucket)
    assert last.capture_ppm == 1_000_000 and last.lift_ppm == 1_000_000
    # determinism under repartition
    again = gains_table(df.repartition(7), "s", "y", "rid", n_buckets=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_rfm_segments_hand_case(spark):
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark.functions.evalmetrics import rfm_segments

    # 5 users, clean quintiles: user i has last event on day i (user 0
    # most stale), i+1 events, and purchase total (i+1)*10.00
    rows = []
    for uid in range(5):
        for j in range(uid + 1):
            rows.append((uid, f"2024-01-{uid + 1:02d} 00:00:00", "purchase",
                         10.0))
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    segs = rfm_segments(ev).collect()
    by_user_units = {uid: (uid + 1) * 1000 for uid in range(5)}
    # user 4: most recent (r_q=1), most frequent (f_q=1), top spender (m_q=1)
    top = [s for s in segs if s.r_q == 1 and s.f_q == 1 and s.m_q == 1]
    assert len(top) == 1 and top[0].n_users == 1
    assert top[0].total_cents == by_user_units[4]
    # user 0: stalest, least frequent, smallest spender -> all 5s
    bottom = [s for s in segs if s.r_q == 5 and s.f_q == 5 and s.m_q == 5]
    assert len(bottom) == 1 and bottom[0].n_users == 1
    assert bottom[0].total_cents == 1000
    assert sum(s.n_users for s in segs) == 5
    assert all(s.mean_cents == s.total_cents // s.n_users for s in segs)


def test_rfm_segments_monetary_quantization_ties(spark):
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark.functions.evalmetrics import rfm_segments

    # two users whose cents differ but land in the same whole unit ->
    # same monetary rank value, tie broken by user id deterministically
    rows = [(1, "2024-01-05 00:00:00", "purchase", 5.49),
            (2, "2024-01-05 00:00:00", "purchase", 5.01)]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    segs = rfm_segments(ev, n_buckets=2).collect()
    # both quantize to unit 5; rank order is (unit desc, uid asc):
    # user 1 -> m_q 1, user 2 -> m_q 2
    m_by_cents = {s.total_cents: s.m_q for s in segs}
    assert m_by_cents[549] == 1 and m_by_cents[501] == 2


def test_average_precision_hand_computed(spark):
    from feature_extractor_mbo_lob_spark.functions.evalmetrics import (
        average_precision,
    )

    # scores desc: 5:(1 pos), 4:(1 neg), 3:(1 pos, 1 neg), 2:(1 pos)
    rows = [(5, 1), (4, 0), (3, 1), (3, 0), (2, 1)]
    df = spark.createDataFrame(rows, "score long, y int")
    r = average_precision(df, "score", "y").collect()[0]
    # blocks desc: (pos_at, cum_pos, cum_all) = (1,1,1), (0,1,2), (1,2,4), (1,3,5)
    terms = [
        1 * 1 * 10 ** 6 // 1,
        0,
        1 * 2 * 10 ** 6 // 4,
        1 * 3 * 10 ** 6 // 5,
    ]
    assert r.total_pos == 3 and r.n_thresholds == 4
    assert r.ap_ppm == sum(terms) // 3
    # perfect ranking -> AP = 1
    perf = spark.createDataFrame(
        [(3, 1), (2, 1), (1, 0), (0, 0)], "score long, y int"
    )
    rp = average_precision(perf, "score", "y").collect()[0]
    assert rp.ap_ppm == 10 ** 6


def test_youden_threshold_hand_computed(spark):
    from feature_extractor_mbo_lob_spark.functions.evalmetrics import (
        youden_threshold,
    )

    # perfect separation at score >= 3: tpr=1, fpr=0 -> J = 1e6 at score 3
    rows = [(5, 1), (4, 1), (3, 1), (2, 0), (1, 0)]
    df = spark.createDataFrame(rows, "score long, y int")
    r = youden_threshold(df, "score", "y").collect()[0]
    assert (r.best_score, r.tpr_ppm, r.fpr_ppm, r.j_ppm) == (3, 10 ** 6, 0, 10 ** 6)
    assert r.n_thresholds == 5

    # tie on J -> smallest qualifying score wins (documented rule)
    rows2 = [(5, 1), (4, 1), (3, 0), (2, 0)]
    # J at score 5: 500000-0; at 4: 1e6-0 (max); at 3: 1e6-500000; at 2: 0
    r2 = youden_threshold(
        spark.createDataFrame(rows2, "score long, y int"), "score", "y"
    ).collect()[0]
    assert r2.best_score == 4 and r2.j_ppm == 10 ** 6
