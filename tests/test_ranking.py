"""Hand-computed nDCG / AP / MRR expectations for functions/ranking.py."""

from feature_extractor_mbo_lob_spark.functions import ranking


def _score(spark, ranked_rows, totals_rows, k=3):
    ranked = spark.createDataFrame(ranked_rows, "query_id long, rank int, rel int")
    totals = spark.createDataFrame(totals_rows, "query_id long, n_rel_total long")
    return {
        r.query_id: r
        for r in ranking.retrieval_metrics(ranked, totals, k=k).collect()
    }


def test_perfect_ranking(spark):
    # all top-3 relevant, exactly 3 relevant in corpus -> everything 1.0
    out = _score(
        spark,
        [(1, 1, 1), (1, 2, 1), (1, 3, 1)],
        [(1, 3)],
    )
    r = out[1]
    assert (r.hits, r.ndcg, r.ap, r.rr) == (3, 1.0, 1.0, 1.0)


def test_hits_at_1_and_3(spark):
    # rel at ranks 1 and 3 of k=3, 2 relevant total:
    W = ranking.dcg_weights_nano(3)
    P = ranking.dcg_prefix_nano(3)
    expected_ndcg = (W[0] + W[2]) / P[1]
    # AP = (1/2) * (1/1 + 2/3), via the quantized form
    ap_nano = 10**9 + int(1e9 * 2 / 3 + 0.5)
    expected_ap = ap_nano / (2 * 1e9)
    out = _score(spark, [(1, 1, 1), (1, 2, 0), (1, 3, 1)], [(1, 2)])
    r = out[1]
    assert r.hits == 2
    assert abs(r.ndcg - expected_ndcg) < 1e-6
    assert abs(r.ap - expected_ap) < 1e-6
    assert r.rr == 1.0


def test_no_hits(spark):
    out = _score(spark, [(1, 1, 0), (1, 2, 0)], [(1, 5)])
    r = out[1]
    assert (r.hits, r.ndcg, r.ap, r.rr) == (0, 0.0, 0.0, 0.0)


def test_zero_relevant_in_corpus(spark):
    out = _score(spark, [(1, 1, 0)], [(1, 0)])
    r = out[1]
    assert (r.ndcg, r.ap, r.rr) == (0.0, 0.0, 0.0)


def test_first_hit_rank2_mrr(spark):
    out = _score(spark, [(1, 1, 0), (1, 2, 1)], [(1, 1)])
    assert out[1].rr == 0.5
    # only 1 relevant exists -> IDCG = W[0]; DCG = W[1]
    W = ranking.dcg_weights_nano(3)
    assert abs(out[1].ndcg - W[1] / W[0]) < 1e-6


def test_idcg_capped_at_k(spark):
    # 100 relevant in corpus but k=3: IDCG = P[2] (full top-3 window)
    out = _score(spark, [(1, 1, 1), (1, 2, 1), (1, 3, 1)], [(1, 100)])
    assert out[1].ndcg == 1.0
    # AP normalizer = min(100, 3) = 3
    assert out[1].ap == 1.0


def test_rbo_identical_disjoint_and_partial(spark):
    from feature_extractor_mbo_lob_spark.functions.ranking import (
        rank_biased_overlap,
        rbo_weights,
    )

    a = spark.createDataFrame(
        [("q", f"d{r}", r) for r in range(1, 21)], "query_id string, doc_id string, rank int"
    )
    # identical lists -> 999999 (one micro lost to the final trunc)
    r = rank_biased_overlap(a, a, depth=20).collect()[0]
    assert r.n_matches == 20 and r.rbo_micro == 999999

    # disjoint lists -> no rows for the query (no matches)
    b = spark.createDataFrame(
        [("q", f"x{r}", r) for r in range(1, 21)], "query_id string, doc_id string, rank int"
    )
    assert rank_biased_overlap(a, b, depth=20).count() == 0

    # same docs reversed: exact credit accounting per match
    rev = spark.createDataFrame(
        [("q", f"d{r}", 21 - r) for r in range(1, 21)],
        "query_id string, doc_id string, rank int",
    )
    r = rank_biased_overlap(a, rev, depth=20).collect()[0]
    _w, credit, W = rbo_weights(20)
    expect = sum(credit[max(rr, 21 - rr) - 1] for rr in range(1, 21)) // W
    assert r.n_matches == 20 and r.rbo_micro == expect
    # reversal is heavily penalized vs identity
    assert r.rbo_micro < 700_000
