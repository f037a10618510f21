

def test_embedding_anisotropy_extremes(spark):
    """Identical vectors -> A = 1 (ppm 1e6); perfectly cancelling
    vectors -> A = 0; all-zero corpus -> NULL."""
    from feature_extractor_mbo_lob_spark.operators.similarity import (
        embedding_anisotropy,
    )

    same = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(3)], "vec_id long, embedding array<double>"
    )
    r = embedding_anisotropy(same).collect()[0]
    assert (r.n, r.dim, r.a_ppm) == (3, 2, 1000000)

    cancel = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    r2 = embedding_anisotropy(cancel).collect()[0]
    assert r2.a_ppm == 0

    zero = spark.createDataFrame(
        [(0, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    r3 = embedding_anisotropy(zero).collect()[0]
    assert r3.a_ppm is None


def test_embedding_group_mmd_hand_computed(spark):
    from feature_extractor_mbo_lob_spark.operators.similarity import (
        embedding_group_mmd,
    )

    rows = [([1.0, 0.0], 0), ([1.0, 0.0], 0), ([0.0, 1.0], 1), ([0.0, 1.0], 1)]
    df = spark.createDataFrame(rows, "embedding array<double>, grp int")
    r = embedding_group_mmd(df).collect()[0]
    # mu_a = (1,0), mu_b = (0,1): delta = (1e6, -1e6), |delta|^2 = 2e12
    assert (r.n_a, r.n_b, r.dims) == (2, 2, 2)
    assert r.mmd2_micro2_sum == 2 * 10 ** 12
    assert r.mmd2_micro == 2 * 10 ** 6

    # negative lanes exercise the sign-decomposed quantized means
    rows2 = [([-0.5], 0), ([-0.5], 0), ([0.25], 1), ([0.25], 1)]
    df2 = spark.createDataFrame(rows2, "embedding array<double>, grp int")
    r2 = embedding_group_mmd(df2).collect()[0]
    assert r2.mmd2_micro2_sum == 750000 ** 2
    assert r2.mmd2_micro == 750000 ** 2 // 10 ** 6
