

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
