"""Triangle counting / clustering coefficient on hand-built graphs."""

from feature_extractor_mbo_lob_spark.functions import graph


def _stats(spark, edges):
    df = spark.createDataFrame(edges, "a string, b string")
    return {r.node: r for r in graph.triangle_stats(df).collect()}


def test_triangle_k3(spark):
    out = _stats(spark, [("a", "b"), ("a", "c"), ("b", "c")])
    for n in "abc":
        assert out[n].degree == 2
        assert out[n].triangles == 1
        assert out[n].clustering == 1.0


def test_triangle_k4_minus_edge(spark):
    # K4 without (c,d): triangles abc and abd; c,d have degree 2, cc=1;
    # a,b have degree 3, 2 triangles each, cc = 2*2/(3*2) = 0.666667
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")]
    out = _stats(spark, edges)
    assert out["a"].triangles == 2 and out["b"].triangles == 2
    assert out["c"].triangles == 1 and out["d"].triangles == 1
    assert out["a"].clustering == 0.666667
    assert out["c"].clustering == 1.0


def test_triangle_free_path(spark):
    out = _stats(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert all(r.triangles == 0 for r in out.values())
    assert out["a"].clustering == 0.0  # degree 1
    assert out["b"].clustering == 0.0  # degree 2, no triangle


def test_unordered_and_duplicate_edges_ignored(spark):
    # (b,a) violates canonical order -> dropped; dup (a,b) deduped
    out = _stats(spark, [("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"), ("b", "c")])
    assert out["a"].degree == 2 and out["a"].triangles == 1
