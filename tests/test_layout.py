"""Z-order layout: Morton-code exactness + file-skipping effectiveness."""

import pytest
from pyspark.sql import functions as F

from feature_extractor_mbo_lob_spark.operators import layout


def _morton_py(rows, bits=8):
    """Driver-independent python replica of with_zvalue for 2 columns."""
    top = (1 << bits) - 1
    xs = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    mnx, mxx = min(xs), max(xs)
    mny, mxy = min(ys), max(ys)
    out = []
    for x, y in rows:
        bx = ((x - mnx) * top) // max(mxx - mnx, 1)
        by = ((y - mny) * top) // max(mxy - mny, 1)
        z = 0
        for j in range(bits):
            z |= ((bx >> j) & 1) << (j * 2)
            z |= ((by >> j) & 1) << (j * 2 + 1)
        out.append(z)
    return out


class TestZValue:
    def test_matches_python_replica(self, spark):
        rows = [(3, 100), (7, 250), (0, 0), (1000, 9999), (512, 4096)]
        df = spark.createDataFrame(rows, ["a", "b"])
        got = {
            (r["a"], r["b"]): r["zvalue"]
            for r in layout.with_zvalue(df, ["a", "b"]).collect()
        }
        want = dict(zip(rows, _morton_py(rows)))
        assert got == want

    def test_null_buckets_to_min(self, spark):
        df = spark.createDataFrame(
            [(0, 10), (None, 20), (100, 30)], "a: int, b: int"
        )
        out = {r["b"]: r["zvalue"] for r in layout.with_zvalue(df, ["a", "b"]).collect()}
        # null a behaves exactly as a == min(a): same code as an explicit 0
        df2 = spark.createDataFrame([(0, 20), (100, 30)], "a: int, b: int")
        twin = {
            r["b"]: r["zvalue"]
            for r in layout.with_zvalue(
                df2.union(spark.createDataFrame([(0, 10)], "a: int, b: int")),
                ["a", "b"],
            ).collect()
        }
        assert out[20] == twin[20]

    def test_bits_overflow_guard(self, spark):
        df = spark.createDataFrame([(1, 2)], ["a", "b"])
        with pytest.raises(ValueError):
            layout.with_zvalue(df, ["a", "b"], bits=32)


class TestBucketedJoin:
    def test_colocated_join_has_no_exchange(self, spark, tmp_path):
        left = spark.range(0, 5000).select(
            (F.col("id") % 200).alias("k"), F.col("id").alias("v1")
        )
        right = spark.range(0, 2000).select(
            (F.col("id") % 200).alias("k"), (F.col("id") * 3).alias("v2")
        )
        try:
            layout.bucketed_write(left, "bkt_l", str(tmp_path / "l"), ["k"], 8)
            layout.bucketed_write(right, "bkt_r", str(tmp_path / "r"), ["k"], 8)

            j = layout.colocated_join(spark, "bkt_l", "bkt_r", ["k"])
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan

            # the same join over plain (unbucketed) parquet DOES shuffle
            left.write.mode("overwrite").parquet(str(tmp_path / "pl"))
            right.write.mode("overwrite").parquet(str(tmp_path / "pr"))
            pj = (
                spark.read.parquet(str(tmp_path / "pl"))
                .hint("merge")
                .join(spark.read.parquet(str(tmp_path / "pr")), ["k"])
            )
            pplan = pj._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in pplan

            # and the result is the same rows either way
            assert j.count() == pj.count()
            got = j.agg(F.sum(F.col("v1") * F.col("v2"))).first()[0]
            want = pj.agg(F.sum(F.col("v1") * F.col("v2"))).first()[0]
            assert got == want
        finally:
            spark.sql("DROP TABLE IF EXISTS bkt_l")
            spark.sql("DROP TABLE IF EXISTS bkt_r")


class TestZOrderWrite:
    def test_spans_narrower_than_single_key_sort(self, spark, tmp_path):
        # A grid where x and y are independent: sorting by x alone leaves
        # y spans at full width in every file; Z-order narrows BOTH.
        n = 64
        rows = [(i * n + j, i, j) for i in range(n) for j in range(n)]
        df = spark.createDataFrame(rows, ["rid", "x", "y"]).cache()

        zpath = str(tmp_path / "zorder")
        xpath = str(tmp_path / "bysort")
        layout.zorder_write(df, zpath, ["x", "y"], num_files=16)
        (
            df.repartitionByRange(16, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(xpath)
        )

        def mean_span(path, col):
            spans = layout.file_span_stats(path, col)
            assert spans, path
            return sum(hi - lo for lo, hi in spans) / len(spans)

        # x-sorted layout: x prunes well but y is ~full-range everywhere
        assert mean_span(xpath, "y") > 0.8 * (n - 1)
        # z-order: both columns substantially narrowed
        assert mean_span(zpath, "x") < 0.6 * (n - 1)
        assert mean_span(zpath, "y") < 0.6 * (n - 1)

        # round-trip: layout is a reordering, never a rewrite of values
        back = spark.read.parquet(zpath)
        assert back.count() == n * n
        assert sorted(r["rid"] for r in back.select("rid").collect()) == sorted(
            r[0] for r in rows
        )
        df.unpersist()


class TestZValueRandom:
    def test_random_batch_matches_replica(self, spark):
        import random

        rng = random.Random(13)
        rows = [
            (rng.randint(-50_000, 50_000), rng.randint(0, 3_000_000_000))
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "a: long, b: long")
        got = {
            (r["a"], r["b"]): r["zvalue"]
            for r in layout.with_zvalue(df, ["a", "b"]).collect()
        }
        want = dict(zip(rows, _morton_py(rows)))
        assert got == want


def test_compaction_plan_bins(spark):
    from feature_extractor_mbo_lob_spark.operators.layout import compaction_plan

    # partition p: sizes 600,600,600,600 target 1000 ->
    # prefix-before: 0,600,1200,1800 -> bins 0,0,1,1
    rows = [("p", i, 600) for i in range(4)]
    df = spark.createDataFrame(rows, "partition string, file_id int, size_bytes int")
    out = {(r.part, r.bin): r for r in compaction_plan(df, target_bytes=1000).collect()}
    assert out[("p", 0)].n_files == 2 and out[("p", 0)].total_bytes == 1200
    assert out[("p", 1)].n_files == 2
    assert out[("p", 0)].first_file == 0 and out[("p", 0)].last_file == 1
    assert out[("p", 0)].merges


def test_compaction_plan_partition_isolated(spark):
    from feature_extractor_mbo_lob_spark.operators.layout import compaction_plan

    rows = [("a", 1, 10), ("b", 2, 10)]
    df = spark.createDataFrame(rows, "partition string, file_id int, size_bytes int")
    out = compaction_plan(df, target_bytes=1000).collect()
    assert len(out) == 2  # prefixes do not leak across partitions
    assert all(r.bin == 0 and not r.merges for r in out)


def test_file_skipping_report(spark):
    from feature_extractor_mbo_lob_spark.operators.layout import file_skipping_report

    # spans: [0,10] skip (max<20), [30,40] keep, [90,99] skip (min>50), [15,25] keep
    rows = [(1, 0.0, 10.0), (2, 30.0, 40.0), (3, 90.0, 99.0), (4, 15.0, 25.0)]
    df = spark.createDataFrame(rows, "file_id int, min_v double, max_v double")
    r = file_skipping_report(df, lo=20.0, hi=50.0).collect()[0]
    assert (r.n_files, r.n_skippable, r.n_scanned) == (4, 2, 2)
    assert r.scan_frac == 0.5


def test_clustering_depth_hand_cases(spark):
    from feature_extractor_mbo_lob_spark.operators.layout import clustering_depth

    # f0 [0,10], f1 [5,15] (overlaps f0,f2), f2 [15,20] (touches f1 at 15
    # -> inclusive overlap), f3 [100,110] disjoint, f4 [0,200] covers all
    rows = [(0, 0.0, 10.0), (1, 5.0, 15.0), (2, 15.0, 20.0),
            (3, 100.0, 110.0), (4, 0.0, 200.0)]
    df = spark.createDataFrame(rows, "file_id long, min_v double, max_v double")
    out = {r.file_id: r.overlap_depth for r in clustering_depth(df).collect()}
    assert out == {0: 2, 1: 3, 2: 2, 3: 1, 4: 4}

    # perfectly clustered (disjoint ranges) -> depth 0 everywhere
    rows = [(i, float(i * 10), float(i * 10 + 5)) for i in range(6)]
    df = spark.createDataFrame(rows, "file_id long, min_v double, max_v double")
    assert all(r.overlap_depth == 0 for r in clustering_depth(df).collect())


def test_clustering_depth_string_file_ids(spark):
    """ADVICE r3: string/uuid file ids must survive (the old long cast made
    the self-join match nothing -> silent empty frame)."""
    from feature_extractor_mbo_lob_spark.operators.layout import clustering_depth

    rows = [("f-a", 0.0, 10.0), ("f-b", 5.0, 15.0), ("f-c", 15.0, 20.0),
            ("f-d", 100.0, 110.0), ("f-e", 0.0, 200.0)]
    df = spark.createDataFrame(rows, "file_id string, min_v double, max_v double")
    out = {r.file_id: r.overlap_depth for r in clustering_depth(df).collect()}
    assert out == {"f-a": 2, "f-b": 3, "f-c": 2, "f-d": 1, "f-e": 4}
    assert dict(clustering_depth(df).dtypes)["file_id"] == "string"
