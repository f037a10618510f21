"""URL canonicalization/dedup, corpus-wide duplicate-ngram spans,
rarity quality buckets, and the mixture plan — the round-3 additions to
the LLM-pipeline family."""

from pyspark.sql import functions as F

from feature_extractor_mbo_lob_spark.functions import corpus as cx
from feature_extractor_mbo_lob_spark.functions import web
from feature_extractor_mbo_lob_spark.operators import dedup as dd


def _canon(spark, url: str) -> str:
    return (
        spark.range(1)
        .select(web.canonicalize_url(F.lit(url)).alias("c"))
        .collect()[0]["c"]
    )


class TestCanonicalizeUrl:
    def test_tracking_params_stripped_and_sorted(self, spark):
        assert (
            _canon(spark, "https://example.com/p?utm_source=x&b=2&a=1&fbclid=q")
            == "https://example.com/p?a=1&b=2"
        )

    def test_host_case_port_www_fragment(self, spark):
        assert (
            _canon(spark, "HTTPS://WWW.Example.COM:443/Page/#frag")
            == "https://example.com/Page"
        )
        # path case is preserved; host case is not
        assert _canon(spark, "http://A.com:80/X") == "http://a.com/X"

    def test_trailing_slash_and_empty_query(self, spark):
        assert _canon(spark, "https://a.com/x/?utm_medium=m") == "https://a.com/x"
        assert _canon(spark, "https://a.com/") == "https://a.com"

    def test_scheme_preserved(self, spark):
        assert _canon(spark, "http://a.com/x") != _canon(spark, "https://a.com/x")


class TestUrlDedup:
    def test_keeps_min_id_per_canonical(self, spark):
        rows = [
            (1, "https://www.a.com/x?utm_source=s"),
            (2, "HTTPS://A.COM:443/x/"),
            (3, "https://a.com/y"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "url"])
        out = {r["doc_id"]: r for r in web.url_dedup(df).collect()}
        assert out[1]["canonical_url"] == out[2]["canonical_url"] == "https://a.com/x"
        assert out[1]["kept"] and not out[2]["kept"]
        assert out[2]["keep_id"] == 1
        assert out[3]["kept"]


class TestDupNgramStats:
    def test_matches_naive(self, spark):
        texts = {
            1: "a b c d e",
            2: "a b c x y",
            3: "p q r s t",
            4: "a b c d e",  # exact dup of 1
            5: "one two",  # shorter than n -> zero grams
        }
        df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
        out = {r["doc_id"]: r for r in dd.dup_ngram_stats(df, n=3).collect()}

        # naive recomputation
        from collections import Counter

        grams = {
            d: [
                " ".join(ws[i : i + 3])
                for ws in [t.split()]
                for i in range(len(ws) - 2)
            ]
            for d, t in texts.items()
        }
        cnt = Counter(g for gs in grams.values() for g in gs)
        for d, gs in grams.items():
            assert out[d]["n_grams"] == len(gs)
            assert out[d]["dup_grams"] == sum(1 for g in gs if cnt[g] >= 2)
        assert out[5]["n_grams"] == 0 and out[5]["dup_grams"] == 0


class TestRarityBuckets:
    def _docs(self, spark):
        rows = []
        # lang 'en': 6 docs with graded rarity (common word repeated vs unique)
        for i in range(6):
            words = ["common"] * (6 - i) + [f"rare{i}_{j}" for j in range(i)]
            rows.append((i, " ".join(words), "en"))
        return spark.createDataFrame(rows, ["doc_id", "text", "lang"])

    def test_exact_buckets_ordered_by_rarity(self, spark):
        out = {
            r["doc_id"]: r
            for r in cx.rarity_quality_buckets(self._docs(spark)).collect()
        }
        # doc 0 is all common words -> bucket 1 (head); doc 5 mostly unique -> 3
        assert out[0]["bucket"] == 1
        assert out[5]["bucket"] == 3
        scores = [out[i]["rarity_score"] for i in range(6)]
        assert scores == sorted(scores, reverse=True)

    def test_approx_path_same_schema_and_monotone(self, spark):
        exact = cx.rarity_quality_buckets(self._docs(spark), exact=True)
        approx = cx.rarity_quality_buckets(self._docs(spark), exact=False)
        assert set(approx.columns) == set(exact.columns)
        a = {r["doc_id"]: r["bucket"] for r in approx.collect()}
        # extremes agree with the exact form even under sketch cutpoints
        assert a[0] == 1 and a[5] == 3


class TestMixturePlan:
    def test_rational_identities(self, spark):
        rows = [(i, " ".join(["w"] * (10 * (s + 1))), f"src{s}") for i, s in enumerate([0, 0, 1, 2])]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        out = {r["source"]: r for r in cx.mixture_plan(df, weights={"src0": 2}).collect()}
        total = sum(r["tokens"] for r in out.values())
        wsum = sum(r["weight"] for r in out.values())
        for s, r in out.items():
            assert r["total_tokens"] == total
            assert r["epochs_num"] == total * r["weight"]
            assert r["epochs_den"] == r["tokens"] * wsum
            assert r["full_epochs"] == r["epochs_num"] // r["epochs_den"]
        assert out["src0"]["weight"] == 2 and out["src1"]["weight"] == 1


class TestCanonicalizeIdempotent:
    def test_idempotent_over_url_grid(self, spark):
        """canonicalize(canonicalize(u)) == canonicalize(u) for a grid of
        messy URLs — the fixed-point property every URL normalizer needs
        (re-crawled canonical URLs must not drift)."""
        schemes = ["http://", "HTTPS://"]
        hosts = ["WWW.Ex.COM:443", "ex.com", "www.ex.com:80", "sub.ex.com"]
        paths = ["", "/", "/A/b/", "/p"]
        queries = ["", "?utm_source=x", "?b=2&a=1&ref=r", "?a=1#f", "#only"]
        urls = [s + h + p + q for s in schemes for h in hosts for p in paths for q in queries]
        df = spark.createDataFrame([(u,) for u in urls], ["url"])
        once = web.canonicalize_url("url").alias("c1")
        out = df.select(once).select(
            F.col("c1"), web.canonicalize_url(F.col("c1")).alias("c2")
        )
        bad = out.filter(F.col("c1") != F.col("c2")).collect()
        assert not bad, bad


class TestRemoveDupSpans:
    def test_removal_semantics(self, spark):
        texts = {1: "a b c d e f", 2: "a b c x y z", 3: "p q r s t u", 4: "a b c d e f"}
        df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
        out = {r["doc_id"]: r for r in dd.remove_dup_spans(df, n=3).collect()}
        # docs 1/4 are exact dups -> everything covered -> fully removed
        assert out[1]["text_clean"] == "" and out[1]["n_removed"] == 6
        assert out[4]["text_clean"] == ""
        # doc 2 shares only the "a b c" span (positions 1-3)
        assert out[2]["text_clean"] == "x y z" and out[2]["n_removed"] == 3
        # doc 3 untouched
        assert out[3]["text_clean"] == "p q r s t u" and out[3]["n_removed"] == 0

    def test_short_doc_passthrough(self, spark):
        df = spark.createDataFrame([(1, "just two")], ["doc_id", "text"])
        r = dd.remove_dup_spans(df, n=3).collect()[0]
        assert r["text_clean"] == "just two" and r["n_removed"] == 0


class TestCountMinSketch:
    def test_overestimates_never_under(self, spark):
        from collections import Counter

        from feature_extractor_mbo_lob_spark.functions import sketch

        keys = ["a"] * 50 + ["b"] * 20 + [f"k{i}" for i in range(200)]
        df = spark.createDataFrame([(k,) for k in keys], ["key"])
        cells = sketch.count_min_sketch(df, "key", depth=4, width=64)
        # sketch total mass per row == stream length
        mass = {r["row_idx"]: 0 for r in cells.collect()}
        for r in cells.collect():
            mass[r["row_idx"]] += r["cnt"]
        assert all(m == len(keys) for m in mass.values())
        truth = Counter(keys)
        uniq = spark.createDataFrame([(k,) for k in truth], ["key"])
        est = {
            r["key"]: r["est_cnt"]
            for r in sketch.cms_estimate(cells, uniq, "key", depth=4, width=64).collect()
        }
        assert all(est[k] >= c for k, c in truth.items())
        # heavy hitters estimated closely at this load factor
        assert est["a"] - truth["a"] <= 10

    def test_weighted(self, spark):
        from feature_extractor_mbo_lob_spark.functions import sketch

        df = spark.createDataFrame([("x", 5), ("x", 7), ("y", 1)], ["key", "wt"])
        cells = sketch.count_min_sketch(df, "key", depth=2, width=16, weight_col="wt")
        uniq = spark.createDataFrame([("x",), ("y",)], ["key"])
        est = {
            r["key"]: r["est_cnt"]
            for r in sketch.cms_estimate(cells, uniq, "key", depth=2, width=16).collect()
        }
        assert est["x"] >= 12 and est["y"] >= 1


class TestHyperLogLog:
    def test_estimate_within_error_bound(self, spark):
        from feature_extractor_mbo_lob_spark.functions import sketch

        n = 5000
        df = spark.range(n).select(F.concat(F.lit("key"), F.col("id")).alias("k"))
        regs = sketch.hll_registers(df, "k", p=8)
        est = sketch.hll_estimate(regs, p=8)
        # std error 1.04/sqrt(256) ~= 6.5%; allow 4 sigma
        assert abs(est - n) / n < 0.26

    def test_registers_merge_by_max(self, spark):
        from feature_extractor_mbo_lob_spark.functions import sketch

        a = spark.range(0, 800).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
        b = spark.range(400, 1200).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
        ra, rb = sketch.hll_registers(a, "k"), sketch.hll_registers(b, "k")
        merged = (
            ra.unionByName(rb)
            .groupBy("register")
            .agg(F.max("max_rank").cast("int").alias("max_rank"))
        )
        direct = sketch.hll_registers(a.unionByName(b), "k")
        got = {(r["register"], r["max_rank"]) for r in merged.collect()}
        want = {(r["register"], r["max_rank"]) for r in direct.collect()}
        assert got == want

    def test_small_range_linear_counting(self, spark):
        from feature_extractor_mbo_lob_spark.functions import sketch

        df = spark.range(30).select(F.concat(F.lit("v"), F.col("id")).alias("k"))
        est = sketch.hll_estimate(sketch.hll_registers(df, "k"), p=8)
        assert abs(est - 30) < 8

    def test_p_validation(self, spark):
        import pytest as _pt

        from feature_extractor_mbo_lob_spark.functions import sketch

        df = spark.range(1).select(F.col("id").cast("string").alias("k"))
        with _pt.raises(ValueError):
            sketch.hll_registers(df, "k", p=7)


class TestHdrHistogram:
    def test_bucket_recovery_error_bound(self, spark):
        from feature_extractor_mbo_lob_spark.functions import sketch

        vals = [1, 2, 3, 15, 16, 17, 100, 1000, 65535, 65536, 10**9]
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        hist = sketch.hdr_histogram(df, "v", sub_buckets=16)
        rows = hist.collect()
        assert sum(r["cnt"] for r in rows) == len(vals)
        for r in rows:
            # exact bucket interval: [lo + sub*lo/16, lo + (sub+1)*lo/16)
            b_lo = r["lo"] + r["sub"] * r["lo"] / 16
            b_hi = r["lo"] + (r["sub"] + 1) * r["lo"] / 16
            assert any(b_lo <= v < b_hi or (v < 1 and r["lo"] == 0) for v in vals)
            # relative bucket width <= 1/16
            if r["lo"] >= 1:
                assert (b_hi - b_lo) / b_lo <= 1 / 16 + 1e-9

    def test_underflow_bucket(self, spark):
        from feature_extractor_mbo_lob_spark.functions import sketch

        df = spark.createDataFrame([(0,), (0,), (5,)], ["v"])
        rows = {(r["octave"], r["sub"], r["lo"]): r["cnt"] for r in
                sketch.hdr_histogram(df, "v").collect()}
        assert rows[(0, 0, 0)] == 2

    def test_quantiles_close_to_exact(self, spark):
        import numpy as np

        from feature_extractor_mbo_lob_spark.functions import sketch

        vals = [int(x) for x in np.geomspace(10, 1_000_000, 500)]
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        hist = sketch.hdr_histogram(df, "v", sub_buckets=16)
        qs = sketch.hdr_quantiles(hist, [0.5, 0.9, 0.99], sub_buckets=16)
        for q, est in qs.items():
            exact = float(np.quantile(vals, q, method="lower"))
            assert abs(est - exact) / exact < 0.1, (q, est, exact)


class TestApplyMixture:
    def test_epoch_counts_match_plan(self, spark):
        rows = [(i, " ".join(["w"] * 10), f"src{i % 2}") for i in range(40)]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        plan = cx.mixture_plan(df, weights={"src0": 3})
        out = cx.apply_mixture(df, plan)
        per_doc = {
            r["doc_id"]: r["n"]
            for r in out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        pl = {r["source"]: r for r in plan.collect()}
        for d in range(40):
            src = f"src{d % 2}"
            full = pl[src]["epochs_num"] // pl[src]["epochs_den"]
            assert per_doc.get(d, 0) in (full, full + 1)
        # epochs are 1..n_rep with no gaps
        eps = out.filter(F.col("doc_id") == 0).select("epoch").collect()
        got = sorted(r["epoch"] for r in eps)
        assert got == list(range(1, len(got) + 1))
        # aggregate mixture moves toward the 3:1 target
        n0 = out.filter(F.col("source") == "src0").count()
        n1 = out.filter(F.col("source") == "src1").count()
        assert n0 > n1


class TestLinearCounting:
    def test_exact_when_sparse(self, spark):
        import math

        from feature_extractor_mbo_lob_spark.functions import sketch

        keys = [f"k{i}" for i in range(300)] * 3  # 300 distinct, 900 rows
        df = spark.createDataFrame([(k,) for k in keys], ["key"])
        r = sketch.linear_counting(df, "key", m=4096).collect()[0]
        assert r["m"] == 4096 and r["occupied"] + r["empty"] == 4096
        est = -4096 * math.log(r["empty"] / 4096)
        # load factor 300/4096 -> estimate within ~5% of truth
        assert abs(est - 300) / 300 < 0.05


class TestStreamingSketch:
    def test_cms_cells_match_batch(self, spark):
        """count_min_sketch is one algebraic groupBy, so it runs unchanged
        as a streaming aggregation — cells from an availableNow replay in
        complete mode must equal the batch cells exactly."""
        import tempfile
        import uuid

        from feature_extractor_mbo_lob_spark.functions import sketch

        keys = ["a"] * 30 + ["b"] * 11 + [f"k{i}" for i in range(50)]
        df = spark.createDataFrame([(k,) for k in keys], ["key"])
        batch = {
            (r["row_idx"], r["col_idx"]): r["cnt"]
            for r in sketch.count_min_sketch(df, "key", depth=3, width=32).collect()
        }
        src = tempfile.mkdtemp(prefix="cms_src")
        df.write.mode("overwrite").parquet(src)
        stream_in = spark.readStream.schema(df.schema).parquet(src)
        out = sketch.count_min_sketch(stream_in, "key", depth=3, width=32)
        name = "m" + uuid.uuid4().hex[:8]
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = {
            (r["row_idx"], r["col_idx"]): r["cnt"]
            for r in spark.table(name).collect()
        }
        assert streamed == batch


class TestDedupAgainst:
    def test_incremental_flags(self, spark):
        ref = spark.createDataFrame(
            [(0, "the quick brown fox jumps over the lazy dog today"),
             (2, "completely different reference content lives here now")],
            ["doc_id", "text"],
        )
        new = spark.createDataFrame(
            [(1, "The  quick brown fox jumps over the lazy dog today"),  # exact (normalized)
             (3, "the quick brown fox jumps over the lazy dog tomorrow"),  # near
             (5, "fresh unseen text with no overlap whatsoever at all")],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in dd.dedup_against(new, ref, num_hashes=8, bands=4).collect()}
        assert out[1]["exact_dup"] and out[1]["near_dup"]
        assert not out[3]["exact_dup"] and out[3]["near_dup"]
        assert not out[5]["exact_dup"] and not out[5]["near_dup"]


class TestKeySkewReport:
    def test_hot_key_surfaces_first(self, spark):
        from feature_extractor_mbo_lob_spark import validation as val

        rows = [("hot",)] * 90 + [(f"k{i}",) for i in range(10)]
        df = spark.createDataFrame(rows, ["conv_id"])
        out = val.key_skew_report(df, "conv_id", top_k=3).collect()
        assert out[0]["key"] == "hot" and out[0]["rank"] == 1
        assert out[0]["cnt"] == 90 and out[0]["total_rows"] == 100
        assert out[0]["share_ppm"] == 900_000
        assert out[0]["n_keys"] == 11
        assert len(out) == 3


class TestCorpusDiff:
    def test_all_four_statuses(self, spark):
        old = spark.createDataFrame(
            [(1, "same text"), (2, "will change"), (3, "going away")],
            ["doc_id", "text"],
        )
        new = spark.createDataFrame(
            [(1, "Same  TEXT"), (2, "has changed"), (4, "brand new")],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r["status"] for r in cx.corpus_diff(old, new).collect()}
        # normalization makes casing/whitespace-only edits "unchanged"
        assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def _md5pos(key: str, seed: int, m: int) -> int:
    import hashlib

    h = hashlib.md5(f"{seed}|{key}".encode()).hexdigest()
    return int(h[:7], 16) % m


class TestBloomFilter:
    def test_no_false_negatives_and_python_exact_fp(self, spark):
        from feature_extractor_mbo_lob_spark.functions import sketch

        bench_keys = ["alpha", "beta", "gamma"]
        probe_keys = bench_keys + ["delta", "epsilon", "zeta", "eta"]
        m, k = 64, 3
        bench = spark.createDataFrame([(x,) for x in bench_keys], ["key"])
        probe = spark.createDataFrame([(x,) for x in probe_keys], ["key"])
        bits = sketch.bloom_bits(bench, "key", num_hashes=k, num_bits=m)
        got = {
            r["key"]: r["maybe_member"]
            for r in sketch.bloom_probe(probe, "key", bits, k, m).collect()
        }
        bitset = {_md5pos(x, i, m) for x in bench_keys for i in range(k)}
        for key in probe_keys:
            expect = all(_md5pos(key, i, m) in bitset for i in range(k))
            assert got[key] == expect, key
        for key in bench_keys:  # never a false negative
            assert got[key] is True


class TestWordGraphPagerank:
    def test_edges_from_known_text(self, spark):
        from feature_extractor_mbo_lob_spark.functions import graph

        docs = spark.createDataFrame(
            [(1, "a b  A"), (2, "b")], ["doc_id", "text"]
        )
        edges = {
            (r["src"], r["dst"]): r["w"]
            for r in graph.word_transition_edges(docs, buckets=4).collect()
        }
        import hashlib

        def bucket(w):
            return int(hashlib.md5(w.encode()).hexdigest()[:7], 16) % 4

        # "a b a" -> transitions (a,b), (b,a); doc 2 has none. Buckets may
        # collide (they do at buckets=4: both 'a' and 'b' land in bucket 3),
        # so derive the expectation from the transitions, not the words.
        from collections import Counter

        expect = Counter()
        for s, d in [("a", "b"), ("b", "a")]:
            expect[(f"wb{bucket(s):02d}", f"wb{bucket(d):02d}")] += 1
        assert edges == dict(expect)

    def test_integer_pagerank_matches_python_replica(self, spark):
        from feature_extractor_mbo_lob_spark.functions import graph

        raw = [("x", "y", 3), ("y", "x", 1), ("x", "z", 1), ("z", "x", 2)]
        edges = spark.createDataFrame(raw, ["src", "dst", "w"])
        got = {
            r["node"]: r["rank_micro"]
            for r in graph.pagerank_int(edges, iterations=3).collect()
        }

        nodes = sorted({s for s, _, _ in raw} | {d for _, d, _ in raw})
        n = len(nodes)
        outw = {}
        for s, _, w in raw:
            outw[s] = outw.get(s, 0) + w
        base = (1_000_000 * 3) // (20 * n)
        r = {v: 1_000_000 // n for v in nodes}
        for _ in range(3):
            c = {v: 0 for v in nodes}
            for s, d, w in raw:
                c[d] += (r[s] * w) // outw[s]
            r = {v: base + (17 * c[v]) // 20 for v in nodes}
        assert got == r
        assert all(isinstance(v, int) for v in got.values())
