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
