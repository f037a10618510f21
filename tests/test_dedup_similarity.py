"""Dedup + similarity search + text functions."""

import math

import pytest
from pyspark.sql import functions as F

from feature_extractor_mbo_lob_spark.functions import text as tx
from feature_extractor_mbo_lob_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "THE  quick brown fox jumps over the lazy dog"),  # exact after norm
        (3, "completely different text about spark windows and shuffles"),
        (4, "el gato es un animal y la casa es grande"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r.keep_id: r for r in dedup.exact_dedup(docs).collect()}
    assert out[0].n_copies == 2 and out[0].member_ids == [0, 2]
    assert out[1].n_copies == 1
    assert len(out) == 4


def test_ngram_jaccard(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.3).collect()}
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0
    assert (0, 1) in pairs and 0.3 <= pairs[(0, 1)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r.id_a, r.id_b): r.n_bands for r in
             dedup.minhash_lsh_pairs(docs, k=3, num_hashes=16, bands=8).collect()}
    assert (0, 2) in pairs and pairs[(0, 2)] == 8  # identical shingle sets
    assert (0, 1) in pairs                          # near-dup shares some bands
    assert (0, 4) not in pairs


def test_minhash_signature_determinism(docs):
    a = dedup.minhash_signatures(docs, num_hashes=4).orderBy("id").collect()
    b = dedup.minhash_signatures(docs.repartition(5), num_hashes=4).orderBy("id").collect()
    assert a == b


def test_simhash_near_dups_close(docs):
    sim = dedup.simhash(docs, k=2)
    vals = {r.id: r.simhash for r in sim.collect()}
    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert hamming(vals[0], vals[2]) == 0
    assert hamming(vals[0], vals[1]) < hamming(vals[0], vals[3])
    cands = {(r.id_a, r.id_b): r.hamming for r in
             dedup.simhash_candidates(sim).collect()}
    assert (0, 2) in cands and cands[(0, 2)] == 0


def test_simhash_huge_doc_no_lane_overflow(spark):
    # >=65536 distinct shingles overflowed the old 16-bit lanes; 32-bit
    # lanes must match an exact per-bit Python recount
    import hashlib

    n = 70_000
    text = " ".join(f"w{i}" for i in range(n))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = dedup.simhash(df, k=2).collect()[0]
    words = text.split(" ")
    shingles = {" ".join(words[i:i + 2]) for i in range(n - 1)}
    cnt = [0] * 64
    for s in shingles:
        hx = hashlib.md5(s.encode()).hexdigest()
        for i in range(64):
            if (int(hx[i // 4], 16) >> (i % 4)) & 1:
                cnt[i] += 1
    want = sum((1 << i) for i in range(64) if 2 * cnt[i] > len(shingles))
    if want >= 1 << 63:
        want -= 1 << 64
    assert row.simhash == want


@pytest.fixture(scope="module")
def vecs(spark):
    # first two vectors double as IVF centroids (deterministic_centroids);
    # x-axis cluster {0, 2, 4} and y-axis cluster {1, 3} are separable
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 0.95, 0.05]),
        (4, [0.95, 0.05, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk(vecs):
    out = similarity.brute_force_topk(vecs, k=1)
    top = {r.query_id: (r.neighbor_id, r.cos) for r in out.collect()}
    assert top[0][0] == 4
    assert top[1][0] == 3
    # tolerance bounded below by the contract's DIVISION_GUARD_EPS (1e-8)
    assert abs(top[0][1] - (0.95 / math.sqrt(0.95**2 + 0.05**2))) < 1e-7


def test_ivf_topk_recall_on_separable_clusters(vecs):
    bf = {r.query_id: r.neighbor_id for r in
          similarity.brute_force_topk(vecs, k=1).collect()}
    ivf = {r.query_id: r.neighbor_id for r in
           similarity.ivf_topk(vecs, k=1, n_centroids=2).collect()}
    for q in (0, 1, 2, 3, 4):
        assert ivf[q] == bf[q]


def test_ivf_topk_sharded_exactly_matches_unsharded(spark):
    # 60 vectors in 2 separable clusters; cap=7 forces multi-sub-sharding.
    # The replicated-neighbor sub-shard plan must return EXACTLY the
    # unsharded result (same ids, cos, ranks), and every query exactly once.
    import math

    rows = [(i, [math.cos(0.01 * i), math.sin(0.01 * i), 0.0]) for i in range(30)]
    rows += [(100 + i, [0.0, math.cos(0.01 * i), math.sin(0.01 * i)]) for i in range(30)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plain = sorted(
        map(tuple, similarity.ivf_topk(vecs, k=3, n_centroids=2).collect())
    )
    sharded = sorted(
        map(tuple, similarity.ivf_topk(
            vecs, k=3, n_centroids=2, max_cluster_rows=7).collect())
    )
    assert sharded == plain
    # every query exactly once per rank — no duplicated or dropped queries
    # from the replication (plain is the ground truth for the counts)
    assert len(sharded) == len(plain) and len(sharded) > 100


def test_text_functions(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox, and the lazy dog!"),
         (2, "el gato y la casa es de un perro que es grande"),
         (3, "zzz qqq xxx")],
        "id long, text string",
    )
    out = {r.id: r for r in df.select(
        "id",
        tx.token_count_ws("text").alias("tc"),
        tx.token_count_bpe_ish("text").alias("tb"),
        tx.lang_id("text").alias("lang"),
        tx.quality_score("text").alias("q"),
        tx.fingerprint("text").alias("fp"),
    ).collect()}
    assert out[1].tc == 8
    assert out[1].tb == 10  # 8 words + comma + bang
    assert out[1].lang == "en"
    assert out[2].lang == "es"
    assert out[3].lang == "und"
    assert 0.0 <= out[3].q < out[1].q <= 1.0
    # fingerprint is whitespace/case-insensitive
    df2 = spark.createDataFrame([(1, "  THE quick   brown fox, and the lazy dog! ")],
                                "id long, text string")
    fp2 = df2.select(tx.fingerprint("text").alias("fp")).collect()[0].fp
    assert fp2 == out[1].fp


def test_hyperplane_near_dup(spark, vecs):
    from feature_extractor_mbo_lob_spark.operators import similarity as sim

    out = sim.hyperplane_near_dup(vecs, threshold=0.9, n_planes=4, dim=3)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    # identical vectors always share every sign bucket
    assert (0, 2) in pairs
    # deterministic: same result on a repartitioned input
    again = sim.hyperplane_near_dup(vecs.repartition(5), threshold=0.9, n_planes=4, dim=3)
    assert {(r.id_a, r.id_b) for r in again.collect()} == pairs


def test_kmeans_lloyd_partition_invariant(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    # 3 well-separated blobs in 8-d
    centers = np.eye(3, 8) * 10.0
    rows = []
    for i in range(90):
        c = i % 3
        rows.append((i, (centers[c] + rng.randn(8) * 0.1).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a, _ = similarity.kmeans_lloyd(df, k=3, iters=2)
    b, _ = similarity.kmeans_lloyd(df.repartition(7), k=3, iters=2)
    am = {r.vec_id: r.centroid_id for r in a.collect()}
    bm = {r.vec_id: r.centroid_id for r in b.collect()}
    assert am == bm                      # deterministic under repartition
    # blobs must be separated: same true blob -> same cluster
    for i in range(90):
        assert am[i] == am[i % 3], i


def test_kmeans_lloyd_matches_naive_reference(spark):
    """Exact cross-check vs a naive numpy Lloyd with the same deterministic
    init, cosine assignment, (cos desc, centroid_id) tie-break, and
    per-dim mean update."""
    import numpy as np

    rng = np.random.RandomState(11)
    X = rng.randn(60, 6)
    rows = [(i, X[i].tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got, _ = similarity.kmeans_lloyd(df, k=3, iters=2)
    got = {r.vec_id: r.centroid_id for r in got.collect()}

    eps = 1e-8

    def assign(C):
        out = np.empty(len(X), dtype=int)
        for i, v in enumerate(X):
            cos = np.array([
                v @ c / (np.sqrt(v @ v) * np.sqrt(c @ c) + eps) for c in C
            ])
            # max cos, tie-break by smaller centroid index
            out[i] = int(np.argmax(cos))
        return out

    C = X[:3].copy()  # first-k-by-id init
    for _ in range(2):
        a = assign(C)
        for c in range(3):
            if (a == c).any():
                C[c] = X[a == c].mean(axis=0)
    final = assign(C)
    want = {i: int(final[i]) + 1 for i in range(60)}  # centroid_id is 1-based
    assert got == want


def test_dedup_lines(spark):
    from feature_extractor_mbo_lob_spark.operators.dedup import dedup_lines

    rows = [
        ("d1", "alpha beta\nshared line one\ngamma delta"),
        ("d2", "shared line one\nunique to d2\nSHARED LINE ONE"),  # case-insensitive match
        ("d3", "totally unique\nalso unique"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}

    # 'shared line one' appears in d1 and d2 (twice in d2, case-folded) -> dropped everywhere
    assert out["d1"]["n_lines"] == 3 and out["d1"]["dropped_lines"] == 1
    assert out["d1"]["text_kept"] == "alpha beta\ngamma delta"
    assert out["d2"]["n_lines"] == 3 and out["d2"]["dropped_lines"] == 2
    assert out["d2"]["text_kept"] == "unique to d2"
    # untouched doc survives byte-identical
    assert out["d3"]["dropped_lines"] == 0
    assert out["d3"]["text_kept"] == rows[2][1]


def test_dedup_lines_doc_freq_threshold(spark):
    from feature_extractor_mbo_lob_spark.operators.dedup import dedup_lines

    rows = [("a", "x\ny"), ("b", "x\nz"), ("c", "x\nw")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # df=3 for 'x': survives at max_doc_freq=3, dropped at 2
    keep = {r["doc_id"]: r["dropped_lines"] for r in dedup_lines(df, max_doc_freq=3).collect()}
    drop = {r["doc_id"]: r["dropped_lines"] for r in dedup_lines(df, max_doc_freq=2).collect()}
    assert keep == {"a": 0, "b": 0, "c": 0}
    assert drop == {"a": 1, "b": 1, "c": 1}


def test_edit_distance_verify(spark):
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark.operators.dedup import edit_distance_verify

    docs = spark.createDataFrame(
        [("a", "the quick brown fox jumps"),
         ("b", "the quick brown fox jumped"),     # 2 edits from a
         ("c", "completely different text here")],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([("a", "b"), ("a", "c")], ["id_a", "id_b"])
    got = {(r.id_a, r.id_b): r for r in edit_distance_verify(pairs, docs).collect()}
    assert got[("a", "b")].edit_dist == 2
    assert got[("a", "b")].verified == 1        # 2/26 well under 0.2
    assert got[("a", "c")].verified == 0


def test_novelty_scores(spark):
    from feature_extractor_mbo_lob_spark.operators.dedup import novelty_scores

    docs = spark.createDataFrame(
        [("a", "one two three four"),          # all novel (first doc)
         ("b", "one two three four"),          # exact repeat: zero novel
         ("c", "one two three five")],         # shares "one two three"
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.n_shingles, r.n_novel) for r in novelty_scores(docs).collect()}
    assert got["a"] == (2, 2)                  # shingles: "one two three", "two three four"
    assert got["b"] == (2, 0)
    assert got["c"] == (2, 1)                  # "two three five" is new


class TestWinnowing:
    def test_shared_run_guarantee_and_locality(self, spark):
        """Winnowing guarantee: docs sharing a run of >= w+k-1 = 6 words
        share at least one fingerprint; fully distinct docs don't."""
        from feature_extractor_mbo_lob_spark.operators.dedup import winnow_fingerprints

        shared = "alpha beta gamma delta epsilon zeta"
        rows = [
            (1, f"intro words here {shared} tail one"),
            (2, f"{shared} completely different ending text"),
            (3, "nothing in common with the others at all whatsoever"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        fps = winnow_fingerprints(df, k=3, w=4).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r.id, set()).add(r.fp)
        assert by_doc[1] & by_doc[2], "shared 6-word run must share a fingerprint"
        assert not (by_doc[1] & by_doc[3])
        assert not (by_doc[2] & by_doc[3])

    def test_short_and_empty_docs_have_fingerprints(self, spark):
        from feature_extractor_mbo_lob_spark.operators.dedup import winnow_fingerprints

        rows = [(1, "one two"), (2, "a b c d"), (3, "x")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = winnow_fingerprints(df, k=3, w=4).groupBy("id").count().collect()
        got = {r.id: r["count"] for r in out}
        assert set(got) == {1, 2, 3}
        assert all(v >= 1 for v in got.values())


class TestQuantizedANN:
    def test_int8_topk_recall_vs_exact(self, spark):
        """Brute-force top-3 over int8-quantized vectors recovers >= 0.85
        of the exact float neighbors (the storage-for-recall trade the
        quantizer exists for), and dequantized values stay within one
        scale step of the originals."""
        import numpy as np

        from feature_extractor_mbo_lob_spark.operators import similarity

        emb = (
            spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
            .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        )
        exact = {
            (r.query_id, r.rank): r.neighbor_id
            for r in similarity.brute_force_topk(emb, k=3).collect()
        }

        q = similarity.quantize_embeddings_int8(emb)
        rows = q.select("vec_id", "embedding", "embedding_q8", "embedding_q8_scale").collect()
        # dequantization error bound: |x - q*scale/127| <= scale/254 + eps
        for r in rows[:20]:
            x = np.array(r.embedding)
            deq = np.array(r.embedding_q8) * r.embedding_q8_scale / 127.0
            assert np.max(np.abs(x - deq)) <= r.embedding_q8_scale / 254.0 + 1e-9

        qemb = q.select(
            "vec_id",
            F.transform(
                "embedding_q8", lambda v: v.cast("double")
            ).alias("embedding"),
        )
        approx = {
            (r.query_id, r.rank): r.neighbor_id
            for r in similarity.brute_force_topk(qemb, k=3).collect()
        }
        keys = set(exact)
        hits = sum(
            1 for k in keys
            if approx.get(k) == exact[k]
            or approx.get(k) in {exact.get((k[0], j)) for j in (1, 2, 3)}
        )
        assert hits / len(keys) >= 0.85, hits / len(keys)


def test_cross_source_overlap(spark):
    from feature_extractor_mbo_lob_spark.operators import dedup

    docs = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "c")],
        "doc_id long, source string",
    )
    pairs = spark.createDataFrame(
        [(0, 1, 4), (0, 2, 2), (1, 2, 1), (2, 3, 3)],
        "id_a long, id_b long, n_bands long",
    )
    out = {(r.src_x, r.src_y): r for r in dedup.cross_source_overlap(docs, pairs).collect()}
    assert out[("a", "a")].n_pairs == 1 and out[("a", "a")].band_mass == 4
    ab = out[("a", "b")]
    assert ab.n_pairs == 2 and ab.n_strong == 1 and ab.band_mass == 3
    assert out[("b", "c")].n_pairs == 1
    # orientation-normalized: no ('b','a') cell
    assert ("b", "a") not in out

    # pair frames without n_bands degrade gracefully (every pair 'strong')
    p2 = pairs.drop("n_bands")
    out2 = {(r.src_x, r.src_y): r for r in dedup.cross_source_overlap(docs, p2).collect()}
    assert out2[("a", "b")].n_pairs == 2 and out2[("a", "b")].n_strong == 2


def test_label_separability_matches_numpy(spark):
    import numpy as np

    from feature_extractor_mbo_lob_spark.operators.similarity import label_separability

    rng = np.random.RandomState(7)
    centers = {0: np.array([1.0, 0.0, 0.0]), 1: np.array([-1.0, 0.5, 0.0])}
    rows, vecs = [], {0: [], 1: []}
    vid = 0
    for lbl, c in centers.items():
        for _ in range(40):
            v = c + rng.normal(0, 0.05, 3)
            vecs[lbl].append(v)
            rows.append((vid, [float(x) for x in v], lbl))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label long")
    out = label_separability(emb).collect()
    assert len(out) == 1
    r = out[0]
    # numpy reference on the quantized lanes (the operator's declared space)
    q = {l: np.floor(np.array(v) * 1e6 + 0.5) for l, v in vecs.items()}
    cent = {l: a.mean(axis=0) for l, a in q.items()}
    msd = {l: ((a - cent[l]) ** 2).sum(axis=1).mean() / 1e12 for l, a in q.items()}
    dist2 = ((cent[0] - cent[1]) ** 2).sum() / 1e12
    assert abs(r.dist2 - dist2) < 1e-6
    assert abs(r.msd_a - msd[0]) < 1e-6 and abs(r.msd_b - msd[1]) < 1e-6
    # well-separated clusters: fisher ratio must be large
    assert r.fisher > 50


def test_pq_codes_shape_and_determinism(spark):
    """Every vector gets one code per subspace in [1, k]; encoding is
    deterministic across runs; equal vectors share codes."""
    import pyspark.sql.functions as F
    from feature_extractor_mbo_lob_spark.operators.similarity import pq_codes

    rows = [(i, [float((i * 7 + d * 3) % 5 - 2) for d in range(8)]) for i in range(20)]
    rows.append((100, rows[0][1]))  # duplicate vector, different id
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in pq_codes(df, m=2, k=3, iters=1, dim=8).collect()}
    assert len(out) == 21
    for r in out.values():
        assert 1 <= r.code_0 <= 3 and 1 <= r.code_1 <= 3
    assert (out[100].code_0, out[100].code_1) == (out[0].code_0, out[0].code_1)
    out2 = {r.vec_id: r for r in pq_codes(df, m=2, k=3, iters=1, dim=8).collect()}
    assert all((out[i].code_0, out[i].code_1) == (out2[i].code_0, out2[i].code_1)
               for i in out)


def test_pq_codes_separates_obvious_clusters(spark):
    """Two well-separated directions per subspace land in different codes."""
    from feature_extractor_mbo_lob_spark.operators.similarity import pq_codes

    a = [1.0, 0.0, 1.0, 0.0]
    b = [0.0, 1.0, 0.0, 1.0]
    # interleave ids so the first-k-by-id init sees one seed per cluster
    rows = [(2 * i, a + a) for i in range(5)] + [(2 * i + 1, b + b) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in pq_codes(df, m=2, k=2, iters=1, dim=8).collect()}
    assert out[0].code_0 != out[1].code_0
    assert out[0].code_1 != out[1].code_1
    assert all(out[2 * i].code_0 == out[0].code_0 for i in range(5))
    assert all(out[2 * i + 1].code_0 == out[1].code_0 for i in range(5))


def test_sorted_neighborhood_pairs(spark):
    from feature_extractor_mbo_lob_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [
        (0, "alpha doc one"),
        (1, "alpha doc one"),        # exact dup of 0 (adjacent after sort)
        (2, "alpha doc two"),
        (3, "zzz unrelated"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): (r.rank_gap, r.same_text)
           for r in sorted_neighborhood_pairs(df, window=2).collect()}
    # sort order: 0, 1, 2, 3 -> gaps 1 and 2 only
    assert out[(0, 1)] == (1, True)
    assert out[(1, 2)] == (1, False)
    assert out[(0, 2)] == (2, False)
    assert (0, 3) not in out                   # gap 3 > window
    assert len(out) == 5


def test_code_features_routes_code_vs_prose(spark):
    from feature_extractor_mbo_lob_spark.functions.text import code_features

    code = (
        "def add(a, b):\n"
        "    return a + b\n"
        "\n"
        "class Foo:\n"
        "    def run(self):\n"
        "        x = [1, 2];\n"
        "        return x\n"
    )
    prose = ("The quick brown fox jumps over the lazy dog. "
             "It was a bright cold day in April.")
    df = spark.createDataFrame(
        [(1, code), (2, prose), (3, None)], "doc_id long, text string")
    out = {r.doc_id: r for r in code_features(df).collect()}

    c = out[1]
    # trailing \n splits into 8 lines; 4 are 4-space indented; one ends ';'
    assert c.n_lines == 8 and c.indented_lines == 4 and c.punct_end_lines == 1
    # def x2, return x2, class x1 = 5 keyword hits
    assert c.kw_hits == 5
    assert c.is_code

    p = out[2]
    assert p.n_lines == 1 and p.indented_lines == 0 and p.kw_hits == 0
    assert not p.is_code
    # null text -> one empty line, zero everything, score 0
    z = out[3]
    assert (z.n_lines, z.kw_hits, z.code_score_ppm, z.is_code) == (1, 0, 0, False)


def test_lexicon_hits_word_boundaries(spark):
    from feature_extractor_mbo_lob_spark.functions.text import lexicon_hits

    docs = [
        (1, "What the hell, this damn thing will kill us all"),
        (2, "hello shell unkillable"),      # substrings must NOT hit
        (3, None),
        (4, "Kill KILL kill!"),             # case-insensitive, multiplicity
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in lexicon_hits(df).collect()}

    r1 = out[1]
    assert r1.profanity_hits == 2 and r1.violence_hits == 1
    assert r1.any_hits == 3 and r1.flagged
    assert r1.n_words == 10
    assert r1.hit_rate_ppm == 3 * 1_000_000 // 10

    r2 = out[2]
    assert r2.any_hits == 0 and not r2.flagged

    r3 = out[3]
    assert (r3.n_words, r3.any_hits, r3.hit_rate_ppm, r3.flagged) == (0, 0, 0, False)

    r4 = out[4]
    assert r4.violence_hits == 3 and r4.flagged


def test_lexicon_hits_explicit_empty_lexicon(spark):
    """ADVICE r3: an explicitly passed empty lexicon scores nothing (it must
    NOT fall back to the built-in lists, and must not crash)."""
    from feature_extractor_mbo_lob_spark.functions.text import lexicon_hits

    df = spark.createDataFrame(
        [(1, "damn this kill list"), (2, "clean text")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lexicon_hits(df, lexicon={}).collect()}
    assert all(r.any_hits == 0 and not r.flagged for r in out.values())
    assert out[1].n_words == 4
    # None still means the default lexicon
    dflt = {r.doc_id: r for r in lexicon_hits(df, lexicon=None).collect()}
    assert dflt[1].any_hits > 0


def test_collect_corpus_fail_fast_cap(vecs):
    """VERDICT r3 #1: the GEMM broadcast paths fail fast past the broadcast
    budget instead of silently collecting the corpus onto the driver."""
    import pytest

    from feature_extractor_mbo_lob_spark.operators.similarity import (
        _collect_corpus,
    )

    with pytest.raises(ValueError, match="max_broadcast_rows"):
        _collect_corpus(vecs, "vec_id", "embedding", max_broadcast_rows=3)
    ids, M, norms = _collect_corpus(
        vecs, "vec_id", "embedding", max_broadcast_rows=5
    )
    assert len(ids) == 5 and M.shape == (5, 3)

    with pytest.raises(ValueError, match="ivf_topk"):
        similarity.brute_force_topk(
            vecs, k=1, max_broadcast_rows=3, on_oversize="raise"
        )
    with pytest.raises(ValueError, match="hyperplane_near_dup"):
        similarity.near_dup_pairs(
            vecs, threshold=0.3, max_broadcast_rows=3, on_oversize="raise"
        )


def test_brute_force_topk_auto_routes_to_ivf_past_cap(vecs):
    """Oversized corpus: the entrypoint auto-routes to the IVF bucketed
    path (cluster-capped) rather than broadcasting — results match the
    direct ivf_topk call with the same routing parameters."""
    routed = similarity.brute_force_topk(vecs, k=1, max_broadcast_rows=3)
    direct = similarity.ivf_topk(
        vecs, k=1, n_centroids=16, max_cluster_rows=3
    )
    assert routed.columns == ["query_id", "neighbor_id", "cos", "rank"]
    key = lambda r: (r.query_id, r.rank)
    assert sorted(map(tuple, routed.collect()), key=lambda t: t[:2]) == \
        sorted(map(tuple, direct.collect()), key=lambda t: t[:2])
    # a query+corpus form cannot re-route (ivf_topk is self-join only)
    import pytest

    with pytest.raises(ValueError, match="max_broadcast_rows"):
        similarity.brute_force_topk(
            vecs, k=1, query=vecs.limit(2), max_broadcast_rows=3
        ).collect()


def test_near_dup_pairs_auto_routes_to_lsh_past_cap(vecs):
    routed = similarity.near_dup_pairs(vecs, threshold=0.3, max_broadcast_rows=3)
    direct = similarity.hyperplane_near_dup(vecs, threshold=0.3)
    assert routed.columns == ["id_a", "id_b", "cos"]
    assert sorted(map(tuple, routed.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_minhash_lsh_capped_skew_10k_identical_docs(spark):
    """VERDICT r3 #2: 10K identical documents put all 10K in one band
    bucket — the naive join would build ~5e7 pairs in one task. The capped
    form emits the O(m) star instead and still finishes fast."""
    import time

    n_dup = 10_000
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(n_dup)]
    rows += [(100_000 + i, f"unique document number {i} about topic {i * 7}")
             for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    t0 = time.time()
    out = dedup.minhash_lsh_pairs(df, k=3, num_hashes=16, bands=4,
                                  max_band_size=64)
    stars = out.filter(F.col("id_a") == 0)
    n_star = stars.count()
    wall = time.time() - t0
    # the dup group collapses to exactly n-1 star edges from the min id
    assert n_star == n_dup - 1
    assert out.filter((F.col("id_a") < 100_000) & (F.col("id_b") < 100_000)
                      & (F.col("id_a") != 0)).count() == 0
    assert wall < 120, f"hot-band skew straggler: {wall:.1f}s"


def test_minhash_lsh_capped_preserves_clusters(docs):
    """Star collapse + rep-only banding preserve connected components: any
    doc sharing a band with a collapsed member shares it with the rep too."""
    uncapped = dedup.minhash_lsh_pairs(docs, k=3, num_hashes=16, bands=4)
    capped = dedup.minhash_lsh_pairs(docs, k=3, num_hashes=16, bands=4,
                                     max_band_size=1_000_000)
    cu = {r.id: r.cluster_id
          for r in dedup.connected_components(uncapped).collect()}
    cc = {r.id: r.cluster_id
          for r in dedup.connected_components(capped).collect()}
    assert cu == cc


# --- embedding outlier scores ----------------------------------------------------------


def test_embedding_outliers_matches_naive_and_flags_outlier(spark):
    import numpy as np
    from feature_extractor_mbo_lob_spark.operators.similarity import embedding_outliers

    rng = np.random.RandomState(7)
    vecs = rng.normal(0.0, 0.05, size=(30, 4))
    vecs[29] = [2.0, -2.0, 2.0, -2.0]  # gross outlier
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.id: r for r in embedding_outliers(df).collect()}
    assert all(r.n_lanes == 4 for r in out.values())

    # naive float diagonal Mahalanobis on the SAME micro-quantized lanes
    q = np.floor(vecs * 1e6 + 0.5)
    n = q.shape[0]
    s = q.sum(axis=0)
    s2 = (q * q).sum(axis=0)
    naive = (((n * q - s) ** 2) / (n * s2 - s * s)).sum(axis=1)
    for i in range(30):
        assert abs(out[i].score_fp / 1e6 - naive[i]) < 5e-6
    assert out[29].score_fp == max(r.score_fp for r in out.values())
    assert out[29].score_fp > 10 * sorted(r.score_fp for r in out.values())[-2]


def _naive_cka2(vecs, x_scale=1000):
    # exact-integer replica of linear_cka_quantization's spec
    import math

    n, d = len(vecs), len(vecs[0])
    X = [[math.floor(x * x_scale + 0.5) for x in v] for v in vecs]
    Y = []
    for v in vecs:
        mx = max(abs(x) for x in v)
        Y.append([
            max(-127, min(127, math.floor(x * 127.0 / mx + 0.5))) if mx > 0 else 0
            for x in v
        ])
    def moments(A, B):
        s_a = [sum(r[j] for r in A) for j in range(d)]
        s_b = [sum(r[j] for r in B) for j in range(d)]
        tot = 0
        for j in range(d):
            for k in range(d):
                m = n * sum(r[j] * q[k] for r, q in zip(A, B)) - s_a[j] * s_b[k]
                tot += m * m
        return tot
    num, dx, dy = moments(X, Y), moments(X, X), moments(Y, Y)
    return (float(num) * float(num)) / (float(dx) * float(dy))


def test_cka_quantization_matches_naive(spark):
    vecs = [
        [0.5, -1.2, 0.3], [1.0, 0.1, -0.4], [-0.7, 0.9, 0.2],
        [0.2, 0.2, 1.5], [-1.1, -0.3, 0.8],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    r = similarity.linear_cka_quantization(df).collect()[0]
    assert r.n_vecs == 5
    assert abs(r.cka2_raw - _naive_cka2(vecs)) < 1e-12
    # int8 quantization preserves most geometry (coarse at d=3, still high)
    assert r.cka2_raw > 0.9


def test_cka_degenerate_returns_zero(spark):
    # all-zero vectors: dx = dy = 0 -> guarded 0.0 release
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    r = similarity.linear_cka_quantization(df).collect()[0]
    assert r.cka2_raw == 0.0


def test_knn_hubness_star_geometry(spark):
    # a hub at the center plus orthogonal-ish satellites: every satellite's
    # 1-NN is the hub -> in-degree [n-1, smallest...], strongly right-skewed
    import math

    vecs = {"hub": [1.0, 1.0, 1.0, 1.0]}
    for i in range(4):
        v = [0.1] * 4
        v[i] = 2.0
        vecs[f"s{i}"] = v
    df = spark.createDataFrame(
        [(k, v) for k, v in sorted(vecs.items())],
        "vec_id string, embedding array<double>",
    )
    r = similarity.knn_hubness(df, k=1).collect()[0]
    assert r.n_vecs == 5 and r.k == 1
    # hub is everyone's nearest neighbor
    assert r.max_indeg == 4
    assert r.g1_sq_signed_raw > 0  # right-skew
    # moments identity: S1 = n*k edges, here with orphans = satellites never chosen
    assert r.n_orphans == 4 - (5 - 1 - 4 + 1)  # 4 satellites, 1 gets hub's pick


def test_knn_hubness_symmetric_is_balanced(spark):
    # two tight mutual pairs: every point has in-degree exactly 1 at k=1 ->
    # zero variance -> guarded 0.0 release, no orphans
    df = spark.createDataFrame(
        [
            ("a", [1.0, 0.0]), ("b", [0.99, 0.01]),
            ("c", [0.0, 1.0]), ("d", [0.01, 0.99]),
        ],
        "vec_id string, embedding array<double>",
    )
    r = similarity.knn_hubness(df, k=1).collect()[0]
    assert r.max_indeg == 1 and r.n_orphans == 0
    assert r.g1_sq_signed_raw == 0.0


def test_fisher_separability_separable_vs_collapsed(spark):
    from feature_extractor_mbo_lob_spark.operators.similarity import (
        fisher_separability,
    )

    # two well-separated clusters along lane 0
    rows = [(i, [10.0 + (i % 3) * 0.01, 1.0], 0) for i in range(6)] + [
        (10 + i, [-10.0 - (i % 3) * 0.01, 1.0], 1) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    r = fisher_separability(df).collect()[0]
    assert (r.n, r.d, r.n_classes) == (12, 2, 2)
    assert r.fisher_ratio > 100  # between >> within
    # identical label distribution in both classes -> J ~ 0
    rows2 = [(i, [float(i % 5), 2.0], i % 2) for i in range(20)]
    df2 = spark.createDataFrame(rows2, "vec_id long, embedding array<float>, label int")
    r2 = fisher_separability(df2).collect()[0]
    assert abs(r2.fisher_ratio) < 0.2


def test_fisher_separability_exact_integer_parity(spark):
    from feature_extractor_mbo_lob_spark.operators.similarity import (
        fisher_separability,
    )
    import math as _m

    rows = [(1, [0.25, -1.5], 0), (2, [0.75, 2.25], 0),
            (3, [1.5, 0.5], 1), (4, [-0.5, 1.0], 1), (5, [2.0, -0.25], 1)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    r = fisher_separability(df).collect()[0]
    # python replica of the exact spec
    qs = {(i, j): _m.floor(v * 1e6 + 0.5)
          for i, (vid, vec, lab) in enumerate(rows) for j, v in enumerate(vec)}
    labs = [lab for _, _, lab in rows]
    B = W = 0
    n = len(rows)
    for j in range(2):
        cls = {}
        for i, lab in enumerate(labs):
            cls.setdefault(lab, []).append(qs[(i, j)])
        s1g = sum(sum(v) for v in cls.values())
        s2g = sum(x * x for v in cls.values() for x in v)
        # trunc division toward zero; S1^2 >= 0 so python // matches
        tsum = sum((sum(v) * sum(v)) // len(v) for v in cls.values())
        g = (s1g * s1g) // n
        B += tsum - g
        W += s2g - tsum
    assert (r.between_sum, r.within_sum) == (B, W)
    want = _m.floor((B / W) * 1e6 + 0.5) / 1e6 if W > 0 else 0.0
    assert r.fisher_ratio == want


def test_minhash_recall_finds_planted_duplicates(spark):
    from feature_extractor_mbo_lob_spark.operators.dedup import minhash_recall

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " lambda"       # high shingle overlap with base
    rows = [(1, base), (2, near), (3, "one two three four five six seven"),
            (4, "completely different words entirely here now today")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = minhash_recall(docs, k=3, num_hashes=16, bands=4,
                       threshold_pct=60).collect()[0]
    assert r.n_truth >= 1            # (1, 2) is a true pair at 0.6
    assert r.n_hit == r.n_truth      # identical band vectors must collide
    assert r.recall_ppm == 1_000_000


def test_retrieval_metrics_singletons_and_duplicate(spark, tmp_path):
    """9 vectors = 8 orthogonal directions + one duplicate of v1, 8
    deterministic centroids: every query except the duplicate pair
    lands in a singleton cluster (IVF returns nothing -> counted as
    ZERO, not dropped); the pair retrieves each other at truth rank 1.
    Every released number replays from the integer discount table."""
    from feature_extractor_mbo_lob_spark.plans.driver_queries import (
        _NDCG_W, QUERIES,
    )

    dim = 10
    rows = []
    for i in range(8):
        v = [0.0] * dim
        v[i] = 1.0
        rows.append((i + 1, v))
    v = [0.0] * dim
    v[0] = 1.0
    rows.append((9, v))  # duplicate direction of vec 1
    sf = tmp_path / "rm"
    spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .coalesce(1).write.parquet(str(sf / "embeddings.parquet"))
    r = QUERIES["retrieval_metrics"](spark, str(sf)).collect()[0]
    assert r.n_queries == 9
    # the two paired queries: candidate at IVF rank 1 is truth rank 1
    idcg = sum((11 - p) * _NDCG_W[p - 1] for p in range(1, 9))  # t_cnt = 8
    ndcg1 = (10 * _NDCG_W[0] * 1000000) // idcg
    ap1 = (1 * 1 * (2520 // 1) * 1000000) // (2520 * 8)
    assert r.mean_ndcg_ppm == (2 * ndcg1) // 9
    assert r.mean_ap_ppm == (2 * ap1) // 9
    assert r.mean_prec10_ppm == (2 * 100000) // 9


def test_silhouette_separated_clusters(spark, tmp_path):
    """Two tight orthogonal clusters (k=4 degenerates to 2 non-empty):
    every point's runner-up centroid is the other cluster, so the mean
    simplified silhouette of each populated cluster is strongly
    positive; identical-point clusters give s near 1."""
    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    dim = 8
    rows = []
    for i in range(6):  # cluster on axis 0
        v = [0.0] * dim; v[0] = 1.0; v[1] = 0.001 * i
        rows.append((i + 1, v))
    for i in range(6):  # cluster on axis 2
        v = [0.0] * dim; v[2] = 1.0; v[3] = 0.001 * i
        rows.append((100 + i, v))
    sf = tmp_path / "sil"
    spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .coalesce(1).write.parquet(str(sf / "embeddings.parquet"))
    out = QUERIES["silhouette"](spark, str(sf)).collect()
    assert sum(r.n_points for r in out) == 12
    for r in out:
        if r.n_points >= 6:
            assert r.mean_sil_micro > 900000, r
