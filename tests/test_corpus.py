"""Corpus statistics: vocabulary, TF-IDF, domains, hash sampling, Gopher filter."""

import pytest
from pyspark.sql import functions as F

from feature_extractor_mbo_lob_spark.functions import corpus
from feature_extractor_mbo_lob_spark.functions.repetition import gopher_filter


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark spark spark window join"),
        (1, "spark window shuffle shuffle"),
        (2, "join join unique"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_topk(docs):
    out = corpus.vocab_topk(docs, k=3).collect()
    assert [(r.rank, r.word, r.cnt) for r in out] == [
        (1, "spark", 4), (2, "join", 3), (3, "shuffle", 2)
    ]


def test_tfidf_ranking(docs):
    out = corpus.tf_idf_top_terms(docs, k=1).collect()
    top = {r.id: r.word for r in out}
    # doc 0: 'spark' dominates by count; doc 2: 'join' (cnt 2) beats 'unique' (cnt 1)
    assert top[0] == "spark" and top[2] == "join"
    scores = {r.id: r.tfidf for r in out}
    assert all(s > 0 for s in scores.values())


def test_domain_counts(spark):
    rows = [
        (0, "see https://a.example.org/x and https://b.example.net"),
        (1, "again https://a.example.org/y only"),
        (2, "no urls"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.domain: (r.n_docs, r.n_urls) for r in corpus.domain_counts(df).collect()}
    assert out["a.example.org"] == (2, 2)
    assert out["b.example.net"] == (1, 1)
    assert len(out) == 2


def test_hash_sample_deterministic(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sorted(r.doc_id for r in corpus.hash_sample(df, 0.25).collect())
    b = sorted(r.doc_id for r in corpus.hash_sample(df.repartition(7), 0.25).collect())
    assert a == b
    assert 0.18 < len(a) / 2000 < 0.32  # Bernoulli at 25%


def test_gopher_filter_flags(spark):
    good = " ".join(f"w{i}" for i in range(30))          # 30 distinct words
    spammy = "spam spam spam " * 10                       # runs + dup grams
    short = "too short"
    df = spark.createDataFrame(
        [(0, good), (1, spammy.strip()), (2, short)], "doc_id long, text string"
    )
    out = {r.id: r for r in gopher_filter(df).collect()}
    assert out[0].keep == 1 and out[0].flag_run == 0
    assert out[1].keep == 0 and out[1].flag_run == 1 and out[1].flag_dup == 1
    assert out[2].keep == 0 and out[2].flag_words == 1


def test_pack_token_stream(spark):
    # one shard (n_shards=1), budget 10: docs of 4/5/3 tokens at offsets 0/4/9
    rows = [(0, "a b c d"), (1, "e f g h i"), (2, "j k l")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in corpus.pack_token_stream(df, budget=10, n_shards=1).collect()}
    assert (out[0].offset, out[0].bin_start, out[0].bin_end) == (0, 0, 0)
    assert (out[1].offset, out[1].bin_start, out[1].bin_end) == (4, 0, 0)
    # doc 2 starts at 9, ends at 11 -> straddles the bin boundary
    assert (out[2].offset, out[2].bin_start, out[2].bin_end) == (9, 0, 1)


def test_contamination_overlap(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"),     # shares shingles with eval
         (2, "totally different words only here")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox runs")], "doc_id long, text string"
    )
    out = {r.id: r for r in corpus.contamination_overlap(train, ev, k=3, threshold=0.3).collect()}
    # train 1 shingles: 4; shared: 'the quick brown', 'quick brown fox' -> 2/4
    assert out[1].n_shared == 2 and out[1].overlap_frac == pytest.approx(0.5, abs=1e-6)
    assert out[1].contaminated == 1
    assert out[2].n_shared == 0 and out[2].contaminated == 0


def test_stratified_and_source_mix_shapes(spark, docs):
    # stratified sampling + source mix are registry-level compositions; the
    # engine-level pieces they use (hash_sample bucket math, token counts)
    # are covered elsewhere. Here: determinism + mass conservation.
    from feature_extractor_mbo_lob_spark.functions.text import token_count_ws
    from pyspark.sql import functions as F

    d = docs.withColumn("lang", F.lit("en")).withColumn("source", F.lit("s0"))
    cell = d.groupBy("source", "lang").agg(
        F.sum(token_count_ws("text")).alias("n_tokens")
    )
    total = cell.agg(F.sum("n_tokens")).first()[0]
    per_doc = d.select(F.sum(token_count_ws("text"))).first()[0]
    assert total == per_doc  # no tokens lost in the grouping


def test_stratified_hash_sample(spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "zh")
        .otherwise("fr").alias("lang"),
    )
    out = corpus.stratified_hash_sample(df, {"en": 0.1, "zh": 0.5}, default_frac=0.9)
    rates = {r.lang: r.n / 1000 for r in
             out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 0.05 < rates["en"] < 0.16
    assert 0.42 < rates["zh"] < 0.58
    assert 0.84 < rates["fr"] < 0.96
    # deterministic under repartition
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in corpus.stratified_hash_sample(
        df.repartition(7), {"en": 0.1, "zh": 0.5}, default_frac=0.9).collect())
    assert a == b


def test_balance_classes(spark):
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark.functions.corpus import balance_classes

    rows = [(f"id{i}", "major") for i in range(900)] + \
           [(f"m{i}", "minor") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, cls string")
    out = balance_classes(df, "cls", id_col="doc_id")
    got = {r.cls: r.n for r in
           out.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).collect()}
    # minority kept whole (thresh == buckets); majority near the minority size
    assert got["minor"] == 100
    assert 70 <= got["major"] <= 130
    # deterministic: same input -> identical keep set
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in balance_classes(df, "cls", id_col="doc_id").collect())
    assert ids1 == ids2
    # NULL class is a real stratum, not silently dropped
    rows_n = rows + [(f"n{i}", None) for i in range(50)]
    dfn = spark.createDataFrame(rows_n, "doc_id string, cls string")
    outn = balance_classes(dfn, "cls", id_col="doc_id")
    gotn = {r.cls: r.n for r in
            outn.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert None in gotn and gotn[None] == 50  # minority now: kept whole


def test_top_k_per_group(spark):
    from feature_extractor_mbo_lob_spark.functions.corpus import top_k_per_group

    rows = [("g1", "a")] * 5 + [("g1", "b")] * 3 + [("g1", "c")] * 3 + \
           [("g1", "d")] + [("g2", None)] * 4 + [("g2", "z")]
    df = spark.createDataFrame(rows, "g string, item string")
    got = {r.g: (r.top_items, r.top_counts)
           for r in top_k_per_group(df, "g", "item", k=2).collect()}
    # tie between b and c (3 each) -> item desc picks c
    assert got["g1"] == (["a", "c"], [5, 3])
    # nulls never count as items
    assert got["g2"] == (["z"], [1])


def test_chunk_documents(spark):
    from feature_extractor_mbo_lob_spark.functions.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([("d", text), ("tiny", "a b")], ["doc_id", "text"])
    got = {(r.id, r.chunk_id): (r.chunk_text, r.n_words)
           for r in chunk_documents(df, max_words=4, stride=3).collect()}
    # 10 words, window 4, stride 3 -> ceil((10-4)/3)+1 = 3 chunks
    assert got[("d", 0)] == ("w0 w1 w2 w3", 4)
    assert got[("d", 1)] == ("w3 w4 w5 w6", 4)
    assert got[("d", 2)] == ("w6 w7 w8 w9", 4)
    assert ("d", 3) not in got
    # short doc: one partial chunk
    assert got[("tiny", 0)] == ("a b", 2)


def test_render_conversations(spark, docs):
    import datetime as dt

    from feature_extractor_mbo_lob_spark.config import PipelineConfig
    from feature_extractor_mbo_lob_spark.export import render_conversations
    from feature_extractor_mbo_lob_spark.sources import TRANSCRIPT_SCHEMA

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 1, "assistant", "hi", None, t0 + dt.timedelta(seconds=1)),
        ("c1", 0, "user", "hello", None, t0),      # out of order on purpose
    ]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    r = render_conversations(df, PipelineConfig()).collect()[0]
    assert r.rendered == "user: hello\nassistant: hi"
    assert r.n_turns == 2 and r.n_chars == len(r.rendered)


def test_cohort_retention_matrix(spark):
    import datetime as dt

    def t(day):
        return dt.datetime(1970, 1, 1) + dt.timedelta(days=day)

    rows = [
        # user 1: first day 0 (cohort week 0), active weeks 0 and 2
        (1, t(0)), (1, t(1)), (1, t(15)),
        # user 2: first day 8 (cohort week 1), active weeks 1 only
        (2, t(8)), (2, t(9)),
        # user 3: first day 3 (cohort week 0), active weeks 0 and 1
        (3, t(3)), (3, t(8)),
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts: timestamp")
    got = {
        (str(r.cohort), r.offset): r.active_users
        for r in corpus.cohort_retention(df).collect()
    }
    # user 3's offsets are relative to the week-0 cohort START (day 0):
    # day 3 -> offset 0, day 8 -> offset 1
    assert got == {
        ("1970-01-01", 0): 2,   # users 1 and 3
        ("1970-01-01", 1): 1,   # user 3
        ("1970-01-01", 2): 1,   # user 1
        ("1970-01-08", 0): 1,   # user 2 (days 8 and 9 dedup to one week)
    }


def test_cdc_chunking_edit_locality(spark):
    """Content-defined boundaries: inserting a word near the start changes
    only the chunk containing the edit — later chunk digests are stable.
    A fixed-size chunker would shift every subsequent chunk."""
    from feature_extractor_mbo_lob_spark.functions.text import cdc_chunk_documents

    base_words = [f"w{i}" for i in range(120)]
    edited = base_words[:3] + ["INSERTED"] + base_words[3:]
    df = spark.createDataFrame(
        [(1, " ".join(base_words)), (2, " ".join(edited))], ["doc_id", "text"]
    )
    out = cdc_chunk_documents(df, divisor=8).collect()
    d1 = {r.chunk_md5 for r in out if r.id == 1}
    d2 = {r.chunk_md5 for r in out if r.id == 2}
    shared = d1 & d2
    # all but the edited chunk's digests survive the insertion
    assert len(shared) >= len(d1) - 2, (len(d1), len(d2), len(shared))
    assert d1 != d2


def test_bm25_matches_naive(spark):
    rows = [
        (0, "spark spark window join merge"),
        (1, "window window window shuffle sort"),
        (2, "join sort agg filter"),        # no query term
        (3, "spark"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["spark", "window"]
    out = {r.id: r for r in corpus.bm25_scores(df, terms, k1=1.2, b=0.75).collect()}

    # naive reference
    import math
    docs = {i: t.split() for i, t in rows}
    N = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / N
    dfreq = {t: sum(1 for w in docs.values() if t in w) for t in terms}
    for i, w in docs.items():
        exp = 0.0
        for t in terms:
            tf = w.count(t)
            idf = math.log(1 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            exp += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(w) / avgdl))
        if all(t not in w for t in terms):
            assert i not in out          # unmatched docs are dropped
        else:
            r = out[i]
            assert abs(r.bm25 - exp) < 1e-9
            assert r.dl == len(w)
            assert r.n_matched == sum(1 for t in terms if t in w)
    # doc 3 (short, contains rare-ish term) outranks doc 2 absent entirely
    assert out[0].bm25 > out[3].bm25 > 0


def test_pmi_collocations(spark):
    # "new york" always adjacent (high PMI); "the cat"/"the dog" share a
    # frequent left word (lower PMI). min_count prunes singletons.
    rows = []
    for i in range(6):
        rows.append((i, "new york is big and the cat sat"))
    for i in range(6, 12):
        rows.append((i, "the dog ran to new york again"))
    for i in range(12, 18):
        rows.append((i, "the table holds the lamp"))  # 'the' without 'cat'
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus.pmi_collocations(df, min_count=5, k=10).collect()
    by_gram = {r.gram: r for r in out}
    assert "new york" in by_gram
    ny = by_gram["new york"]
    assert ny.c_ab == 12 and ny.c_a == 12 and ny.c_b == 12
    # ranks are 1..n, unique, ordered by count desc then gram
    ranks = [r.rank for r in sorted(out, key=lambda r: r.rank)]
    assert ranks == list(range(1, len(out) + 1))
    # perfectly-coupled pair has higher PMI than 'the cat' (the appears 12x)
    assert ny.pmi > by_gram["the cat"].pmi
    # every surviving gram met min_count
    assert all(r.c_ab >= 5 for r in out)

    import math
    n_uni = sum(len(t.split()) for _, t in rows)
    n_bi = sum(len(t.split()) - 1 for _, t in rows)
    exp = math.log((12 / n_bi) / ((12 / n_uni) * (12 / n_uni)))
    assert abs(ny.pmi - exp) < 1e-9


def test_diversified_top_k_cap(spark):
    rows = [(i, "s%d" % (i % 2), 100 - i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score long")
    out = corpus.diversified_top_k(
        df, [("score", "desc"), ("doc_id", "asc")], k=5, per_group_cap=2,
        group_col="source",
    ).collect()
    assert len(out) == 5 - 1  # 2 sources x cap 2 = only 4 rows survive
    per_src = {}
    for r in out:
        per_src[r.source] = per_src.get(r.source, 0) + 1
    assert all(v <= 2 for v in per_src.values())
    # global order respected: best scores first
    ranked = sorted(out, key=lambda r: r.rank)
    assert [r.doc_id for r in ranked] == [0, 1, 2, 3]


def test_curriculum_stages_equal_depth(spark):
    rows = [(i, "w " * (i + 1)) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.stage: r for r in corpus.curriculum_stages(df, n_stages=4).collect()}
    assert sorted(out) == [1, 2, 3, 4]
    assert all(out[s].n_docs == 2 for s in out)
    # shortest docs in stage 1, monotone stage boundaries
    assert out[1].tok_max <= out[2].tok_min
    assert out[3].tok_max <= out[4].tok_min
    assert out[1].tok_min == 1 and out[4].tok_max == 8


def test_zipf_fit_recovers_power_law(spark):
    # synthetic corpus with an exact power law: word i appears floor(1000/i)
    # times -> ln cnt ~ -1 * ln rank + ln 1000
    import math
    words = []
    for i in range(1, 51):
        words += [f"w{i:03d}"] * (1000 // i)
    df = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    r = corpus.zipf_fit(df, n_terms=50).collect()[0]
    assert r.n_terms == 50
    assert -1.05 < r.slope < -0.95
    assert abs(r.intercept - math.log(1000)) < 0.1


def test_bpe_merges_greedy_semantics(spark):
    # 'aaab' x10, 'ab' x5: pair counts round 1: (a,a)=20, (a,b)=15, (b,$)=15,
    # tie (a b) vs (b $) broken pair-asc -> round 1 merges (a,a)
    df = spark.createDataFrame(
        [(0, " ".join(["aaab"] * 10 + ["ab"] * 5))], "doc_id long, text string"
    )
    rules = corpus.bpe_merges(df, n_merges=3)
    assert rules[0][1:4] == ("a", "a", "aa")
    assert rules[0][4] == 20   # greedy within 'aaa': one non-overlapping match
    # after merge 1: 'aaab' -> <aa><a><b>, 'ab' -> <a><b>
    # round 2 pairs: (aa,a)=10, (a,b)=15, (b,$)=15 -> tie pair-asc: 'a b'
    assert rules[1][1:4] == ("a", "b", "ab")
    assert rules[1][4] == 15
    # round 3: 'aaab'-><aa><ab>, 'ab'-><ab>: (aa,ab)=10, (ab,$)=15
    assert rules[2][1:4] == ("ab", "$", "ab$")
    assert rules[2][4] == 15


def test_signed_hashed_features_cancellation(spark):
    """Sign structure: a word appearing twice contributes +-2; weight-0
    cells (exact collisions with opposite signs) are dropped."""
    from feature_extractor_mbo_lob_spark.functions.corpus import signed_hashed_features

    df = spark.createDataFrame(
        [(1, "alpha alpha beta"), (2, "")], "doc_id long, text string"
    )
    rows = signed_hashed_features(df, dim=64).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.id, []).append(r)
    w1 = sorted(abs(r.weight) for r in by_doc[1])
    assert w1 == [1, 2]  # beta once, alpha twice (same bucket, same sign)
    assert all(r.weight != 0 for r in rows)
    assert all(0 <= r.idx < 64 for r in rows)


def test_signed_hashed_features_deterministic(spark):
    from feature_extractor_mbo_lob_spark.functions.corpus import signed_hashed_features

    df = spark.createDataFrame([(7, "x y z x")], "doc_id long, text string")
    a = sorted(map(tuple, signed_hashed_features(df).collect()))
    b = sorted(map(tuple, signed_hashed_features(df).collect()))
    assert a == b


def test_chi2_feature_selection_hand_2x2(spark):
    """word 'xx' only in label-A docs: a=2,b=0,c=0,d=2,N=4 ->
    chi2 = 4*(2*2)^2/(2*2*2*2) = 4.0; 'yy' (everywhere) -> degenerate 0."""
    from feature_extractor_mbo_lob_spark.functions.corpus import chi2_feature_selection

    rows = [
        (1, "xx yy", "A"), (2, "xx yy", "A"),
        (3, "yy zz", "B"), (4, "yy zz", "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {(r.word, r.label): r for r in
           chi2_feature_selection(df, vocab_k=10).collect()}
    assert out[("xx", "A")].chi2 == 4.0 and out[("xx", "A")].n_docs_with == 2
    assert out[("xx", "B")].chi2 == 4.0 and out[("xx", "B")].n_docs_with == 0
    assert out[("yy", "A")].chi2 == 0.0  # present in every doc -> c+d = 0
    assert out[("zz", "B")].chi2 == 4.0
    assert len(out) == 6  # 3 words x 2 labels


def test_heaps_fit_recovers_growth_exponent(spark):
    # V(n) = n^0.5 exactly at doc boundaries: doc d contributes
    # (2d+1) tokens of which (1) is new vocab... build directly:
    # after doc d (1-based), n = d^2 tokens and V = d words.
    import math
    rows = []
    for d in range(1, 41):
        # 2d-1 tokens: one brand-new word + 2d-2 repeats of word w000
        toks = [f"w{d:03d}"] + ["w001"] * (2 * d - 2)
        rows.append((d, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = corpus.heaps_fit(df).collect()[0]
    assert r.n_points == 40
    # V = sqrt(n) -> beta 0.5, K = 1 -> ln_k 0 (small bias from early points)
    assert 0.45 < r.beta < 0.55
    assert abs(r.ln_k) < 0.25


def test_tfidf_cosine_pairs_identical_docs(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),
        (2, "epsilon zeta eta theta"),
        (3, "alpha beta unrelated words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r.cosine for r in
           corpus.tfidf_cosine_pairs(df, threshold_pct=30, max_df_frac=1.0).collect()}
    # identical docs -> cosine 1 on their shared informative terms
    assert out[(0, 1)] == pytest.approx(1.0, abs=1e-6)
    # partial overlap present but lower
    assert (0, 3) in out and out[(0, 3)] < out[(0, 1)]
    # disjoint docs never pair (no shared term -> no candidate)
    assert not any(2 in p for p in out)


def test_weighted_sample_size_bias(spark):
    # two weight classes; the heavy class should dominate the sample
    rows = [(i, "x", 1000 if i < 50 else 10) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = corpus.weighted_sample(df, k=50, weight_col="n_chars").collect()
    assert len(out) == 50
    assert [r.rank for r in out] == list(range(1, 51))
    heavy = sum(1 for r in out if r.id < 50)
    # heavy docs are 100x likelier per unit; 50 heavy vs 450 light ->
    # expected heavy share ~= 50*100/(50*100+450) ~ 0.92
    assert heavy >= 30
    # deterministic: second run identical
    again = corpus.weighted_sample(df, k=50, weight_col="n_chars").collect()
    assert [r.id for r in again] == [r.id for r in out]


def test_perplexity_prune_middle_band(spark):
    # 8 docs: two boilerplate dups (common words, high logprob), one
    # gibberish (all-unique rare words, low logprob), rest mid-range
    rows = [
        (0, "the the the the the the"),
        (1, "the the the the the the"),
        (2, "qzx wvu jkl mno pqr stu"),
        (3, "the quick brown fox jumps"),
        (4, "the lazy dog sleeps well"),
        (5, "quick brown dog runs far"),
        (6, "fox jumps over lazy dog"),
        (7, "the quick dog jumps well"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in corpus.perplexity_prune(df).collect()}
    assert len(out) == 8
    # n=8, lo=1/4, hi=3/4 -> keep ranks 3..6 (4 docs)
    assert sum(r.kept for r in out.values()) == 4
    # ranks are a permutation of 1..8
    assert sorted(r.rnk for r in out.values()) == list(range(1, 9))
    # the gibberish doc has the lowest score (rank 1) and is pruned
    assert out[2].rnk == 1 and out[2].kept == 0
    # the boilerplate dups have the two highest scores and are pruned
    assert {out[0].rnk, out[1].rnk} == {7, 8}
    assert out[0].kept == 0 and out[1].kept == 0
    # mid-range docs are kept
    assert out[3].kept == 1 or out[3].rnk in (1, 2, 7, 8) is False
    kept_ids = {i for i, r in out.items() if r.kept}
    assert kept_ids <= {3, 4, 5, 6, 7} and len(kept_ids) == 4


def test_temperature_mix_isqrt_rebalance(spark):
    import math

    from feature_extractor_mbo_lob_spark.functions.corpus import temperature_mix

    # big: 10000 one-token docs; small: 100 one-token docs
    rows = [("big", "x")] * 200 + [("small", "x")] * 50
    # give 'big' longer docs so token mass differs from doc count
    rows = [("big", "a b c d e")] * 200 + [("small", "a b")] * 50
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r.source: r for r in temperature_mix(df).collect()}

    tb, ts = 200 * 5, 50 * 2
    wb, ws = math.isqrt(tb), math.isqrt(ts)
    assert out["big"].tokens == tb and out["small"].tokens == ts
    assert out["big"].w == wb and out["small"].w == ws
    assert out["big"].mix_ppm == wb * 1_000_000 // (wb + ws)
    assert out["small"].mix_ppm == ws * 1_000_000 // (wb + ws)
    # temperature smoothing boosts the tail and damps the head
    assert out["small"].boost_ppm > 1_000_000 > out["big"].boost_ppm


def test_priority_sample_matches_reference(spark):
    import hashlib

    from feature_extractor_mbo_lob_spark.functions.corpus import priority_sample

    rows = [(i, "s%d" % (i % 2), 10 + (i * 7) % 90) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = priority_sample(
        df, k=5, weight_col="n_chars", id_col="doc_id", group_col="source"
    ).collect()

    def prio(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:7], 16)
        return (h * 10**6) // max(w, 1)

    expect = {}
    for i, s, w in rows:
        expect.setdefault(s, []).append((prio(i, w), i))
    keep = set()
    for s, lst in expect.items():
        for p, i in sorted(lst)[:5]:
            keep.add(i)
    got = {r["doc_id"] for r in out}
    assert got == keep
    assert len(out) == 10
    # priority column is the exact integer key
    for r in out:
        w = 10 + (r["doc_id"] * 7) % 90
        assert r["priority_fp"] == prio(r["doc_id"], w)


# --- DSIR importance log-weights -----------------------------------------------------


def test_dsir_log_weights_direction_and_counts(spark):
    from feature_extractor_mbo_lob_spark.functions.corpus import dsir_log_weights

    rows = [
        (0, "wiki words wiki words wiki", 1),
        (1, "wiki words wiki facts", 1),
        (2, "spam junk spam junk spam", 0),
        (3, "spam junk noise", 0),
        (4, "wiki words", 0),        # source doc that LOOKS like target
        (5, "spam junk", 1),         # target doc that LOOKS like source
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_target int")
    out = {r.id: r for r in dsir_log_weights(df).collect()}
    assert out[0].n_words == 5 and out[4].n_words == 2
    # target-vocabulary docs score higher than source-vocabulary docs
    assert out[4].log_weight > 0 > out[5].log_weight
    assert out[0].log_weight > out[2].log_weight


def test_kneser_ney_hand_case(spark):
    # corpus: "a b", "a b", "a c" -> bigrams ab:2, ac:1
    # ctx a: c_v=3, n1p_v=2; cont b: n1p_w=1, c: n1p_w=1; T=2
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {(r.v, r.w): r for r in corpus.kneser_ney_bigrams(df).collect()}
    # term1(ab) = (4*2-3)*1e6 div 12 = 416666; lam = 3*2*1e6 div 12 = 500000
    # pcont(b) = 1e6 div 2 = 500000; p = 416666 + 500000*500000 div 1e6
    assert out[("a", "b")].c_vw == 2
    assert out[("a", "b")].p_micro == 416666 + 250000
    # term1(ac) = (4-3)*1e6 div 12 = 83333
    assert out[("a", "c")].p_micro == 83333 + 250000
    # probabilities ordered by evidence
    assert out[("a", "b")].p_micro > out[("a", "c")].p_micro


def test_kneser_ney_continuation_beats_raw_frequency(spark):
    # "york" appears often but ALWAYS after "new" (1 context);
    # "the" appears in many contexts. After unseen-ish context "q",
    # p_cont should rank the versatile word higher: compare n1p_w effect
    # via the lambda-weighted term of two equal-count bigrams.
    rows = [(i, "new york") for i in range(5)] + [
        (10, "a the"), (11, "b the"), (12, "c the"), (13, "d the"), (14, "e the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.v, r.w): r for r in corpus.kneser_ney_bigrams(df).collect()}
    # T = 6 bigram types; n1p_w(the) = 5 contexts vs n1p_w(york) = 1
    # p(york|new): c=5, c_v=5 -> term1 = 17e6 div 20 = 850000,
    #   lam = 3e6 div 20 = 150000, pcont = 1e6 div 6 = 166666
    assert out[("new", "york")].p_micro == 850000 + (150000 * 166666) // 10**6
    # p(the|a): c=1, c_v=1 -> term1 = 1e6 div 4 = 250000,
    #   lam = 3e6 div 4 = 750000, pcont = 5e6 div 6 = 833333
    assert out[("a", "the")].p_micro == 250000 + (750000 * 833333) // 10**6
    # the continuation boost (p - term1) favors the versatile word
    assert (out[("a", "the")].p_micro - 250000) > (
        out[("new", "york")].p_micro - 850000
    )


def test_good_turing_hand_case(spark):
    # counts: a:3, b:1, c:1, d:2, e:2, f:2 -> N1=2, N2=3, N3=1
    df = spark.createDataFrame(
        [(0, "a a a b"), (1, "c d d e"), (2, "e f f")],
        "doc_id long, text string",
    )
    out = {r.r: r for r in corpus.good_turing_counts(df).collect()}
    assert out[1].n_r == 2 and out[2].n_r == 3 and out[3].n_r == 1
    # r*=1: (1+1)*N2*1e6 div N1 = 2*3e6 div 2 = 3e6
    assert out[1].gt_r_micro == 3_000_000
    # r*=2: 3*N3*1e6 div N2 = 3e6 div 3 = 1e6
    assert out[2].gt_r_micro == 1_000_000
    # top frequency truncates to 0
    assert out[3].gt_r_micro == 0


def test_source_js_divergence_properties(spark):
    import math

    rows = (
        [(i, "alpha beta gamma", "s1") for i in range(5)]
        + [(10 + i, "alpha beta gamma", "s2") for i in range(5)]   # identical to s1
        + [(20 + i, "delta delta epsilon", "s3") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r.src_a, r.src_b): r.js_nanos
           for r in corpus.source_js_divergence(df).collect()}
    # identical distributions -> (near) zero; smoothing keeps it exactly 0 here
    assert out[("s1", "s2")] == 0
    # disjoint vocab -> strictly positive, bounded by ln 2
    assert 0 < out[("s1", "s3")] == out[("s2", "s3")] < math.log(2) * 1e9
    # hand replica of the exact quantized sum for (s1, s3)
    V = 5
    n1 = 15; n3 = 15
    c1 = {"alpha": 5, "beta": 5, "gamma": 5, "delta": 0, "epsilon": 0}
    c3 = {"alpha": 0, "beta": 0, "gamma": 0, "delta": 10, "epsilon": 5}
    tot = 0
    for w in c1:
        pa = (c1[w] + 1) / (n1 + V)
        pb = (c3[w] + 1) / (n3 + V)
        m = (pa + pb) / 2.0
        tot += math.floor((pa * math.log(pa / m) + pb * math.log(pb / m)) * 1e9 + 0.5)
    assert out[("s1", "s3")] == tot // 2


def test_diversity_indices_hand_corpus(spark):
    from feature_extractor_mbo_lob_spark.functions.corpus import diversity_indices

    # source A: counts {a:3, b:1, c:1, d:2} -> N=7, V=4, f1=2, f2=1
    # source B: uniform singletons -> f2=0 branch of chao1
    rows = [
        (1, "a a a b", "A"), (2, "c d d", "A"),
        (3, "p q r", "B"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in diversity_indices(docs, "source").collect()}
    a = got["A"]
    assert (a.n_tokens, a.v_distinct, a.f1, a.f2) == (7, 4, 2, 1)
    # chao1 = V + f1(f1-1)/(2(f2+1)) = 4 + 2*1/4 = 4.5 -> micro
    assert a.chao1_micro == 4 * 1_000_000 + (2 * 1 * 1_000_000) // 4
    # simpson = sum c(c-1) / (N(N-1)) = (6 + 0 + 0 + 2) / 42
    assert a.simpson_ppm == (8 * 1_000_000) // 42
    import math as _m
    wl = sum(c * _m.floor(_m.log(c) * 1e9 + 0.5) for c in (3, 1, 1, 2))
    ent = _m.floor(_m.log(7.0) * 1e9 + 0.5) / 1e9 - wl / 7.0 / 1e9
    assert a.entropy == _m.floor(ent * 1e6 + 0.5) / 1e6
    b = got["B"]
    assert (b.n_tokens, b.v_distinct, b.f1, b.f2) == (3, 3, 3, 0)
    # f2=0: chao1 = 3 + 3*2/2 = 6
    assert b.chao1_micro == 6_000_000
    assert b.simpson_ppm == 0  # all singletons: never two equal tokens


def test_naive_bayes_disjoint_vocab_routes_perfectly(spark):
    """Two classes with disjoint vocabularies: every held-out doc must be
    routed to its own class (the matched weights dominate the default
    mass for any smoothing level)."""
    rows = [(i, "alpha beta alpha beta alpha", "A") for i in range(0, 40, 2)]
    rows += [(i, "gamma delta gamma delta gamma", "B") for i in range(1, 40, 2)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label string")
    out = corpus.naive_bayes_confusion(df, "label").collect()
    assert all(r.label_true == r.label_pred for r in out)
    # both classes appear in the held-out half (md5 split is balanced-ish)
    assert {r.label_true for r in out} == {"A", "B"}


def test_naive_bayes_matches_naive_reference(spark):
    """Exact parity with a pure-Python NB using the same md5 split,
    nano-quantized ln weights, OOV-drop policy and tie-break."""
    import math
    from collections import Counter, defaultdict

    words = ["red", "blue", "green", "red red", "blue green", "red blue",
             "green green green", "blue", "red green", "blue blue red"]
    rows = [(i, words[i % len(words)] + (" extra" if i % 3 == 0 else ""),
             "C" + str(i % 3)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label string")
    got = {(r.label_true, r.label_pred): r.n_docs
           for r in corpus.naive_bayes_confusion(df, "label").collect()}

    bucket = {r.doc_id: r.b for r in df.select(
        "doc_id", corpus.md5_bucket("doc_id", 2).alias("b")).collect()}
    nano = lambda x: math.floor(math.log(x) * 1e9 + 0.5)
    train = [(i, t, y) for i, t, y in rows if bucket[i] == 0]
    test = [(i, t, y) for i, t, y in rows if bucket[i] == 1]
    wc, n_c, docs_c = defaultdict(Counter), Counter(), Counter()
    vocab = set()
    for _, t, y in train:
        ws = t.split()
        wc[y].update(ws)
        n_c[y] += len(ws)
        docs_c[y] += 1
        vocab.update(ws)
    docs_tot = sum(docs_c.values())
    V = len(vocab)
    classes = sorted(n_c)
    want = Counter()
    for _, t, y in test:
        ws = [w for w in t.split() if w in vocab]
        if not ws:
            continue
        cnt = Counter(ws)
        best = None
        for c in classes:
            prior = nano(docs_c[c] / docs_tot)
            default = nano(1.0 / (n_c[c] + V))
            s = prior
            for w, k in cnt.items():
                s += k * (nano((wc[c][w] + 1) / (n_c[c] + V))
                          if wc[c][w] else default)
            if best is None or s > best[0]:
                best = (s, c)
        want[(y, best[1])] += 1
    assert got == dict(want)


def test_burrows_delta_orders_style_distance(spark):
    """Three 2-word-vocabulary sources: s1 and s2 have opposite
    function-word profiles, s3 sits between — Delta(s1,s2) must exceed
    both Delta(s1,s3) and Delta(s2,s3); exact value checked against a
    naive integer replica of the ppm/cleared-spread formula."""
    import math

    from feature_extractor_mbo_lob_spark.functions.corpus import burrows_delta

    rows = [
        ("s1", "a a b"),
        ("s2", "a b b"),
        ("s3", "a b"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {(r.src_a, r.src_b): r.delta_micro
           for r in burrows_delta(df, top_m=2).collect()}
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert out[("s1", "s2")] > out[("s1", "s3")]
    assert out[("s1", "s2")] > out[("s2", "s3")]

    # naive replica: f ppm per (source, word), cleared spread, term sum
    f = {}
    for s, text in rows:
        ws = text.split()
        n = len(ws)
        for w in ("a", "b"):
            f[(s, w)] = (ws.count(w) * 1000000) // n
    expect = {}
    for a, b in (("s1", "s2"), ("s1", "s3"), ("s2", "s3")):
        tot = 0
        m = 0
        for w in ("a", "b"):
            vals = [f[(s, w)] for s in ("s1", "s2", "s3")]
            dv = 3 * sum(v * v for v in vals) - sum(vals) ** 2
            if dv <= 0:
                continue
            term = math.floor(
                abs(f[(a, w)] - f[(b, w)]) * 3 / math.sqrt(dv) * 1e6 + 0.5
            )
            tot += term
            m += 1
        expect[(a, b)] = tot // m
    assert out == expect


def test_hapax_profile_hand_cases(spark):
    """"a a b c": N=4, V=3, V1=2, V2=1; Honore R=100 ln4/(1-2/3);
    all-hapax text diverges -> honore_r NULL."""
    import math

    from feature_extractor_mbo_lob_spark.functions.corpus import hapax_profile

    df = spark.createDataFrame(
        [("s1", "a a b c"), ("s2", "x y z")], "source string, text string"
    )
    rows = {r.source: r for r in hapax_profile(df).collect()}
    r1 = rows["s1"]
    assert (r1.n_tokens, r1.v_types, r1.v1, r1.v2) == (4, 3, 2, 1)
    assert (r1.hapax_ppm, r1.sichel_ppm) == (666666, 333333)
    honore = 100.0 * math.log(4.0) / (1.0 - 2.0 / 3.0)
    assert r1.honore_r == math.floor(honore * 1e6 + 0.5) / 1e6

    r2 = rows["s2"]
    assert (r2.v1, r2.v_types) == (3, 3)
    assert r2.honore_r is None


def test_nb_quality_perfect_and_degenerate(spark, tmp_path):
    """Disjoint vocabularies route perfectly -> MCC = 1.0, macro-F1 =
    1e6; identical texts with two labels collapse onto one predicted
    class -> MCC NULL (zero predicted spread) and macro-F1 computed
    from the one-column confusion."""
    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    rows = [(i, "alpha beta alpha beta alpha", "A", "s", 1) for i in range(0, 40, 2)]
    rows += [(i, "gamma delta gamma delta gamma", "B", "s", 1) for i in range(1, 40, 2)]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    sf = tmp_path / "nbq1"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(sf / "documents.parquet"))
    r = QUERIES["nb_quality"](spark, str(sf)).collect()[0]
    assert (r.k, r.mcc, r.macro_f1_ppm) == (2, 1.0, 1000000)

    rows2 = [(i, "same words here", "A" if i % 2 else "B", "s", 1)
             for i in range(40)]
    sf2 = tmp_path / "nbq2"
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(sf2 / "documents.parquet"))
    r2 = QUERIES["nb_quality"](spark, str(sf2)).collect()[0]
    assert r2.mcc is None  # every held-out doc predicted as the tie-broken class
    # macro-F1 from the realized confusion (one predicted column)
    cm = {(c.label_true, c.label_pred): c.n_docs
          for c in corpus.naive_bayes_confusion(
              spark.createDataFrame(rows2, schema).withColumnRenamed("lang", "label"),
              "label").collect()}
    n_a = sum(v for (t, p), v in cm.items() if t == "A")
    n_b = sum(v for (t, p), v in cm.items() if t == "B")
    pred = {p for (_, p) in cm}
    assert len(pred) == 1
    win = next(iter(pred))
    tp = cm.get((win, win), 0)
    n_win = n_a if win == "A" else n_b
    n_lose = n_b if win == "A" else n_a
    f1_win = (2 * tp * 1000000) // (2 * tp + (n_a + n_b - tp) + (n_win - tp))
    assert r2.macro_f1_ppm == (f1_win + 0) // 2


def test_epoch_shuffle_is_total_permutation(spark, tmp_path):
    """Every doc appears exactly once; positions within each shard are
    1..len dense; the permutation is deterministic across runs."""
    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    docs = spark.createDataFrame(
        [(i, "t", "en", "s", 1) for i in range(100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = tmp_path / "shuf"
    docs.coalesce(1).write.parquet(str(sf / "documents.parquet"))
    rows = QUERIES["epoch_shuffle"](spark, str(sf)).collect()
    assert len(rows) == 100 and len({r.doc_id for r in rows}) == 100
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    rows2 = QUERIES["epoch_shuffle"](spark, str(sf)).collect()
    assert {(r.doc_id, r.shard, r.pos) for r in rows} == \
        {(r.doc_id, r.shard, r.pos) for r in rows2}


def test_bowker_symmetry_directional_bias(spark, tmp_path):
    """Engineered corpus: class A's held-out docs partly leak B's
    vocabulary so misroutes are one-directional -> chi2 equals the
    hand formula on the realized confusion; a perfectly-routed corpus
    gives chi2 = 0 with df = 0."""
    from feature_extractor_mbo_lob_spark.functions import corpus
    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    rows = [(i, "alpha beta alpha", "A", "s", 1) for i in range(0, 60, 2)]
    rows += [(i, "gamma delta gamma", "B", "s", 1) for i in range(1, 60, 2)]
    # odd ids 31..59 of class A use B's vocabulary -> routed to B
    rows += [(100 + i, "gamma delta", "A", "s", 1) for i in range(1, 20, 2)]
    sf = tmp_path / "bowker"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(sf / "documents.parquet"))
    r = QUERIES["bowker_symmetry"](spark, str(sf)).collect()[0]
    cm = {(c.label_true, c.label_pred): c.n_docs
          for c in corpus.naive_bayes_confusion(
              spark.read.parquet(str(sf / "documents.parquet")), "lang"
          ).collect()}
    nab = cm.get(("A", "B"), 0)
    nba = cm.get(("B", "A"), 0)
    if nab + nba > 0:
        assert r.df == 1
        assert r.chi2_micro == ((nab - nba) ** 2 * 1000000) // (nab + nba)
        assert nab > 0 and nba == 0  # the engineered direction

    clean = [(i, "alpha beta", "A", "s", 1) for i in range(0, 40, 2)]
    clean += [(i, "gamma delta", "B", "s", 1) for i in range(1, 40, 2)]
    sf2 = tmp_path / "clean"
    spark.createDataFrame(clean, schema).coalesce(1).write.parquet(
        str(sf2 / "documents.parquet"))
    r2 = QUERIES["bowker_symmetry"](spark, str(sf2)).collect()[0]
    assert (r2.df, r2.chi2_micro) == (0, 0)


def test_keyness_g2_hand_case(spark, tmp_path):
    """A word exclusive to one balanced corpus half tops the keyness
    list and its G2 replays from the integer nano-ln formula; a word
    used at the same RATE in both corpora scores ~0."""
    import math

    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    rows = [(i, "common shared words market", "en", "s", 1) for i in range(10)]
    rows += [(100 + i, "common shared words mercado", "es", "s", 1)
             for i in range(10)]
    sf = tmp_path / "key"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(sf / "documents.parquet"))
    out = {r.w: r for r in QUERIES["keyness_g2"](spark, str(sf)).collect()}
    # exclusive words dominate; shared-rate words score 0
    top2 = sorted(out.values(), key=lambda r: r.rank)[:2]
    assert {r.w for r in top2} == {"market", "mercado"}

    def nln(x):
        return math.floor(math.log(x) * 1e9 + 0.5)

    a, b, na, nb = 10, 0, 40, 40
    g2 = 2 * (a * (nln(a) + nln(na + nb) - nln(a + b) - nln(na)))
    assert out["market"].g2_nano == g2
    assert out["common"].g2_nano in (0, 1, -1, 2, -2)  # same-rate word ~ 0


def test_richness_estimators_hand_computed(spark):
    from feature_extractor_mbo_lob_spark.functions.corpus import (
        richness_estimators,
    )

    # corpus: a a a b b c d e -> D=5, f1=3 (c,d,e), f2=1 (b), n=8
    docs = spark.createDataFrame(
        [(1, "a a a b b"), (2, "c d e")], "doc_id long, text string"
    )
    r = richness_estimators(docs).collect()[0]
    assert (r.n_tokens, r.d_types, r.f1, r.f2) == (8, 5, 3, 1)
    assert r.chao1_micro == 5 * 10 ** 6 + 9 * 10 ** 6 // 2
    assert r.chao1_bc_micro == 5 * 10 ** 6 + 3 * 2 * 10 ** 6 // 4
    assert r.jack1_micro == 5 * 10 ** 6 + 3 * 7 * 10 ** 6 // 8

    # no singletons -> every estimator collapses to D
    docs2 = spark.createDataFrame(
        [(1, "x x y y"), (2, "z z")], "doc_id long, text string"
    )
    r2 = richness_estimators(docs2).collect()[0]
    assert r2.f1 == 0
    assert r2.chao1_bc_micro == r2.d_types * 10 ** 6
    assert r2.jack1_micro == r2.d_types * 10 ** 6
