"""Randomized cross-check: repetition metrics / word runs / packing on a
seeded random corpus vs naive pure-Python references (one Spark job total,
hundreds of random documents)."""

import random
from collections import Counter

import pytest

from feature_extractor_mbo_lob_spark.functions import corpus, repetition as rep

VOCAB = ["a", "bb", "ccc", "dd", "e", "spark", "window", "join", "x9"]


def _norm_words(text):
    return " ".join(text.lower().split()).split(" ")


def ref_metrics(text):
    words = _norm_words(text)
    norm_len = len(" ".join(text.lower().split()))
    grams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    c = Counter(grams)
    total = sum(c.values())
    dup = sum(v for v in c.values() if v > 1)
    top = max((v * len(g) for g, v in c.items()), default=0)
    from feature_extractor_mbo_lob_spark.contract import DIVISION_GUARD_EPS as eps
    return {
        "n_words": len(words),
        "distinct_word_ratio": len(set(words)) / (len(words) + eps),
        "dup_2gram_frac": dup / (total + eps),
        "top_2gram_char_frac": top / (norm_len + eps),
    }


def ref_max_run(text):
    words = _norm_words(text)
    best = run = 1
    for a, b in zip(words, words[1:]):
        run = run + 1 if a == b else 1
        best = max(best, run)
    return best


@pytest.fixture(scope="module")
def random_docs():
    rng = random.Random(20260816)
    docs = []
    for i in range(200):
        n = rng.randint(1, 40)
        # bias toward repeats so dup/run paths are exercised
        words = []
        while len(words) < n:
            w = rng.choice(VOCAB)
            words.extend([w] * rng.randint(1, 4))
        docs.append((i, " ".join(words[:n])))
    return docs


def test_repetition_metrics_random(spark, random_docs):
    df = spark.createDataFrame(random_docs, "doc_id long, text string")
    got = {r.id: r for r in rep.repetition_metrics(df).collect()}
    assert len(got) == len(random_docs)
    for i, text in random_docs:
        want = ref_metrics(text)
        assert got[i].n_words == want["n_words"], (i, text)
        for k in ("distinct_word_ratio", "dup_2gram_frac", "top_2gram_char_frac"):
            assert abs(getattr(got[i], k) - want[k]) < 1e-9, (i, k, text)


def test_max_word_run_random(spark, random_docs):
    df = spark.createDataFrame(random_docs, "doc_id long, text string")
    got = {r.id: r.max_word_run for r in rep.max_word_run(df).collect()}
    for i, text in random_docs:
        assert got[i] == ref_max_run(text), (i, text)


def test_packing_random(spark, random_docs):
    df = spark.createDataFrame(random_docs, "doc_id long, text string")
    out = sorted(
        corpus.pack_token_stream(df, budget=64, n_shards=4).collect(),
        key=lambda r: (r.shard, r.id),
    )
    # per shard: offsets are the exact prefix sums in id order; bins consistent
    import hashlib
    from collections import defaultdict

    def md5_shard(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:7], 16) % 4

    acc = defaultdict(int)
    for r in out:
        assert r.shard == md5_shard(r.id)
        assert r.offset == acc[r.shard], (r.id,)
        assert r.bin_start == r.offset // 64
        assert r.bin_end == (r.offset + max(r.n_tokens, 1) - 1) // 64
        acc[r.shard] += r.n_tokens
