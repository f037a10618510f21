"""Hand-computed readability and boilerplate expectations."""

from feature_extractor_mbo_lob_spark.functions import corpus, text as textfn


def test_readability_hand_counts(spark):
    # "cat tree xyz": 3 words, 1 sentence, vowel runs: a / ee = 2,
    # "xyz" has no vowel -> +1 => 3 syllables
    df = spark.createDataFrame([(1, "cat tree xyz")], "doc_id long, text string")
    r = textfn.readability(df, "doc_id", "text").collect()[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (3, 1, 3)
    expected = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert abs(r.flesch - expected) < 1e-6


def test_readability_sentence_segments(spark):
    # 25 words -> ceil(25/10) = 3 sentences
    words = " ".join(["go"] * 25)
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    r = textfn.readability(df, "doc_id", "text").collect()[0]
    assert r.n_sentences == 3
    assert r.n_syllables == 25  # one vowel run per "go"


def test_readability_uppercase_normalized(spark):
    df = spark.createDataFrame([(1, "CAT TREE")], "doc_id long, text string")
    r = textfn.readability(df, "doc_id", "text").collect()[0]
    assert r.n_syllables == 2


def test_boilerplate_detects_shared_line(spark):
    # same 10-word line in docs 1 and 2 of source A; doc 3 unique line
    shared = "a b c d e f g h i j"
    rows = [
        (1, shared + " tail one", "A"),
        (2, shared + " tail two", "A"),
        (3, "k l m n o p q r s t unique end", "A"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    r = corpus.boilerplate_stats(df, "doc_id", "text", "source", 10, 2).collect()[0]
    # lines: shared (x2), "tail one", "tail two", first-10 of doc3, "unique end"
    assert r.grp == "A"
    assert r.distinct_lines == 5
    assert r.boilerplate_lines == 1
    assert r.occurrences == 6
    assert r.boilerplate_occurrences == 2
    assert abs(r.boilerplate_frac - 2 / 6) < 1e-6


def test_boilerplate_group_isolation(spark):
    # identical line in two DIFFERENT sources is not boilerplate
    line = "a b c d e f g h i j"
    rows = [(1, line, "A"), (2, line, "B")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.grp: r for r in corpus.boilerplate_stats(df, "doc_id", "text", "source", 10, 2).collect()}
    assert out["A"].boilerplate_lines == 0
    assert out["B"].boilerplate_lines == 0
