"""Repetition metrics (Gopher-rule style), PII redaction, dedup clustering."""

import pytest
from pyspark.sql import functions as F

from feature_extractor_mbo_lob_spark.functions import pii, repetition as rep
from feature_extractor_mbo_lob_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spam spam spam spam spam"),                       # one word repeated
        (1, "a b a b a b a b"),                                # repeated 2-gram
        (2, "all distinct words here nothing repeats twice"),  # clean
        (3, "x"),                                              # single word, no 2-grams
        (4, "go go stop go go go end"),                        # max run 3
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_metrics(docs):
    out = {r.id: r for r in rep.repetition_metrics(docs).collect()}
    # doc 0: every 2-gram is "spam spam" (4 occurrences, all dups)
    assert out[0].dup_2gram_frac == pytest.approx(1.0, abs=1e-6)
    # char mass of "spam spam" = 4 occurrences * 9 chars / 24 normalized chars
    assert out[0].top_2gram_char_frac == pytest.approx(36 / 24, abs=1e-6)
    assert out[0].distinct_word_ratio == pytest.approx(1 / 5, abs=1e-6)
    # doc 1: grams alternate "a b" (4x) and "b a" (3x) -> all 7 are dups
    assert out[1].dup_2gram_frac == pytest.approx(1.0, abs=1e-6)
    # doc 2: no repeated grams
    assert out[2].dup_2gram_frac == pytest.approx(0.0, abs=1e-6)
    # doc 3: no 2-grams at all -> fractions 0, not NULL/NaN
    assert out[3].dup_2gram_frac == pytest.approx(0.0, abs=1e-6)
    assert out[3].top_2gram_char_frac == pytest.approx(0.0, abs=1e-6)


def test_max_word_run(docs):
    out = {r.id: r.max_word_run for r in rep.max_word_run(docs).collect()}
    assert out[0] == 5
    assert out[1] == 1
    assert out[3] == 1
    assert out[4] == 3


def test_pii_counts_and_redaction(spark):
    rows = [
        (0, "mail me at jo.doe+x@sub.example.org or 192.168.0.1 tel 415-555-0134"),
        (1, "no pii here at all"),
        (2, "two mails a@b.io c@d.co one ip 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in df.select(
        "doc_id",
        pii.email_count("text").alias("ne"),
        pii.ipv4_count("text").alias("ni"),
        pii.phone_count("text").alias("np"),
        pii.redact("text").alias("red"),
    ).collect()}
    assert (out[0].ne, out[0].ni, out[0].np) == (1, 1, 1)
    assert out[0].red == "mail me at <EMAIL> or <IP> tel <PHONE>"
    assert (out[1].ne, out[1].ni, out[1].np) == (0, 0, 0)
    assert out[1].red == "no pii here at all"
    assert (out[2].ne, out[2].ni) == (2, 1)
    assert "<EMAIL>" in out[2].red and "<IP>" in out[2].red


def test_connected_components_clusters(spark):
    # two components {1,2,3,7} (chain) and {10,11}; 20 isolated via self-pair? no —
    # isolated nodes don't appear in the edge set, by contract.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (10, 11)], "id_a long, id_b long"
    )
    out = {r.id: r.cluster_id for r in dedup.connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_connected_components_long_chain(spark):
    # a 200-node path: plain min-label propagation needs ~199 rounds, far
    # over the max_iter=25 cap — only the pointer-doubling acceleration
    # (O(log diameter) rounds) can converge. This test FAILS if the
    # shortcut is removed.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199, 0, -1)], "id_a long, id_b long"
    )
    out = {r.id: r.cluster_id for r in dedup.connected_components(edges).collect()}
    assert set(out.values()) == {1} and len(out) == 200


def test_l_diversity_audit_hand_case(spark):
    # group (u, t1): 5 rows, 3 distinct sensitive -> meets both;
    # group (u, t2): 5 rows, 1 distinct sensitive -> k ok, l fails;
    # group (a, t1): 2 rows, 2 distinct -> k fails, l fails
    rows = (
        [("u", "t1", f"c{i % 3}") for i in range(5)]
        + [("u", "t2", "c9")] * 5
        + [("a", "t1", "c1"), ("a", "t1", "c2")]
    )
    df = spark.createDataFrame(rows, "role string, tool string, s string")
    out = {(r.role, r.tool): r
           for r in pii.l_diversity_audit(df, ["role", "tool"], "s", k=5, l=3).collect()}
    assert out[("u", "t1")].k_count == 5 and out[("u", "t1")].l_distinct == 3
    assert out[("u", "t1")].meets_k == 1 and out[("u", "t1")].meets_l == 1
    assert out[("u", "t2")].meets_k == 1 and out[("u", "t2")].meets_l == 0
    assert out[("a", "t1")].meets_k == 0 and out[("a", "t1")].meets_l == 0


def test_l_diversity_counts_duplicate_sensitive_once(spark):
    df = spark.createDataFrame(
        [("u", "x", "c1")] * 4 + [("u", "x", "c2")] * 3,
        "role string, tool string, s string",
    )
    r = pii.l_diversity_audit(df, ["role", "tool"], "s", k=5, l=2).collect()[0]
    assert r.k_count == 7 and r.l_distinct == 2 and r.meets_k == 1 and r.meets_l == 1


def _naive_tvd_ppm(rows, n_quasi, target_q):
    # rows: (quasi, sensitive); exact trunc((1e6 * sum|c*N - g*nec|) / (2*nec*N))
    from collections import Counter
    N = len(rows)
    g = Counter(s for _, s in rows)
    grp = [s for q, s in rows if q == target_q]
    nec = len(grp)
    c = Counter(grp)
    total = sum(abs(c.get(s, 0) * N - g[s] * nec) for s in g)
    return (1_000_000 * total) // (2 * nec * N)


def test_t_closeness_hand_case(spark):
    # group 'a' is all-cohort-0 (skewed); group 'b' mirrors the global mix
    rows = [("a", 0)] * 4 + [("b", 0)] * 2 + [("b", 1)] * 2 + [("b", 2)] * 2
    df = spark.createDataFrame(rows, "q string, s long")
    out = {r.q: r for r in pii.t_closeness_audit(df, ["q"], "s", t_ppm=300_000).collect()}
    assert out["a"].k_count == 4 and out["b"].k_count == 6
    # exact values: a = 400000 (skewed), b = 266666 (close to global)
    assert out["a"].tvd_ppm == _naive_tvd_ppm(rows, "q", "a") == 400_000
    assert out["b"].tvd_ppm == _naive_tvd_ppm(rows, "q", "b") == 266_666
    # the skewed group fails the gate, the near-global one passes
    assert out["a"].meets_t == 0
    assert out["b"].meets_t == 1


def test_t_closeness_zero_cell_mass(spark):
    # group 'a' NEVER sees sensitive value 1: the absent cell must still
    # contribute g_1 * nec to the distance (closed-form zero-cell mass)
    rows = [("a", 0), ("a", 0), ("b", 1), ("b", 1)]
    df = spark.createDataFrame(rows, "q string, s long")
    out = {r.q: r.tvd_ppm for r in pii.t_closeness_audit(df, ["q"], "s").collect()}
    # P_a = (1,0) vs P_global = (.5,.5): TVD = 0.5 exactly
    assert out["a"] == 500_000 and out["b"] == 500_000
