"""Ranking-quality metrics over retrieval results: nDCG@k, AP@k, MRR.

The evaluation loop for any ANN / retrieval index in this engine
(operators/similarity.py brute-force, IVF, LSH): given a ranked
result list per query and the ground-truth relevant-set size, score the
ranking. Everything reduces to one window pass (cumulative hits, ordered
by rank within query — partitioned, bounded by k rows per query) plus one
groupBy(query) aggregate; totals join in by query id.

Determinism: the log2 discount weights 1/log2(i+1) are baked as INTEGER
nano constants computed once in Python (both the Spark plan and any SQL
oracle embed the same literals — no cross-engine transcendental calls at
all), so DCG and IDCG are exact integer sums. AP's precision@i terms are
nano-quantized rationals (cum_hits/i with i <= k — floor boundary cannot
misround because the quantization step 1e-9 dwarfs the division ulp).
Reciprocal rank likewise. One double division per metric at the end.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _x6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def dcg_weights_nano(k: int) -> list[int]:
    """floor(1e9 / log2(i+1) + 0.5) for i = 1..k — the shared constants."""
    return [int(math.floor(1e9 / math.log2(i + 1) + 0.5)) for i in range(1, k + 1)]


def dcg_prefix_nano(k: int) -> list[int]:
    """Prefix sums of the nano weights: ideal DCG with m relevant = P[m]."""
    w = dcg_weights_nano(k)
    out, acc = [], 0
    for v in w:
        acc += v
        out.append(acc)
    return out


def retrieval_metrics(
    ranked: DataFrame,
    totals: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    total_col: str = "n_rel_total",
) -> DataFrame:
    """Score a ranked retrieval frame.

    ranked: one row per (query, rank<=k candidate) with binary ``rel``.
    totals: one row per query with the ground-truth relevant count
    (``n_rel_total``) — used for the IDCG and AP normalizers, so a query
    that COULD have had m < k relevant hits is not penalized for the
    impossible tail.

    Returns per query: (query_id, hits, n_rel_total, ndcg, ap, rr);
    all three metrics are 0.0 when the query has no relevant docs at all.
    """
    W = dcg_weights_nano(k)
    P = dcg_prefix_nano(k)
    warr = F.array(*[F.lit(w) for w in W])
    parr = F.array(*[F.lit(p) for p in P])

    q = F.col(query_col)
    rnk = F.col(rank_col).cast("int")
    rel = F.col(rel_col).cast("long")

    cumw = (
        Window.partitionBy(query_col)
        .orderBy(rnk)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = ranked.where(rnk <= k).select(
        q.alias("qid"),
        rnk.alias("rnk"),
        rel.alias("rel"),
        F.sum(rel).over(cumw).alias("cum_hits"),
    )
    ap_term = F.col("rel") * F.floor(
        F.lit(1e9) * F.col("cum_hits") / F.col("rnk") + F.lit(0.5)
    ).cast("long")
    per = base.groupBy("qid").agg(
        F.sum("rel").cast("long").alias("hits"),
        F.sum(F.col("rel") * F.element_at(warr, F.col("rnk"))).cast("long").alias("dcg_nano"),
        F.sum(ap_term).cast("long").alias("ap_nano"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_rank"),
    )
    t = totals.select(
        F.col(query_col).alias("qid"), F.col(total_col).cast("long").alias("n_rel_total")
    )
    j = per.join(t, "qid")
    m = F.least(F.col("n_rel_total"), F.lit(k)).cast("int")
    idcg = F.element_at(parr, m)
    ndcg = F.when(
        F.col("n_rel_total") > 0,
        F.col("dcg_nano").cast("double") / idcg.cast("double"),
    ).otherwise(F.lit(0.0))
    ap = F.when(
        F.col("n_rel_total") > 0,
        F.col("ap_nano").cast("double") / (m.cast("double") * F.lit(1e9)),
    ).otherwise(F.lit(0.0))
    rr = F.coalesce(
        F.floor(F.lit(1e9) / F.col("first_rank") + F.lit(0.5)) / F.lit(1e9),
        F.lit(0.0),
    )
    return j.select(
        F.col("qid").alias(query_col),
        "hits",
        "n_rel_total",
        _x6(ndcg).alias("ndcg"),
        _x6(ap).alias("ap"),
        _x6(rr).alias("rr"),
    )


def reciprocal_rank_fusion(
    rankings: list,
    k_const: int = 60,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    top_k: int | None = None,
) -> DataFrame:
    """Hybrid-retrieval fusion (Cormack et al. RRF): given N ranked lists
    per query (e.g. BM25 lexical + embedding cosine), score every
    candidate by sum over lists of 1/(k + rank) and re-rank.

    The per-list contribution 1/(k+rank) is quantized to integer nanos
    (rank and k are integers, the quantization step dwarfs division ulp),
    so the fused score is an exact integer sum — order-free across lists
    and engines; ties break on doc id. Shape: unionAll of the input
    rankings (no join fan-out), one (query, doc) groupBy, then a
    bounded-per-query rank window.

    Returns (query_id, doc_id, rrf_nano, fused_rank), optionally truncated
    to ``top_k`` fused results per query.
    """
    contrib = F.floor(
        F.lit(1e9) / (F.lit(int(k_const)) + F.col(rank_col).cast("double")) + F.lit(0.5)
    ).cast("long")
    parts = [
        r.select(
            F.col(query_col).alias("qid"),
            F.col(doc_col).alias("did"),
            contrib.alias("c"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    fused = u.groupBy("qid", "did").agg(F.sum("c").cast("long").alias("rrf_nano"))
    w = Window.partitionBy("qid").orderBy(F.col("rrf_nano").desc(), F.col("did").asc())
    out = fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))
    if top_k is not None:
        out = out.where(F.col("fused_rank") <= top_k)
    return out.select(
        F.col("qid").alias(query_col), F.col("did").alias(doc_col),
        "rrf_nano", "fused_rank",
    )


def rbo_weights(depth: int = 20, p_num: int = 9, p_den: int = 10):
    """Truncated rank-biased-overlap weights in exact micro fixed point:
    w_1 = 1e6, w_d = (w_{d-1}·p_num) div p_den — the geometric decay of
    Webber et al. 2010 as a deterministic integer recurrence. Returns
    (weights list, per-match credit list, W = Σw) where credit[m] =
    Σ_{d=m..D} (w_d·1e6 div d): the exact total weighted-agreement mass
    a document pair earns when it enters both rankings at depth m."""
    w = [1_000_000]
    for _ in range(depth - 1):
        w.append(w[-1] * p_num // p_den)
    credit = [0] * (depth + 1)
    for m in range(depth, 0, -1):
        credit[m] = (credit[m + 1] if m < depth else 0) + (w[m - 1] * 1_000_000) // m
    return w, credit[1:], sum(w)


def rank_biased_overlap(
    a: DataFrame,
    b: DataFrame,
    depth: int = 20,
    p_num: int = 9,
    p_den: int = 10,
) -> DataFrame:
    """Truncated rank-biased overlap (Webber 2010) between two rankings
    per query — the top-weighted ranking-agreement metric for comparing
    retrievers (exact vs quantized, BM25 vs dense): unlike Kendall/
    Spearman it weights depth-1 agreement geometrically more than
    depth-20 and handles non-conjoint lists natively.

    Inputs: two frames (query_id, doc_id, rank), 1-based ranks <= depth.
    A document in both lists first co-occurs at depth m = max(rank_a,
    rank_b); its exact agreement credit Σ_{d>=m} w_d/d is a PLAN-LITERAL
    integer (rbo_weights' micro recurrence), so per-query
    rbo_micro = (Σ_matches credit[m]) div W is pure integer arithmetic —
    bit-identical on both engines; identical lists score 999999 (one
    micro lost to the final trunc division).

    Scale shape: one equi-join of two (queries × depth)-bounded frames
    on (query_id, doc_id), one element_at against the literal credit
    array, one partial-aggregable groupBy(query_id). Nothing scales
    with corpus rows.

    Returns ``DataFrame[query_id, n_matches: long, rbo_micro: long]``.
    """
    _w, credit, big_w = rbo_weights(depth, p_num, p_den)
    ra = a.select(
        F.col("query_id"), F.col("doc_id"), F.col("rank").alias("ra")
    ).filter(F.col("ra") <= depth)
    rb = b.select(
        F.col("query_id"), F.col("doc_id"), F.col("rank").alias("rb")
    ).filter(F.col("rb") <= depth)
    m = F.greatest(F.col("ra"), F.col("rb")).cast("int")
    credit_arr = F.array(*[F.lit(int(c)).cast("long") for c in credit])
    j = ra.join(rb, ["query_id", "doc_id"]).select(
        "query_id", F.element_at(credit_arr, m).alias("c")
    )
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.expr(f"cast(sum(c) div {big_w} as bigint)").alias("rbo_micro"),
    )
