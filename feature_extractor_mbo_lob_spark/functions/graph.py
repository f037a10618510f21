"""Corpus link-graph analytics: transition-graph construction + PageRank.

A web-scale curation pipeline ranks sources/domains by link structure
(quality weighting, crawl prioritization, spam demotion). The synthetic
corpus carries no hyperlinks, so the graph here is the word-bucket
transition digraph — consecutive-token transitions hashed into a fixed
set of bucket nodes — which exercises the identical distributed shape:
an edge-list aggregation (groupBy with map-side combine, O(buckets^2)
result regardless of corpus size) followed by iterative
rank-propagation joins.

PageRank is computed in INTEGER micro-units end to end: ranks are int64
(sum ~ `scale`), every division is floor integer division, damping is
the rational 17/20. Cross-engine floats killed round 2's one red row
(lifecycle_pit); integer arithmetic is bit-exact by construction on any
engine, so the DuckDB oracle unrolls the same iterations and matches
hash-for-hash. Mass lost to floor() and to dangling nodes is part of
the deterministic spec, not an approximation bug.

Scale shape (100 TB): the edge list never leaves O(buckets^2) rows after
the first aggregation; each iteration is one broadcast-sized join
(ranks) against the aggregated edge table plus one groupBy over dst —
no per-document work after edge extraction. For a real web graph
(billions of nodes) the same loop holds with ranks as a full DataFrame
and the join shuffling on node id; iterations are plan-chained (use
localCheckpoint every ~5 rounds to bound lineage, as operators/dedup.py
does for connected components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..operators.dedup import normalize_text


def _bucket(c: F.Column, buckets: int) -> F.Column:
    # repo-standard md5 bucket (corpus.md5_bucket), column-object form
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 7), 16, 10).cast("long")
        % buckets
    )


def word_transition_edges(
    df: DataFrame,
    text_col: str = "text",
    buckets: int = 16,
) -> DataFrame:
    """Weighted edge list of consecutive-word bucket transitions.

    Tokenizes the normalized text, maps each word to a bucket node
    ``wb<k>`` via the repo-standard md5 bucket (first 7 hex chars mod
    ``buckets``), and counts ordered pairs (bucket of word i -> bucket
    of word i+1) across the whole corpus. Pure JVM: split + transform
    (per-word bucket) + slice + arrays_zip + explode, then one
    partial-aggregable groupBy whose result is at most buckets^2 rows.
    The bucket hash is applied to the word ARRAY once before pairing —
    each occurrence is hashed once, not twice (as pair-left and
    pair-right), and the zip/slice/explode then move longs instead of
    strings. Self-loops are kept — they are real transitions and the
    rank iteration handles them naturally.

    Returns ``DataFrame[src: string, dst: string, w: long]``.
    """
    base = df.select(
        F.transform(
            F.split(normalize_text(text_col), " "),
            lambda w: _bucket(w, buckets),
        ).alias("_b")
    )
    k = F.greatest(F.size(F.col("_b")) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(F.col("_b"), 1, k).alias("a"),
        F.slice(F.col("_b"), 2, k).alias("b"),
    )
    out = (
        base.select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.a").alias("_sb"),
            F.col("p.b").alias("_db"),
        )
        .groupBy("_sb", "_db")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .select(
            F.format_string("wb%02d", F.col("_sb").cast("int")).alias("src"),
            F.format_string("wb%02d", F.col("_db").cast("int")).alias("dst"),
            "w",
        )
    )
    return out


def pagerank_int(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = 1_000_000,
    damping_num: int = 17,
    damping_den: int = 20,
    max_driver_edges: int = 200_000,
) -> DataFrame:
    """Weighted PageRank over an edge list, integer micro-unit arithmetic.

    r_0(v) = scale DIV N for the N distinct nodes; each round
    r_{t+1}(v) = (scale * (den-num)) DIV (den * N)
                 + (num * sum_{u->v} ((r_t(u) * w(u,v)) DIV W(u))) DIV den
    with W(u) the total out-weight of u. Every op is int64 floor
    division on positive operands (Spark ``div`` == DuckDB ``//`` for
    positives), so results are engine-exact. Dangling-node mass is
    dropped (documented spec). N is fetched with one 1-row count — the
    only driver action; everything else is plan-chained joins. The
    weighted edge list and node set are localCheckpoint-ed ONCE so the
    unrolled iterations don't re-derive the (possibly expensive) edge
    lineage — for a parquet-derived edge list the untruncated
    3-iteration plan explodes to hundreds of exchanges. Rank frames are
    left plan-chained: linear growth per round, and eager per-round
    checkpoints were measured 40% slower on the 6.7M-edge turn graph.

    Bounded fast path (the hits_int / markov_stationary discipline): an
    aggregated edge list within ``max_driver_edges`` — every bucket
    graph is O(buckets²) rows by construction — is COLLECTED after
    Spark's corpus-to-edge-list reduction and the fixed-round iteration
    finishes on the driver in exact Python integers (arbitrary
    precision ⊇ int64; ``//`` on the non-negative operands is the
    identical trunc division), replacing ~10 fixed-overhead join/groupBy
    shuffle stages with one tiny createDataFrame. Past the cap the
    distributed loop below runs unchanged (turn-level / web graphs).

    Returns ``DataFrame[node: string, rank_micro: long]``.
    """
    edges = edges.localCheckpoint(eager=True)
    if edges.count() <= max_driver_edges:
        spark = edges.sparkSession
        node_type = edges.schema["src"].dataType.simpleString()
        e = [
            (r["src"], r["dst"], int(r["w"]))
            for r in edges.select(
                "src", "dst", F.col("w").cast("long").alias("w")
            ).collect()
        ]
        schema = f"node {node_type}, rank_micro long"
        if not e:
            return spark.createDataFrame([], schema=schema)
        out_w: dict = {}
        for s, _d, w in e:
            out_w[s] = out_w.get(s, 0) + w
        node_set = sorted({s for s, _, _ in e} | {d for _, d, _ in e})
        n = len(node_set)
        base = (scale * (damping_den - damping_num)) // (damping_den * n)
        rank = {v: scale // n for v in node_set}
        for _ in range(int(iterations)):
            acc: dict = {}
            for s, d, w in e:
                acc[d] = acc.get(d, 0) + (rank[s] * w) // out_w[s]
            rank = {
                v: base + (damping_num * acc.get(v, 0)) // damping_den
                for v in node_set
            }
        return spark.createDataFrame(
            [(v, rank[v]) for v in node_set], schema=schema
        )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    ).localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_micro", F.lit(0).cast("long"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    ew = edges.join(outw, "src").localCheckpoint(eager=True)  # src, dst, w, out_w
    base = (scale * (damping_den - damping_num)) // (damping_den * n)

    ranks = nodes.withColumn("rank_micro", F.lit(scale // n).cast("long"))
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank_micro * w) div out_w").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c_sum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * coalesce(c_sum, 0)) div {damping_den}"
                    )
                ).cast("long").alias("rank_micro"),
            )
        )
    return ranks


def triangle_stats(edges: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Per-node triangle count + local clustering coefficient over an
    undirected edge list (canonical ``a < b`` expected; deduplicated here).

    Distributed shape: the classic two-join wedge closure. Enumerate
    ordered wedges a<b<c by joining e(a,b) with e(b,c) on the middle
    node, then close against e(a,c). Each triangle is found exactly once
    (its vertices in sorted order), then exploded to credit all three
    corners. Both joins shuffle on a single node id; for skewed degree
    distributions the standard mitigation is degree-ordered orientation
    (orient each edge low-degree -> high-degree), which bounds wedge
    fan-out by sqrt(|E|) — with lexicographic orientation the shape is
    identical, so the swap is a one-line change left documented rather
    than hard-coded (the oracle must mirror whichever orientation runs).

    Returns one row per node: (node, degree, triangles, clustering) where
    clustering = 2*t / (d*(d-1)), 0 for degree < 2 — integer-fed, one
    division.
    """
    e = (
        edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .where(F.col("a") < F.col("b"))
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    out = deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
    )
    d = F.col("degree").cast("double")
    t = F.col("triangles").cast("double")
    cc = F.when(
        F.col("degree") >= 2,
        F.floor(
            (F.lit(2.0) * t / (d * (d - F.lit(1.0)))) * F.lit(1e6) + F.lit(0.5)
        )
        / F.lit(1e6),
    ).otherwise(F.lit(0.0))
    return out.select("node", "degree", "triangles", cc.alias("clustering"))


def _turn_pair_weights(
    t: DataFrame, min_shared: int = 1, max_word_turn_df: int | None = None
) -> DataFrame:
    """Within-conversation turn-similarity pair weights for TextRank: one
    row per unordered turn pair (ta < tb) of the SAME conversation,
    weighted by the count of distinct normalized words they share
    (Mihalcea & Tarau 2004's overlap weight, un-normalized so it stays
    integer-exact). Returns ``DataFrame[conv_id, ta, tb, w: long]``.

    Distributed shape: explode -> distinct, then a self-equi-join keyed on
    (conv_id, word) — never a cross join; Catalyst shuffles both sides on
    the composite key, so pair generation is local to each (conv, word)
    group. Pairs per word are bounded by turns-per-conversation^2, and a
    mega-conversation is exactly the skew the optional ``max_word_turn_df``
    cap bounds: words appearing in more than that many turns of one
    conversation (stopwords of that conv) are dropped before the join, the
    same hot-key cap ngram_jaccard_capped applies to shingles.
    """
    from .repetition import normalized_words

    # per-turn word dedup happens ROW-LOCAL (array_distinct before the
    # explode) — the distinct() this replaces was a full shuffle of the
    # exploded table, the single most expensive stage of the old plan
    words = (
        t.select(
            "conv_id",
            "turn_idx",
            F.explode(F.array_distinct(normalized_words("text"))).alias("word"),
        )
        .where(F.col("word") != "")
    )
    if max_word_turn_df is not None:
        df_cap = (
            words.groupBy("conv_id", "word")
            .agg(F.count(F.lit(1)).alias("tdf"))
            .where(F.col("tdf") <= max_word_turn_df)
            .select("conv_id", "word")
        )
        words = words.join(df_cap, ["conv_id", "word"])
    # one groupBy replaces the classic self-join: per (conv, word) collect
    # the sorted turn list once and expand i<j pairs with JVM HOFs —
    # identical output, HALF the shuffle volume (the words table moves
    # once, not twice, and there's no join build side). Pairs per word
    # stay bounded by turns-per-conversation^2 exactly as before.
    grp = words.groupBy("conv_id", "word").agg(
        F.sort_array(F.collect_list("turn_idx")).alias("ts")
    )
    pair_arr = F.flatten(
        F.transform(
            "ts",
            lambda x, i: F.transform(
                F.slice(F.col("ts"), i + 2, F.size("ts") - i - 1),
                lambda y: F.struct(x.alias("ta"), y.alias("tb")),
            ),
        )
    )
    pairs = (
        grp.select("conv_id", F.explode(pair_arr).alias("p"))
        .groupBy(
            "conv_id",
            F.col("p.ta").alias("ta"),
            F.col("p.tb").alias("tb"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .where(F.col("w") >= min_shared)
    )
    return pairs


def turn_similarity_edges(
    t: DataFrame, min_shared: int = 1, max_word_turn_df: int | None = None
) -> DataFrame:
    """String-node edge-list view of ``_turn_pair_weights`` (both directions,
    node ids ``conv_id#turn_idx``) — the generic-graph form pagerank_int /
    hits_int consume. Returns ``DataFrame[src, dst, w: long]``."""
    pairs = _turn_pair_weights(t, min_shared, max_word_turn_df)
    node = lambda c, ti: F.concat_ws("#", F.col(c), F.col(ti).cast("string"))
    fwd = pairs.select(node("conv_id", "ta").alias("src"), node("conv_id", "tb").alias("dst"), "w")
    rev = pairs.select(node("conv_id", "tb").alias("src"), node("conv_id", "ta").alias("dst"), "w")
    return fwd.unionAll(rev)


def textrank_turns(
    t: DataFrame,
    iterations: int = 2,
    min_shared: int = 1,
    max_word_turn_df: int | None = None,
) -> DataFrame:
    """TextRank key-turn extraction (Mihalcea & Tarau, EMNLP 2004): run
    integer micro-unit PageRank over the within-conversation
    turn-similarity graph and rank each conversation's turns by centrality
    — the classic extractive-summarization signal, here used to pick the
    load-bearing turns of a transcript for curation / SFT mining.

    Semantics: turns with no similarity edge to any sibling turn are
    unranked (absent), per the original paper's connected-graph setup. The
    PageRank base constant uses the GLOBAL node count (pagerank_int's
    contract); conversations are disjoint components so relative order
    within a conversation — the signal — is unaffected.

    Everything is int64 (shared-word counts, micro-unit ranks, floor
    division), so the DuckDB oracle unrolls the same ``iterations`` and
    matches hash-exactly; ``pos`` breaks rank ties by turn_idx.

    Plan shape: conversations are DISJOINT graph components, so the whole
    rank iteration runs vectorized inside ONE applyInPandas over conv_id —
    numpy int64 floor division replicating pagerank_int's update exactly
    (bit-identical output, asserted by tests). The generic join-per-round
    pagerank_int plan (3 eager checkpoints + 2 joins/round) cost ~8 s warm
    and ~20 s cold on the 1.4M-edge sf0.1 graph; this path is one shuffle
    after the edge build. The per-conv group size is bounded by the
    ``max_word_turn_df`` cap exactly as the old pair fan-out was.

    Returns ``DataFrame[conv_id, turn_idx, rank_micro: long, pos: int]``.
    """
    import numpy as np
    import pandas as pd

    scale, damping_num, damping_den = 1_000_000, 17, 20
    pairs = _turn_pair_weights(
        t, min_shared=min_shared, max_word_turn_df=max_word_turn_df
    ).localCheckpoint(eager=True)
    # global node count (pagerank_int's base-constant contract) — disjoint
    # components, so it must still be computed over the whole corpus
    n = (
        pairs.select("conv_id", F.col("ta").alias("ti"))
        .unionAll(pairs.select("conv_id", F.col("tb").alias("ti")))
        .distinct()
        .count()
    )
    schema = "conv_id string, turn_idx int, rank_micro long, pos int"
    if n == 0:
        return t.sparkSession.createDataFrame([], schema)
    base = (scale * (damping_den - damping_num)) // (damping_den * n)
    init = scale // n
    iters = iterations

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        ta = pdf["ta"].to_numpy(dtype=np.int64)
        tb = pdf["tb"].to_numpy(dtype=np.int64)
        w = pdf["w"].to_numpy(dtype=np.int64)
        src = np.concatenate([ta, tb])
        dst = np.concatenate([tb, ta])
        ww = np.concatenate([w, w])
        nodes, src_i = np.unique(src, return_inverse=True)
        dst_i = np.searchsorted(nodes, dst)  # symmetric graph: dst ⊆ nodes
        out_w = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(out_w, src_i, ww)
        r = np.full(len(nodes), init, dtype=np.int64)
        for _ in range(iters):
            c = (r[src_i] * ww) // out_w[src_i]
            s = np.zeros(len(nodes), dtype=np.int64)
            np.add.at(s, dst_i, c)
            r = base + (damping_num * s) // damping_den
        order = np.lexsort((nodes, -r))  # rank desc, turn_idx asc
        pos = np.empty(len(nodes), dtype=np.int32)
        pos[order] = np.arange(1, len(nodes) + 1, dtype=np.int32)
        return pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].iloc[0],
                "turn_idx": nodes.astype(np.int32),
                "rank_micro": r,
                "pos": pos,
            }
        )

    return pairs.groupBy("conv_id").applyInPandas(per_conv, schema)


def _hits_int_local(edges: DataFrame, iterations: int, scale: int) -> DataFrame:
    """Single-task HITS over a bounded aggregated edge list: all rows of
    the (already size-checked) edge table flow through one mapInPandas
    partition and the iteration runs in Python arbitrary-precision ints —
    the exact hugeint/decimal(38,0) arithmetic of the distributed path
    (same floor divisions, same greatest(tot, 1) guard), never a float."""
    import pandas as pd

    node_t = dict(edges.dtypes)["src"]
    schema = f"node {node_t}, hub_micro long, auth_micro long"

    def run(batches):
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        src = pdf["src"].tolist()
        dst = pdf["dst"].tolist()
        w = [int(x) for x in pdf["w"].tolist()]
        nodes = sorted(set(src) | set(dst))
        n = len(nodes)
        init = scale // n
        h = {v: init for v in nodes}
        a = {v: init for v in nodes}
        for _ in range(iterations):
            raw = {}
            for s, d, ww in zip(src, dst, w):
                raw[d] = raw.get(d, 0) + ww * h[s]
            tot = max(sum(raw.values()), 1)
            a = {v: (raw.get(v, 0) * scale) // tot for v in nodes}
            raw = {}
            for s, d, ww in zip(src, dst, w):
                raw[s] = raw.get(s, 0) + ww * a[d]
            tot = max(sum(raw.values()), 1)
            h = {v: (raw.get(v, 0) * scale) // tot for v in nodes}
        yield pd.DataFrame(
            {
                "node": nodes,
                "hub_micro": [h[v] for v in nodes],
                "auth_micro": [a[v] for v in nodes],
            }
        )

    return edges.coalesce(1).mapInPandas(run, schema)


def hits_int(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = 1_000_000,
    max_local_edges: int = 200_000,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM 1999) in integer
    micro-units — the link-analysis complement to pagerank_int for
    crawl-frontier scoring (a good HUB links to many good authorities;
    a good AUTHORITY is linked from many good hubs).

    Update per round, all int64:
        a'(v) = sum_{u->v} w(u,v) * h(u);  a(v) = a'(v)*scale DIV sum(a')
        h'(u) = sum_{u->v} w(u,v) * a(v);  h(u) = h'(u)*scale DIV sum(h')
    L1 normalization by floor division keeps every score in [0, scale]
    and is engine-exact; mass lost to floor() is deterministic spec.
    The normalizing sum is a 1-row aggregate joined back via crossJoin
    (broadcast) — no driver action inside the loop. raw*scale can pass
    int64 (raw ~ total_edge_weight * scale), so the normalization step
    runs in decimal(38,0): Spark's `div` on decimal is exact integral
    division and bit-matches DuckDB hugeint `//` (tested).

    Scale shape: like pagerank_int, each iteration is two join+groupBy
    passes over the aggregated edge list; for bucket graphs the edge
    table is O(buckets^2) regardless of corpus size. The edge list (and
    the node set) is localCheckpoint-ed ONCE — without it every unrolled
    iteration branch re-derives the edge lineage and the physical plan
    explodes (observed 1370 exchanges for 3 iterations over a
    parquet-derived edge list; 2 with truncation). Per-round score frames
    are NOT checkpointed: their lineage over the checkpointed edges grows
    only linearly in iterations, and eager per-round materialization
    measurably hurts large node sets (turn-level graphs).

    Bounded fast path: an aggregated edge list within ``max_local_edges``
    (every bucket graph — O(buckets^2) rows by construction) runs the whole
    iteration in ONE single-task mapInPandas stage using Python
    arbitrary-precision integers, which implement the hugeint contract
    exactly; 3 iterations over a 256-row bucket graph otherwise cost ~20
    fixed-overhead shuffle stages. Past the cap the generic distributed
    join loop below runs unchanged (turn-level / web-scale graphs).

    Returns ``DataFrame[node, hub_micro: long, auth_micro: long]``.
    """
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.count()
    if n_edges <= max_local_edges:
        return _hits_int_local(edges, iterations, scale)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    ).localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("hub_micro"),
            F.lit(0).cast("long").alias("auth_micro"),
        )
    init = scale // n
    hubs = nodes.withColumn("h", F.lit(init).cast("long"))
    auths = nodes.withColumn("a", F.lit(init).cast("long"))
    for _ in range(iterations):
        a_raw = (
            edges.join(hubs, edges["src"] == hubs["node"])
            # w*h and its sum in decimal(38,0): h reaches `scale` (1e6) and
            # total edge weight is unbounded at corpus scale, so an int64
            # sum wraps (non-ANSI) past ~9.2e12 total weight — the DuckDB
            # oracle sums in hugeint, so the whole path must be wide.
            .select(
                F.col("dst").alias("node"),
                (F.col("w").cast("decimal(38,0)") * F.col("h")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("raw"))
        )
        a_tot = a_raw.agg(F.sum("raw").alias("tot"))
        auths = (
            nodes.join(a_raw, "node", "left")
            .crossJoin(F.broadcast(a_tot))
            .select(
                "node",
                F.expr(
                    f"cast((cast(coalesce(raw, 0) as decimal(38,0)) * {scale})"
                    " div greatest(tot, 1) as bigint)"
                ).alias("a"),
            )
        )
        h_raw = (
            edges.join(auths, edges["dst"] == auths["node"])
            .select(
                F.col("src").alias("node"),
                (F.col("w").cast("decimal(38,0)") * F.col("a")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("raw"))
        )
        h_tot = h_raw.agg(F.sum("raw").alias("tot"))
        hubs = (
            nodes.join(h_raw, "node", "left")
            .crossJoin(F.broadcast(h_tot))
            .select(
                "node",
                F.expr(
                    f"cast((cast(coalesce(raw, 0) as decimal(38,0)) * {scale})"
                    " div greatest(tot, 1) as bigint)"
                ).alias("h"),
            )
        )
    return (
        hubs.join(auths, "node")
        .select(
            "node",
            F.col("h").alias("hub_micro"),
            F.col("a").alias("auth_micro"),
        )
    )


def link_prediction_scores(
    df: DataFrame,
    node_col: str = "tool",
    ctx_col: str = "conv_id",
    scale: int = 10**6,
    max_ctx_degree: int = 64,
) -> DataFrame:
    """Bipartite link-prediction scores between ``node_col`` values that
    co-occur in the same ``ctx_col`` context: common-neighbor count plus
    the Resource-Allocation index (Zhou, Lu & Zhang 2009) — the standard
    pair of local similarity predictors. RA down-weights promiscuous
    contexts: RA(a,b) = sum over shared contexts of 1/deg(ctx).

    The reference's institutional co-occurrence analytics stop at
    per-window counts (src/features/experimental/institutional_v2.rs:49-61);
    this is the pairwise-graph extension a recommendation/routing layer
    needs ("which tools predict each other").

    Engine-exactness: RA terms are FIXED-POINT integers ``scale div deg``
    (deg <= max_ctx_degree so the per-term error is the documented
    quantization, and sums are exact int64 — a pair would need ~9e12
    shared contexts to wrap).

    Scale shape: contexts are deduped to (ctx, node) once, context degree
    rides along from a groupBy of the SAME deduped relation, and contexts
    above ``max_ctx_degree`` distinct nodes are dropped BEFORE the
    within-context pair expansion (the TextRank stopword-cap lesson:
    quadratic fan-out must be bounded by construction, and the oracle
    mirrors the cap). Pair fan-out is therefore <= max_ctx_degree^2 per
    context; the joins shuffle on the context key, the final aggregate on
    the (a, b) pair.
    """
    nodes = (
        df.where(F.col(node_col).isNotNull())
        .select(F.col(ctx_col).alias("_ctx"), F.col(node_col).alias("_node"))
        .distinct()
    )
    deg = nodes.groupBy("_ctx").agg(F.count(F.lit(1)).alias("_deg"))
    bounded = nodes.join(
        deg.where((F.col("_deg") >= 2) & (F.col("_deg") <= int(max_ctx_degree))),
        "_ctx",
    )
    a, b = bounded.alias("la"), bounded.alias("lb")
    pairs = a.join(
        b,
        (F.col("la._ctx") == F.col("lb._ctx"))
        & (F.col("la._node") < F.col("lb._node")),
    ).select(
        F.col("la._node").alias("node_a"),
        F.col("lb._node").alias("node_b"),
        F.expr(f"cast({int(scale)} as bigint) div la._deg").alias("_ra_fp"),
    )
    return (
        pairs.groupBy("node_a", "node_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_ctx"),
            F.sum("_ra_fp").cast("long").alias("ra_fp"),
        )
    )


def word_adjacency_edges(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
) -> DataFrame:
    """Undirected word-adjacency edge list: canonical (least, greatest)
    consecutive-word pairs over the normalized corpus, self-pairs
    dropped, pruned to pairs seen >= ``min_count`` times. Pure JVM
    (split + slice + arrays_zip + explode) into one partial-aggregable
    groupBy; output is |co-occurring vocab pairs| rows — bounded by the
    pruned vocabulary, never by corpus size (the TextRank word-df
    lesson).

    Returns ``DataFrame[a: string, b: string, w: long]`` with a < b.
    """
    from ..operators.skew import fan_out_small_scan

    base = fan_out_small_scan(df).select(
        F.split(normalize_text(text_col), " ").alias("_w")
    )
    k = F.greatest(F.size(F.col("_w")) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(F.col("_w"), 1, k).alias("x"),
        F.slice(F.col("_w"), 2, k).alias("y"),
    )
    return (
        base.select(F.explode(pairs).alias("p"))
        .select(
            F.least("p.x", "p.y").alias("a"),
            F.greatest("p.x", "p.y").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .filter(F.col("w") >= int(min_count))
    )


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 3,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Fixed-round k-core peel (Seidman 1983; Batagelj & Zaversnik 2003)
    over an undirected edge list: round r removes every node whose degree
    within the current surviving subgraph is < k, then recomputes
    degrees. ``rounds`` is fixed and unrolled — the graph-curation
    analog of the repo's bounded-iteration rule (pagerank_int,
    hits_int): deterministic plan depth, no convergence-dependent
    lineage. With enough rounds this converges to the exact k-core;
    the per-node ``peel_round`` (1-indexed removal round, 0 = survived
    all rounds) is itself the useful curation signal — a coreness-style
    centrality used to keep well-connected vocabulary / drop stragglers.

    Engine-exactness: pure integer degree counts and set membership —
    any engine reproduces every row bit-identically.

    Scale shape: the edge list localCheckpoints ONCE (never per round —
    the graph-iteration lineage rule); each round is two left-semi joins
    (hash-partitioned on the node key) plus one partial-aggregable
    degree count over the shrinking edge set. No cross join, no Python.
    """
    from functools import reduce

    e = edges.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).localCheckpoint(eager=True)

    def degrees(ed: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
        inc = ed.select(F.col("a").alias("node")).union(
            ed.select(F.col("b").alias("node"))
        )
        d = inc.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("deg"))
        if nodes is None:
            return d
        return nodes.join(d, "node", "left").select(
            "node", F.coalesce("deg", F.lit(0)).cast("long").alias("deg")
        )

    deg0 = degrees(e).localCheckpoint(eager=True)
    surv = deg0
    cur_e = e
    peeled_frames = []
    for r in range(1, int(rounds) + 1):
        peeled_frames.append(
            surv.filter(F.col("deg") < k).select(
                "node", F.lit(r).cast("int").alias("peel_round")
            )
        )
        keep = surv.filter(F.col("deg") >= k).select("node")
        # NOTE(r6): broadcast-hinting the keep/degree/peeled node frames
        # measured SLOWER than the shuffle joins (each broadcast build
        # re-executes its growing per-round lineage; shuffle exchanges are
        # reused across rounds) — hints removed after A/B.
        cur_e = cur_e.join(
            keep.withColumnRenamed("node", "a"), "a", "leftsemi"
        ).join(keep.withColumnRenamed("node", "b"), "b", "leftsemi")
        surv = degrees(cur_e, keep)
    peeled = reduce(DataFrame.union, peeled_frames)
    return (
        deg0.select("node", F.col("deg").alias("deg0"))
        .join(peeled, "node", "left")
        .select(
            "node",
            "deg0",
            F.coalesce("peel_round", F.lit(0)).cast("int").alias("peel_round"),
        )
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    a_col: str = "a",
    b_col: str = "b",
    w_col: str = "w",
) -> DataFrame:
    """Fixed-round synchronous label propagation (Raghavan 2007) over an
    undirected weighted edge list — the community-detection sibling of
    pagerank_int / kcore_peel in the graph-curation family (the
    reference's graph analog is the order-book "level community" of
    src/features/mbo_features/order_tracker.rs; here communities group
    co-occurring vocabulary / tools for curation and topic rollups).

    Every node starts labeled with itself; each synchronous round a node
    adopts the label with the greatest total incident edge weight among
    its neighbors' current labels, ties broken by the lexicographically
    SMALLEST label — fully deterministic, no RNG, no convergence test
    (bounded plan depth, the bounded-iteration rule shared by
    pagerank_int/hits_int/kcore_peel). Fixed rounds make synchronous
    oscillation harmless: the output is a pure function of the input.

    Engine-exactness: integer weight sums + (sum DESC, label ASC)
    argmax — any engine reproduces every row bit-identically.

    Scale shape: the directed edge view localCheckpoints ONCE (the
    graph-iteration lineage rule, see MEMORY); each round is one
    hash join on the destination node + one partial-aggregable
    (node, label) weight sum + one per-node top-1 window — all keyed on
    the node column, no cross join, no Python. Frame sizes are bounded
    by |edges| and |nodes| (vocab-pair bounded upstream), never corpus
    rows.

    Returns ``DataFrame[node: string, community: string]``.
    """
    e = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"),
                     F.col(w_col).cast("long").alias("w"))
        .union(
            edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"),
                         F.col(w_col).cast("long").alias("w"))
        )
    ).localCheckpoint(eager=True)
    labels = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("community")
    )
    for _ in range(int(rounds)):
        # NOTE(r6): measured variants — broadcast-hinting the label table
        # and/or replacing the top-1 window with a min-struct aggregate
        # were all SLOWER here (broadcast builds re-execute the growing
        # label lineage each round; the shuffle form reuses exchanges).
        # The original join + window stays.
        scored = (
            e.join(labels, e["dst"] == labels["node"])
            .select(F.col("src"), F.col("community").alias("lab"), F.col("w"))
            .groupBy("src", "lab")
            .agg(F.sum("w").alias("s"))
        )
        win = Window.partitionBy("src").orderBy(F.col("s").desc(), F.col("lab").asc())
        labels = (
            scored.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") == 1)
            .select(F.col("src").alias("node"), F.col("lab").alias("community"))
        )
    return labels


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    w_col: str = "w",
    node_col: str = "node",
    community_col: str = "community",
) -> DataFrame:
    """Newman modularity Q of a community assignment over an undirected
    weighted edge list — the quality meter for label_propagation (as
    ari / v_measure grade the certified k-means): "how much better than
    chance do these communities capture the edge mass". Complements the
    structural fingerprints (triangle_stats, kcore_peel, assortativity)
    with an assignment-conditional score.

    Exact integer form: with the directed view (both orientations),
    M = 2m = total directed weight, deg_c = total strength of nodes in
    community c, in_c = directed weight with BOTH endpoints in c,

        Q = sum_c (in_c/M - (deg_c/M)^2)
          = [ sum_c (in_c * M - deg_c^2) ] / M^2.

    The numerator is summed as exact decimal(38,0) integers (hugeint on
    the oracle side); the release is ONE signed trunc division
    q_micro = (1e6 * num) div M^2 — both engines truncate toward zero
    (similarity.py:878 convention), so the result is bit-identical.

    Scale shape: two node-keyed broadcast-able joins decorating each
    directed edge with its endpoint communities, one partial-aggregable
    per-community sum, one 1-row broadcast of M. Everything is bounded
    by |edges| and |communities| — never corpus rows. No Python stages.

    Returns one row ``(m2, n_communities, in_total, q_micro)``.
    """
    e = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst"),
        F.col(w_col).cast("long").alias("w"),
    )
    e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
    lab = labels.select(
        F.col(node_col).alias("_n"), F.col(community_col).alias("_c")
    )
    dec = (
        e.join(lab.select(F.col("_n").alias("src"), F.col("_c").alias("c_src")), "src")
        .join(lab.select(F.col("_n").alias("dst"), F.col("_c").alias("c_dst")), "dst")
    )
    per_c = dec.groupBy("c_src").agg(
        F.sum("w").cast("decimal(38,0)").alias("deg_c"),
        F.sum(F.when(F.col("c_src") == F.col("c_dst"), F.col("w")).otherwise(F.lit(0)))
        .cast("decimal(38,0)")
        .alias("in_c"),
    )
    m_row = per_c.agg(F.sum("deg_c").cast("decimal(38,0)").alias("m2_d"))
    out = (
        per_c.crossJoin(F.broadcast(m_row))
        .agg(
            F.max("m2_d").alias("m2_d"),
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.sum("in_c").cast("decimal(38,0)").alias("in_d"),
            F.sum(F.col("in_c") * F.col("m2_d") - F.col("deg_c") * F.col("deg_c"))
            .cast("decimal(38,0)")
            .alias("num"),
        )
    )
    return out.select(
        F.col("m2_d").cast("long").alias("m2"),
        "n_communities",
        F.col("in_d").cast("long").alias("in_total"),
        F.expr("cast((num * 1000000) div (m2_d * m2_d) as bigint)").alias("q_micro"),
    )


def degree_assortativity(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Degree assortativity (Newman 2002) of an undirected edge list:
    the Pearson correlation of endpoint degrees over both orientations
    of every edge — positive when hubs attach to hubs (social-network
    shape), negative when hubs attach to leaves (star/boilerplate
    shape); the one-row structural fingerprint that complements
    triangle_stats (local clustering) and kcore_peel (coreness).

    Released as the SIGNED SQUARE r2_signed = sign(num)·num²/(vx·vy)
    (the cross_correlation convention): moments are exact decimal(38,0)
    integers, the release is one fixed-operand-order IEEE expression, and
    |r| = sqrt(|r2|) is recoverable by any consumer — sqrt never crosses
    an engine boundary.

    Scale shape: one degree count over the edge list (partial-agg), two
    node-keyed joins decorating each orientation with its endpoint
    degrees, ONE 6-moment global aggregate. Everything is bounded by
    |edges|, never corpus rows.

    Returns one row: (m2 = 2|E|, sx, sxx, sxy, r2_signed_raw).
    """
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    both = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = both.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    dx = deg.select(F.col("node").alias("a"), F.col("deg").alias("x"))
    dy = deg.select(F.col("node").alias("b"), F.col("deg").alias("y"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    m = both.join(dx, "a").join(dy, "b").agg(
        F.count(F.lit(1)).cast("long").alias("m2"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(dec("x") * dec("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dec("x") * dec("y")).cast("decimal(38,0)").alias("sxy"),
    )
    # both orientations make x/y exchangeable: sy = sx, syy = sxx
    num = F.expr("cast(m2 as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sx")
    vx = F.expr("cast(m2 as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx")
    withm = m.withColumn("_num", num).withColumn("_vx", vx)
    r2 = F.when(
        F.col("_vx") > 0,
        F.signum(F.col("_num").cast("double"))
        * (F.col("_num") * F.col("_num")).cast("double")
        / (F.col("_vx") * F.col("_vx")).cast("double"),
    ).otherwise(F.lit(0.0))
    return withm.select(
        "m2", "sx",
        F.col("sxx").cast("long").alias("sxx"),
        F.col("sxy").cast("long").alias("sxy"),
        r2.alias("r2_signed_raw"),
    )


def markov_stationary(
    edges: DataFrame,
    iterations: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
) -> DataFrame:
    """Stationary distribution of the Markov chain defined by a weighted
    transition-count edge list, by fixed-round power iteration in exact
    ppm fixed point — the long-run occupancy companion to markov_loglik
    (which scores sequences against the SAME transition matrix): "what
    fraction of turns does the chain spend in each role/tool state as
    conversations run long".

    Spec, all integer: row-stochastic matrix p_ij = (c_ij * 1e6) div c_i
    (trunc); v_0 = 1e6 div R over the R source states; each round
    v_j <- (sum_i v_i * p_ij) div 1e6 — the sum is exact int64/decimal,
    ONE trunc division per state per round, so both engines reproduce
    every ppm bit-for-bit (mass lost to flooring is part of the
    deterministic spec, as in pagerank_int). States with no outgoing
    edges simply absorb nothing (their column receives mass only via
    p_ij); fixed ``iterations`` = bounded plan depth.

    Scale shape: the transition matrix is |states|^2 rows (states =
    roles/tools — tiny, a documented bound), so after Spark reduces the
    corpus to the aggregated edge list, the matrix is COLLECTED and the
    fixed-round power iteration runs on the driver in exact Python
    integers (arbitrary precision — a strict superset of the
    decimal(38,0) spec; floor division on the non-negative operands is
    the identical trunc division). One Spark job replaces 3
    localCheckpoints + per-round joins; the released ppm values are
    bit-identical by the all-integer spec.

    Returns ``DataFrame[state: string, pi_ppm: long]``.
    """
    spark = edges.sparkSession
    e_df = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
        F.col(w_col).cast("long").alias("c"),
    )
    state_type = e_df.schema["src"].dataType.simpleString()
    e = [(r["src"], r["dst"], int(r["c"])) for r in e_df.collect()]
    schema = f"state {state_type}, pi_ppm long"
    if not e:
        return spark.createDataFrame([], schema=schema)
    c_src: dict = {}
    for s, _d, c in e:
        c_src[s] = c_src.get(s, 0) + c
    pmat = [(s, d, (c * 1_000_000) // c_src[s]) for s, d, c in e]
    states = sorted({s for s, _, _ in e} | {d for _, d, _ in e})
    r = len(states)
    v = {s: 1_000_000 // r for s in states}
    for _ in range(int(iterations)):
        acc: dict = {}
        for s, d, p in pmat:
            acc[d] = acc.get(d, 0) + v[s] * p
        v = {s: acc.get(s, 0) // 1_000_000 for s in states}
    return spark.createDataFrame([(s, v[s]) for s in states], schema=schema)


def markov_entropy_rate(
    edges: DataFrame,
    iterations: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
) -> DataFrame:
    """Entropy rate of the Markov chain, H = −Σ_ij π_i p_ij ln p_ij — the
    predictability meter over the same transition matrix as
    markov_loglik / markov_stationary: low H means conversations follow
    rigid role/tool scripts (templated agents), high H means varied
    flows; THE one-number summary for comparing corpus sources'
    interaction diversity.

    Exactness: p_ij in exact ppm (trunc div), π from markov_stationary's
    exact ppm iteration, ln(p_ij/1e6) quantized to integer nanos PER
    DISTINCT EDGE before any multiplication (zipf_fit convention), the
    occupancy product t_ij = (π_i·p_ij) div 1e6 an exact trunc division
    — so the sum Σ t_ij·q_ij is an exact integer in any order and
    h_nanos = (−Σ) div 1e6 releases bit-identically on both engines.

    Scale shape: the |states|² matrix frame plus markov_stationary's
    bounded rounds; after Spark reduces the corpus to the aggregated
    edge list, the whole chain (matrix, stationary rounds, entropy sum)
    finishes on the driver exactly like markov_stationary above — exact
    Python integers, the identical ln quantization (floor(ln(p/1e6)·1e9
    + 0.5) per DISTINCT EDGE before any multiplication), one Spark job
    total.

    Returns one row: (n_states, n_edges, h_nanos: long).
    """
    import math

    spark = edges.sparkSession
    e = [
        (r["src"], r["dst"], int(r["c"]))
        for r in edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
            F.col(w_col).cast("long").alias("c"),
        ).collect()
    ]
    schema = "n_states long, n_edges long, h_nanos long"
    c_src: dict = {}
    for s, _d, c in e:
        c_src[s] = c_src.get(s, 0) + c
    pmat = [(s, d, (c * 1_000_000) // c_src[s]) for s, d, c in e]
    states = sorted({s for s, _, _ in e} | {d for _, d, _ in e})
    r = len(states)
    if r == 0:
        return spark.createDataFrame([(0, 0, None)], schema=schema)
    v = {s: 1_000_000 // r for s in states}
    for _ in range(int(iterations)):
        acc: dict = {}
        for s, d, p in pmat:
            acc[d] = acc.get(d, 0) + v[s] * p
        v = {s: acc.get(s, 0) // 1_000_000 for s in states}
    # p_ppm == 0 cells (c_src > 1e6*c at extreme skew) contribute 0 in the
    # x*ln(x) limit — filtered on BOTH engines, never fed to ln
    total = 0
    n_edges = 0
    for s, _d, p in pmat:
        if p > 0:
            t = (v[s] * p) // 1_000_000
            q = math.floor(math.log(p / 1e6) * 1e9 + 0.5)
            total += t * q
            n_edges += 1
    h_nanos = (0 - total) // 1_000_000 if n_edges else None
    return spark.createDataFrame([(r, n_edges, h_nanos)], schema=schema)


def bfs_hops(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    weight_col: str | None = None,
    max_depth: int = 4,
) -> DataFrame:
    """Single-source BFS hop distances from a deterministic seed — the
    reachability/diameter probe of the graph family (pagerank answers
    "how central", k-core "how dense"; this answers "how far").

    The seed is the max-weighted-degree node (ties → node asc): an
    argmax over the degree aggregate, never a user-supplied magic id,
    so the query is self-contained and reproducible. Frontier expansion
    runs ``max_depth`` unrolled rounds: neighbors of the current layer,
    LEFT ANTI against everything already labeled — first visit IS the
    minimum hop count, so no min-aggregation pass is needed. Every
    frame is node-bounded (the edge list is the largest relation —
    node-keyed equi joins only, no cartesian); each layer is
    localCheckpoint-ed to keep the unrolled lineage flat, the
    label-propagation / kcore precedent.

    Unreached nodes are absent from the output (the caller left-joins
    the node frame if "infinite" rows are wanted). DuckDB twin: one
    WITH RECURSIVE over the same undirected adjacency with dist <
    max_depth, min(dist) per node.

    Reference analog: workflow-graph diagnostics over the tool-usage
    projection (SURVEY §2 graph family).
    """
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    directed = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst"), w.alias("w")
    )
    und = directed.union(
        directed.select(F.col("dst").alias("src"),
                        F.col("src").alias("dst"), "w")
    )
    adj = und.select("src", "dst").distinct().localCheckpoint(eager=False)
    deg = und.groupBy("src").agg(F.sum("w").alias("dw"))
    seed = deg.orderBy(F.col("dw").desc(), F.col("src").asc()).limit(1)
    dist = seed.select(
        F.col("src").alias("node"), F.lit(0).cast("long").alias("dist")
    ).localCheckpoint(eager=False)
    for d in range(max_depth):
        frontier = dist.where(F.col("dist") == d)
        nxt = (
            frontier.join(adj, frontier["node"] == adj["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(d + 1).cast("long").alias("dist"))
        )
        dist = dist.union(nxt).localCheckpoint(eager=False)
    return dist


def moran_geary(
    edges: DataFrame,
    nodes: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    id_col: str = "id",
    x_col: str = "x",
) -> DataFrame:
    """Moran's I and Geary's C network autocorrelation of a node
    attribute over a weighted undirected edge list (edges given once
    per unordered pair) — "do connected nodes carry similar values":
    I > 0 assortative attribute mixing, C < 1 the local-difference
    view of the same question (Geary weights local pairs, Moran the
    global covariance — they can disagree on hub-dominated graphs).

    Cleared integers end to end: u_i = n·x_i − S makes both statistics
    ratios of exact decimal(38,0)/hugeint terms —
    I = n·P/(W_h·U) with P = Σ_pairs w·u_a·u_b (signed) and
    C = (n−1)·Q/(2·W_h·U) with Q = Σ_pairs w·(u_a−u_b)², where
    W_h = Σ_pairs w and U = Σu² (every n-power cancels); released as
    SIGNED micro trunc divisions (both engines truncate toward zero);
    NULL when U = 0 (constant attribute) or W_h = 0.

    Scale shape: one node aggregate (n, S) broadcast back; two joins
    of the edge list to the node-u frame on the node key; one
    map-side-combinable reduction. Edge list is O(|nodes|²) at worst,
    never O(rows).

    Returns one row: (n_nodes, w_half, moran_micro, geary_micro).
    """
    nd = nodes.select(F.col(id_col).alias("_id"), F.col(x_col).cast("long").alias("_x"))
    tot = nd.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_x").cast("long").alias("_s"),
    )
    u = nd.crossJoin(F.broadcast(tot)).select(
        "_id",
        "_n",
        (F.col("_n") * F.col("_x") - F.col("_s")).cast("decimal(38,0)").alias("_u"),
    )
    ua = u.select(F.col("_id").alias("_ida"), F.col("_u").alias("_ua"), "_n")
    ub = u.select(F.col("_id").alias("_idb"), F.col("_u").alias("_ub"))
    e = (
        edges.select(
            F.col(src_col).alias("_ida"),
            F.col(dst_col).alias("_idb"),
            F.col(w_col).cast("long").alias("_w"),
        )
        .join(ua, "_ida")
        .join(ub, "_idb")
    )
    usum = u.agg(F.sum(F.col("_u") * F.col("_u")).cast("decimal(38,0)").alias("uu"))
    agg = e.agg(
        F.max("_n").cast("long").alias("n"),
        F.sum("_w").cast("decimal(38,0)").alias("wh"),
        F.sum(F.col("_w") * F.col("_ua") * F.col("_ub"))
        .cast("decimal(38,0)").alias("p"),
        F.sum(
            F.col("_w") * (F.col("_ua") - F.col("_ub"))
            * (F.col("_ua") - F.col("_ub"))
        ).cast("decimal(38,0)").alias("q"),
    ).crossJoin(F.broadcast(usum))
    ok = (F.col("uu") > 0) & (F.col("wh") > 0)
    return agg.select(
        F.col("n").alias("n_nodes"),
        F.col("wh").cast("long").alias("w_half"),
        F.when(ok, F.expr("cast((n * p * 1000000) div (wh * uu) as bigint)"))
        .alias("moran_micro"),
        F.when(
            ok,
            F.expr("cast(((n - 1) * q * 1000000) div (2 * wh * uu) as bigint)"),
        ).alias("geary_micro"),
    )


def rich_club(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    ks: tuple = (1, 2, 4, 8),
) -> DataFrame:
    """Rich-club coefficient phi(k) (Colizza et al. 2006, unnormalized)
    of an undirected simple edge list: among the nodes with degree > k,
    what fraction of the possible links actually exist? Rising phi(k)
    means hubs form a tightly-wired club (the workflow-core question for
    the tool co-usage graph: do the most-connected tools interlock, or
    does each hub serve its own spoke set?) — the density-by-elite
    readout that degree_assortativity's single correlation cannot show.

    phi_ppm(k) = 2 * E_{>k} * 1e6 // (N_{>k} * (N_{>k} - 1)) — exact
    integer counts, one floor division per k on nonnegative operands,
    NULL when fewer than 2 nodes clear the threshold.

    Scale shape: one degree count over the edge list (partial-agg), two
    node-keyed joins decorating each edge with endpoint degrees, then a
    CONSTANT |ks|-fold explode of the decorated edge/node frames into
    one groupBy(k) each — shuffles bounded by |edges| * |ks|, never
    corpus rows; no threshold ever re-scans the input.

    Returns one row per k: (k, n_nodes, n_edges, phi_ppm), k ascending.
    """
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    both = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = both.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    karr = F.array(*[F.lit(int(k)) for k in sorted(ks)])
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    ek = (
        e.join(da, "a").join(db, "b")
        .select(
            F.explode(karr).alias("k"),
            F.least("deg_a", "deg_b").alias("mind"),
        )
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("mind") > F.col("k"), 1).otherwise(0))
            .cast("long").alias("n_edges")
        )
    )
    nk = (
        deg.select(F.explode(karr).alias("k"), "deg")
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("deg") > F.col("k"), 1).otherwise(0))
            .cast("long").alias("n_nodes")
        )
    )
    return (
        nk.join(ek, "k")
        .select(
            F.col("k").cast("long").alias("k"),
            "n_nodes",
            "n_edges",
            F.when(
                F.col("n_nodes") >= 2,
                F.expr(
                    "cast((2 * n_edges * cast(1000000 as bigint))"
                    " div (n_nodes * (n_nodes - 1)) as bigint)"
                ),
            ).alias("phi_ppm"),
        )
        .orderBy("k")
    )
