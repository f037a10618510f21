"""Conversation prefix-fork detection: find conversations that share an
identical (role, text) turn prefix — the transcript-native form of rollout
dedup. Agent-training corpora are full of branched sampling (many rollouts
regenerated from one prompt prefix); training on every branch over-weights
the shared prefix, so a curation pipeline needs to FIND the fork points and
keep one representative per shared prefix.

Construction (all JVM-side, one window sort per conversation):

1. ``turn_digest`` = md5 of the (role, text) pair — 32 hex chars per turn,
   so everything downstream shuffles fixed-width digests, never text.
2. ``prefix_digest`` = md5 of the concatenated turn digests over the
   cumulative stable-order frame. Rows within a window frame arrive in the
   frame's ORDER BY order, so ``concat_ws('', collect_list(...))`` is the
   deterministic running fingerprint of the whole prefix — equal prefixes
   (as (role, text) sequences) get equal digests, and md5 collisions are
   the only false-merge source (2^-64 birthday at corpus scale).
3. Fork groups: group by (prefix_len, prefix_digest); a group with >= 2
   conversations is a fork — every member shares the same first
   ``prefix_len`` turns verbatim.

Scale shape: the cumulative digest is the SAME partitionBy(conv_id) sort
every other per-conversation operator rides (one shuffle, reused); the
fork group-by shuffles (int, 32-byte digest) pairs only. Memory per row is
bounded by prefix length x 32 bytes inside the collect_list frame — for
mega-conversations route through operators/skew first or cap ``max_depth``
(forks in practice live in the first few turns; depth-capping both bounds
the frame and drops the uninteresting deep tail).

Reference analog: the reference dedups identical event streams at ingest
(src/pipeline.rs dedup pass); transcript prefix forks are the
conversation-shaped generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from .ordering import stable_window as _stable_window


def with_prefix_digests(
    df: DataFrame, cfg: PipelineConfig, max_depth: int | None = None
) -> DataFrame:
    """Add ``turn_digest`` and the running ``prefix_digest`` per turn.

    ``max_depth`` (optional) keeps only turns with turn_idx < max_depth —
    bounding the collect_list frame for skew safety when only shallow fork
    points are wanted.
    """
    idx = cfg.order_cols[0]
    base = df
    if max_depth is not None:
        base = base.filter(F.col(idx) < F.lit(int(max_depth)))
    w = (
        _stable_window(cfg)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    turn_digest = F.md5(
        F.concat_ws("\x1f", F.col("role"), F.coalesce(F.col("text"), F.lit("")))
    )
    return base.withColumn("turn_digest", turn_digest).withColumn(
        "prefix_digest",
        F.md5(F.concat_ws("", F.collect_list("turn_digest").over(w))),
    )


def fork_groups(
    df: DataFrame, cfg: PipelineConfig, max_depth: int | None = None
) -> DataFrame:
    """Shared-prefix groups: one row per (prefix_len, prefix_digest) held by
    >= 2 conversations, with the member count and the minimum conv_id as the
    canonical representative (the keeper under keep-first dedup)."""
    p = with_prefix_digests(df, cfg, max_depth=max_depth)
    return (
        p.groupBy(
            (F.col(cfg.order_cols[0]) + 1).cast("int").alias("prefix_len"),
            F.col("prefix_digest"),
        )
        .agg(
            F.count("*").cast("long").alias("n_convs"),
            F.min(cfg.key_col).alias("keep_conv_id"),
        )
        .filter(F.col("n_convs") >= 2)
    )


def fork_depth_profile(
    df: DataFrame, cfg: PipelineConfig, max_depth: int | None = None
) -> DataFrame:
    """Per prefix depth: how many distinct prefixes exist, how many
    conversations reach that depth, and how many of them sit inside a fork
    (share their full prefix with another conversation). The fork-rate
    curve by depth is the tuning view for choosing a dedup depth cap."""
    p = with_prefix_digests(df, cfg, max_depth=max_depth)
    g = p.groupBy(
        (F.col(cfg.order_cols[0]) + 1).cast("int").alias("prefix_len"),
        F.col("prefix_digest"),
    ).agg(F.count("*").cast("long").alias("n_convs"))
    return (
        g.groupBy("prefix_len")
        .agg(
            F.count("*").cast("long").alias("n_prefixes"),
            F.sum("n_convs").cast("long").alias("n_convs"),
            F.sum(
                F.when(F.col("n_convs") >= 2, F.col("n_convs")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_forked_convs"),
        )
    )


def fork_dedup_keep(
    df: DataFrame, cfg: PipelineConfig, depth: int
) -> DataFrame:
    """Keep-one-per-fork at a fixed prefix depth: conversations whose
    full depth-``depth`` prefix is shared keep only the minimum conv_id;
    conversations shorter than ``depth`` or with a unique prefix all
    survive. Returns (conv_id, keep) — join back to filter the corpus."""
    key = cfg.key_col
    p = with_prefix_digests(df, cfg, max_depth=depth)
    at_depth = p.filter(
        F.col(cfg.order_cols[0]) == F.lit(int(depth) - 1)
    ).select(key, "prefix_digest")
    ranked = at_depth.withColumn(
        "keep",
        (
            F.row_number().over(
                Window.partitionBy("prefix_digest").orderBy(key)
            )
            == 1
        ),
    ).select(key, "keep")
    # every conversation WITHOUT a row exactly at depth-1 (shorter than
    # depth, or a sparse turn_idx with a gap there) has no rankable prefix
    # and survives — anti-join, not a max() predicate, so gapped index
    # sequences are kept too
    rest = (
        df.select(key)
        .distinct()
        .join(at_depth.select(key), key, "left_anti")
        .select(key, F.lit(True).alias("keep"))
    )
    return ranked.unionByName(rest)


def dpo_pairs(
    df: DataFrame,
    cfg: PipelineConfig,
    depth: int = 1,
    value_col: str = "value",
) -> DataFrame:
    """Preference-pair construction from forked rollouts: conversations that
    share the same ``depth``-turn prefix are alternative continuations of
    one prompt; rank them by an outcome score and pair the best against
    each sibling — the transcript-native DPO/RLHF dataset builder.

    Scoring is EXACT integer cents (floor(value*100+0.5) summed over the
    continuation turns, turn_idx >= depth), so ranking and margins are
    order-independent and engine-exact; ties break on conv_id for
    determinism. Output: one row per (chosen, rejected) sibling pair with
    both scores and the margin.

    Plan shape: the prefix digest rides the shared conv-keyed window sort;
    scores are one grouped aggregate; ranking shuffles (digest, conv_id,
    score) triples only; the rank-1 (chosen) row is broadcast to its
    siblings by a first_value over the SAME ordered window — no self-join,
    one exchange on prefix_digest. A fork group of k rollouts emits k-1
    rows, never k^2.
    """
    key = cfg.key_col
    p = with_prefix_digests(df, cfg, max_depth=depth)
    at_depth = p.filter(
        F.col(cfg.order_cols[0]) == F.lit(int(depth) - 1)
    ).select(key, "prefix_digest")
    cont = (
        df.filter(F.col(cfg.order_cols[0]) >= F.lit(int(depth)))
        .groupBy(key)
        .agg(
            F.sum(F.floor(F.col(value_col) * F.lit(100.0) + F.lit(0.5)))
            .cast("long")
            .alias("score_cents"),
            F.count("*").cast("long").alias("cont_turns"),
        )
    )
    members = at_depth.join(cont, key)
    w = Window.partitionBy("prefix_digest").orderBy(
        F.col("score_cents").desc(), F.col(key)
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        members.withColumn("rk", F.row_number().over(w))
        .withColumn("chosen_conv_id", F.first(key).over(wcum))
        .withColumn("chosen_score_cents", F.first("score_cents").over(wcum))
        .filter(F.col("rk") > 1)
        .select(
            "prefix_digest",
            "chosen_conv_id",
            "chosen_score_cents",
            F.col(key).alias("rejected_conv_id"),
            F.col("score_cents").alias("rejected_score_cents"),
            (F.col("chosen_score_cents") - F.col("score_cents"))
            .cast("long")
            .alias("margin_cents"),
        )
    )


def sft_loss_spans(
    transcripts: DataFrame,
    cfg: PipelineConfig | None = None,
    budget: int = 1024,
    loss_role: str = "assistant",
) -> DataFrame:
    """Per-turn loss-mask spans for SFT sample packing: each conversation
    becomes one training sequence (turns concatenated in stable order),
    and the trainer masks loss to the tuned role's tokens only — the
    universal SFT preprocessing step between sft_pairs (what to train on)
    and pack_token_stream (how to pack it).

    Emits, per turn: its whitespace token count, its [span_start,
    span_end) slice of the conversation's packed sequence CLIPPED to the
    ``budget``-token truncation every trainer applies, the 0/1 loss mask
    (role == ``loss_role``), and loss_tokens = mask * clipped width — so
    a downstream packer can materialize mask vectors, and a curation
    audit can aggregate "how many loss tokens does this corpus actually
    contain after truncation" (the number that sizes an SFT run).

    Exactness: whitespace token counts and cumulative offsets are int64;
    clipping is least() arithmetic — no floats anywhere. Scale shape: ONE
    window cascade on the same partitionBy(conv_id).orderBy(turn_idx, ts)
    sort every per-conversation operator shares (single exchange + sort);
    no joins, no Python stages. Truncation means rows past the budget
    emit zero-width spans instead of disappearing — the audit still sees
    every turn (count-preserving, join-safe back to the source).

    Reference analog: the reference's SequenceBuilder emits fixed-length
    windows with label alignment (src/pipeline/sequence_builder.rs); this
    is the transcript-native twin where the "label" is the loss mask.
    """
    from ..functions.text import token_count_ws

    cfg = cfg or PipelineConfig()
    w = _stable_window(cfg).rowsBetween(Window.unboundedPreceding, -1)
    t = transcripts.withColumn("_nt", token_count_ws("text")).withColumn(
        "_off", F.coalesce(F.sum("_nt").over(w), F.lit(0))
    )
    b = F.lit(int(budget)).cast("long")
    start = F.least(F.col("_off"), b)
    end = F.least(F.col("_off") + F.col("_nt"), b)
    mask = (F.col("role") == loss_role).cast("int")
    return t.select(
        "conv_id",
        "turn_idx",
        "role",
        F.col("_nt").cast("long").alias("n_tokens"),
        start.cast("long").alias("span_start"),
        end.cast("long").alias("span_end"),
        mask.alias("mask"),
        (mask.cast("long") * (end - start)).cast("long").alias("loss_tokens"),
    )
