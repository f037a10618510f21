"""Sequence building — sliding tensor windows over sampled feature rows.

Reference: src/sequence_builder/builder.rs:501-588 (bounded deque, emit the
trailing `window` rows every `stride` pushes, Arc zero-copy) and the
multi-scale variant src/sequence_builder/multiscale.rs (decimation d keeps
every d-th sample, three parallel builders share the vectors).

Spark restatement (SURVEY §2.6): no bounded buffer, no backpressure — a
sequence exists for every anchor row where
    (sample_pos - (window-1)) % stride == 0  and  sample_pos >= window-1,
and its content is collect_list over the trailing frame. The engine keeps
features as named columns until this point and packs arrays only here (late
materialization — the Arc-analog: nothing is copied until a sequence is
actually emitted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from . import ordering


def build_sequences(
    df: DataFrame,
    cfg: PipelineConfig,
    feature_cols: list[str],
    window: int | None = None,
    stride: int | None = None,
    decimation: int = 1,
) -> DataFrame:
    """Emit one row per sequence anchor:
    (key, end_turn_idx, seq_pos, start_ts, end_ts, duration_s, seq_len,
     sequence: array<array<double>> [window x F]).

    ``decimation`` keeps every d-th sample before windowing (multi-scale
    path, reference: multiscale.rs:86-135).
    """
    window = cfg.seq_window if window is None else window
    stride = cfg.seq_stride if stride is None else stride

    pos = F.row_number().over(ordering.stable_window(cfg)) - 1
    df = df.withColumn("_pos", pos)
    if decimation > 1:
        df = df.filter(F.pmod("_pos", F.lit(decimation)) == 0)
        df = df.withColumn("_pos", F.row_number().over(ordering.stable_window(cfg)) - 1)

    fr = ordering.trailing(cfg, window)
    vec = F.array(*[F.col(c) for c in feature_cols])
    us = ordering.epoch_us(cfg.ts_col)

    seq = df.select(
        F.col(cfg.key_col),
        F.col("turn_idx").alias("end_turn_idx"),
        F.col("_pos").alias("seq_pos"),
        F.collect_list(vec).over(fr).alias("sequence"),
        F.min(F.col(cfg.ts_col)).over(fr).alias("start_ts"),
        F.max(F.col(cfg.ts_col)).over(fr).alias("end_ts"),
        ((F.max(us).over(fr) - F.min(us).over(fr)) / 1e6).cast("double").alias("duration_s"),
    )
    seq = seq.withColumn("seq_len", F.size("sequence"))
    # emit rule: complete window AND stride phase (reference counts pushes
    # since last emit == fixed phase for an uninterrupted stream,
    # builder.rs:545-588)
    return seq.filter(
        (F.col("seq_pos") >= window - 1)
        & (F.pmod(F.col("seq_pos") - (window - 1), F.lit(stride)) == 0)
    )


def build_multiscale_sequences(
    df: DataFrame,
    cfg: PipelineConfig,
    feature_cols: list[str],
    window: int | None = None,
    stride: int | None = None,
) -> DataFrame:
    """Three decimation scales unioned with a scale tag (reference defaults
    d in {1,2,4}, multiscale.rs:183-189) — three cheap derived DataFrames
    over the same input, one shuffle each on the already-keyed data."""
    parts = []
    for d in cfg.multiscale_decimation:
        s = build_sequences(df, cfg, feature_cols, window=window, stride=stride, decimation=d)
        parts.append(s.withColumn("scale", F.lit(d)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def horizon_aware_params(
    horizon: int,
    base_lookback: int = 64,
    scale: float = 2.0,
    min_lookback: int = 16,
    max_lookback: int = 512,
    target_len: int = 32,
) -> tuple[int, int]:
    """lookback = clamp(max(base, h*scale), min, max); stride = lookback/target
    (reference: src/sequence_builder/horizon_aware.rs:289-295). Pure config
    arithmetic."""
    lookback = int(max(base_lookback, horizon * scale))
    lookback = max(min_lookback, min(max_lookback, lookback))
    stride = max(1, lookback // target_len)
    return lookback, stride


def context_window(df: DataFrame, cfg: PipelineConfig,
                   token_budget: int = 256,
                   token_col: Column | None = None) -> DataFrame:
    """Token-budgeted context assembly: mark the largest SUFFIX of each
    conversation whose total tokens fit the budget — the prompt-window
    selection rule of transcript training/inference (most-recent turns
    win; the newest turn is always kept even if it alone exceeds the
    budget, matching truncate-left tokenizer behaviour).

    Declarative: a reverse cumulative token sum (the stable window run
    DESCENDING) compared to the budget — same single exchange as every
    other per-conversation window, no UDF. Emits in_context (0/1) and
    ctx_tokens (the running suffix total at each turn).
    """
    toks = token_col if token_col is not None else F.size(F.split(F.col("text"), " "))
    rev = (
        Window.partitionBy(cfg.key_col)
        .orderBy(*[F.col(c).desc() for c in cfg.order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = df.withColumn("_toks", toks.cast("long"))
    suffix = F.sum("_toks").over(rev)
    first_in_suffix = F.row_number().over(
        Window.partitionBy(cfg.key_col).orderBy(*[F.col(c).desc() for c in cfg.order_cols])
    )
    keep = (suffix <= F.lit(int(token_budget))) | (first_in_suffix == 1)
    return (
        df.select(
            "*",
            suffix.cast("long").alias("ctx_tokens"),
            keep.cast("int").alias("in_context"),
        ).drop("_toks")
    )


def funnel(
    df: DataFrame,
    cfg: PipelineConfig,
    steps: list[Column],
    max_gap: int | None = None,
) -> DataFrame:
    """Ordered-step funnel per conversation (ClickHouse windowFunnel /
    MATCH_RECOGNIZE analog): for predicates p1..pk, step i completes at
    the FIRST turn satisfying p_i strictly after step i-1's turn (and,
    with ``max_gap``, within ``max_gap`` turns of it). Emits one row per
    conversation: step{i}_turn (null once the funnel stalls) and
    funnel_depth = number of completed steps.

    Declarative chain of unordered per-conversation windows — min(case
    when ...) over (partition by conv). Every window shares the SAME
    partitioning and needs no orderBy, so Catalyst plans ONE hash
    exchange regardless of k (plan-checked: funnel adds exactly one
    Exchange and one partition-key-only Sort — WindowExec's clustering
    sort, no ordering column — beyond the source); the per-step
    dependency is expression-level (step i references step i-1's
    column), not an extra shuffle. 100-TB shape: cost identical to one
    groupBy(conv).

    Reference analog: the lifecycle tracker's ordered state transitions
    (add -> modify -> fill) at src/features/order_lifecycle.rs — here
    generalized to arbitrary predicates.
    """
    w = Window.partitionBy(cfg.key_col)
    ti = F.col("turn_idx")
    out = df
    prev: Column | None = None
    cols = []
    for i, p in enumerate(steps, start=1):
        if prev is None:
            cond = p
        else:
            cond = p & prev.isNotNull() & (ti > prev)
            if max_gap is not None:
                cond = cond & (ti <= prev + max_gap)
        out = out.withColumn(
            f"step{i}_turn", F.min(F.when(cond, ti)).over(w)
        )
        prev = F.col(f"step{i}_turn")
        cols.append(f"step{i}_turn")
    depth = sum((F.col(c).isNotNull().cast("int") for c in cols), F.lit(0))
    return (
        out.groupBy(cfg.key_col)
        .agg(
            *[F.first(c).alias(c) for c in cols],
            F.first(depth).alias("funnel_depth"),
        )
    )


def path_ngrams(
    df: DataFrame,
    key_col: str = "user_id",
    step_col: str = "event_type",
    order_cols: tuple = ("ts", "event_id"),
    n: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """Top-k most frequent length-``n`` step sequences (default trigrams)
    over per-key ordered event streams — sequential-pattern mining lite:
    the dominant navigation/usage paths across all users (funnel's
    unsupervised cousin: funnel checks ONE given path, this surfaces the
    paths worth checking).

    Counts are integers and ties break lexicographically on the path, so
    top-k is engine-exact. Shape: one window partitioned by key (leads
    are computed inside each user's partition — no cross-user grams),
    groupBy(path) with map-side partials, TakeOrdered(k).
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c).asc() for c in order_cols])
    steps = [F.col(step_col)] + [F.lead(step_col, i).over(w) for i in range(1, n)]
    grams = df.select(F.concat_ws(">", *steps).alias("path"), steps[-1].alias("_last"))
    grams = grams.where(F.col("_last").isNotNull())
    counts = grams.groupBy("path").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("path").asc()).limit(top_k)
    wr = Window.orderBy(F.col("cnt").desc(), F.col("path").asc())
    return top.select(F.row_number().over(wr).cast("long").alias("rank"), "path", "cnt")


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_us: int = 7 * 86_400_000_000,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    bucket (default: epoch week), counted in every later bucket they
    return in. Output (cohort_bucket, bucket_offset, n_active,
    retention_ppm) where retention_ppm is an exact integer
    parts-per-million of the cohort's size — no float ratios, so the
    matrix is engine-exact.

    Buckets are pure integer floor-division of epoch micros (no calendar
    / timezone functions, which differ across engines). Shape: dedup to
    (user, bucket) pairs with one groupBy, a min-over-user aggregate for
    the cohort (map-side combined), one broadcast-size join on user is
    avoided entirely by carrying the cohort via a window MIN — total two
    shuffles on user/cohort keys, rows out = O(#buckets^2), constant at
    any data scale.
    """
    ub = (
        df.select(
            F.col(user_col).alias("_u"),
            F.unix_micros(F.col(ts_col)).alias("_us"),
        )
        .select(
            "_u",
            F.expr(f"_us div {int(bucket_us)}").cast("long").alias("_b"),
        )
        .groupBy("_u", "_b")
        .agg(F.count(F.lit(1)).alias("_n_events"))
    )
    w = Window.partitionBy("_u")
    ub = ub.withColumn("_cohort", F.min("_b").over(w))
    grid = ub.groupBy("_cohort", (F.col("_b") - F.col("_cohort")).alias("bucket_offset")).agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    size = grid.filter(F.col("bucket_offset") == 0).select(
        F.col("_cohort").alias("_c0"), F.col("n_active").alias("_cohort_size")
    )
    return (
        grid.join(F.broadcast(size), grid["_cohort"] == size["_c0"])
        .select(
            F.col("_cohort").alias("cohort_bucket"),
            "bucket_offset",
            "n_active",
            F.expr("(n_active * 1000000) div _cohort_size")
            .cast("long")
            .alias("retention_ppm"),
        )
    )


def topic_boundaries(
    transcripts: DataFrame,
    k: int = 2,
    boundary_ppm: int = 150_000,
    text_col: str = "text",
) -> DataFrame:
    """TextTiling-style topic segmentation: for every candidate boundary
    i (between turn i-1 and turn i of a conversation), the Jaccard
    similarity of the DISTINCT word sets of the k turns before vs the k
    turns after; a low-similarity valley marks a topic shift.

    Instead of materializing per-window word sets (quadratic in k and
    impossible to shuffle at scale), each (conv, turn, word) row is
    exploded onto the <= 2k boundaries whose windows contain the turn
    (offset explode — same shape as sorted-neighborhood blocking), then
    ONE groupBy(conv, boundary, word) computes side-presence flags and
    ONE groupBy(conv, boundary) folds them into |L|, |R|, |L∩R|. The
    Jaccard is an exact integer ppm (B*1e6 div (L+R-B)), so the
    segmentation is engine-exact. Shuffle cost O(words * k).

    Edge boundaries with an empty side are dropped (both windows must
    have at least one word). Output: conv_id, boundary_idx, n_left,
    n_right, n_both, jaccard_ppm, is_boundary.
    """
    from ..functions.repetition import normalized_words

    words = (
        transcripts.select(
            "conv_id", "turn_idx",
            F.explode(normalized_words(text_col)).alias("word"),
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    off_right = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_off")
    off_left = F.explode(F.sequence(F.lit(1), F.lit(k))).alias("_off")
    left = words.select("conv_id", "turn_idx", "word", off_left).select(
        "conv_id", "word",
        (F.col("turn_idx") + F.col("_off")).alias("boundary_idx"),
        F.lit(1).alias("_l"), F.lit(0).alias("_r"),
    )
    right = words.select("conv_id", "turn_idx", "word", off_right).select(
        "conv_id", "word",
        (F.col("turn_idx") - F.col("_off")).alias("boundary_idx"),
        F.lit(0).alias("_l"), F.lit(1).alias("_r"),
    )
    presence = (
        left.unionByName(right)
        .groupBy("conv_id", "boundary_idx", "word")
        .agg(F.max("_l").alias("in_l"), F.max("_r").alias("in_r"))
    )
    agg = presence.groupBy("conv_id", "boundary_idx").agg(
        F.sum("in_l").cast("long").alias("n_left"),
        F.sum("in_r").cast("long").alias("n_right"),
        F.sum(F.col("in_l") * F.col("in_r")).cast("long").alias("n_both"),
    )
    return (
        agg.filter((F.col("n_left") > 0) & (F.col("n_right") > 0))
        .withColumn(
            "jaccard_ppm",
            F.expr("(n_both * 1000000) div (n_left + n_right - n_both)"),
        )
        .withColumn(
            "is_boundary",
            (F.col("jaccard_ppm") < F.lit(int(boundary_ppm))).cast("int"),
        )
    )
