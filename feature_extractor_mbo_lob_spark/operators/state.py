"""Point-in-time accumulating state.

The reference folds every event into LobState and samples projections of it
(reference: src/pipeline.rs:584-736, src/features/extractor.rs:272-292). The
transcript analog of that accumulating materialized view is cumulative
per-conversation state: counts per role, character volume, inter-turn time —
all expressed as aggregates over the cumulative frame, which Catalyst fuses
into ONE Window exec (single sort+shuffle) because every aggregate shares the
same spec.

No nulls leave this stage: absent state is encoded 0.0 with +eps division
guards, matching the reference's conventions (src/contract.rs:55,
src/features/lob_features.rs:40-44) — this is what makes allclose parity
against golden fixtures meaningful.

Plan-size discipline: columns are added in BULK select() projections, not
withColumn chains — a 65-withColumn plan costs seconds of serial driver
analysis per execution, which caps cluster scaling (Amdahl) long before the
executors do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..contract import DIVISION_GUARD_EPS, SCHEMA_VERSION
from . import ordering


def with_state_features(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Adds STATE_FEATURES + cumulative signal features + the ``char_len``
    helper (per-turn "size", reference analog of event size)."""
    w = ordering.stable_window(cfg)
    cum = ordering.cumulative(cfg)
    us = ordering.epoch_us(cfg.ts_col)

    # accept a pre-computed char_len (narrow-projection path: `text` dropped
    # before the shuffle so the sort moves ~40B rows instead of ~150B)
    has_char_len = "char_len" in df.columns
    char_len = (
        F.col("char_len")
        if has_char_len
        else F.coalesce(F.length("text"), F.lit(0)).cast("double")
    )
    is_user = (F.col("role") == "user").cast("double")
    is_assistant = (F.col("role") == "assistant").cast("double")
    is_tool = (F.col("role") == "tool").cast("double")
    prev_us = F.lag(us).over(w)
    first_us = F.first(us).over(cum)

    u = F.sum(is_user).over(cum).cast("double")
    a = F.sum(is_assistant).over(cum).cast("double")
    t_ = F.sum(is_tool).over(cum).cast("double")
    turns = F.count(F.lit(1)).over(cum).cast("double")

    return df.select(
        "*",
        *([] if has_char_len else [char_len.alias("char_len")]),
        (F.row_number().over(w) - 1).cast("double").alias("turn_pos"),
        turns.alias("turns_so_far"),
        u.alias("user_turns_so_far"),
        a.alias("assistant_turns_so_far"),
        t_.alias("tool_turns_so_far"),
        F.sum(char_len).over(cum).cast("double").alias("chars_so_far"),
        F.coalesce((us - prev_us) / F.lit(1e6), F.lit(0.0)).cast("double").alias("dt_seconds"),
        ((us - first_us) / F.lit(1e6)).cast("double").alias("secs_since_start"),
        # cumulative flow signals (reference analog: net order flow,
        # src/features/mbo_features/flow_features.rs:46-83 — same +eps guard)
        ((u - a) / (u + a + F.lit(DIVISION_GUARD_EPS))).cast("double").alias("net_role_flow"),
        ((t_ - (u + a)) / (turns + F.lit(DIVISION_GUARD_EPS))).cast("double").alias("net_tool_flow"),
        # warmup flag (reference: mbo_ready after >=100 effective updates,
        # src/features/signals/ofi.rs:15)
        (turns >= F.lit(float(cfg.warmup_turns))).cast("double").alias("session_ready"),
        F.lit(float(SCHEMA_VERSION)).alias("schema_version"),
    )


def with_sessions(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Gap-based sessionization: a new session starts when the inter-turn gap
    exceeds cfg.session_gap_s. session_id = running count of session starts.

    Generalizes the reference's per-day reset boundary
    (src/pipeline.rs:820-841) to within-conversation boundaries; the same
    construction is the batch equivalent of session_window in streaming.
    """
    w = ordering.stable_window(cfg)
    cum = ordering.cumulative(cfg)
    us = ordering.epoch_us(cfg.ts_col)
    gap_us = int(cfg.session_gap_s * 1e6)
    prev = F.lag(us).over(w)
    start = F.when(prev.isNull() | ((us - prev) > gap_us), F.lit(1.0)).otherwise(F.lit(0.0))
    df = df.withColumn("is_session_start", start)
    return df.withColumn("session_id", (F.sum("is_session_start").over(cum) - 1).cast("double"))


def time_regime_col(cfg: PipelineConfig) -> Column:
    """Coarse time-of-day bucket 0..4 (reference:
    src/features/signals/time_regime.rs:68-108 — Open/Early/Midday/Close/
    Closed over an exchange session; transcript analog uses UTC hour bands).

    Spark's timezone handling is exact where the reference approximates DST;
    deviation documented per SURVEY §2.2.
    """
    hr = F.hour(cfg.ts_col)
    return (
        F.when((hr >= 0) & (hr < 6), F.lit(0.0))
        .when((hr >= 6) & (hr < 12), F.lit(1.0))
        .when((hr >= 12) & (hr < 17), F.lit(2.0))
        .when((hr >= 17) & (hr < 21), F.lit(3.0))
        .otherwise(F.lit(4.0))
    )


def with_time_regime(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    return df.withColumn("time_regime", time_regime_col(cfg))


def with_seasonality(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Seasonality block (reference: src/features/experimental/
    seasonality.rs:38-46, 91-150 — minutes since open / until close, session
    progress, 30-min bucket over a fixed exchange session). Transcript
    analog uses the UTC day as the 'session': minutes since/until midnight,
    day progress, and the 48 half-hour buckets. Pure timestamp expressions,
    zero leakage (the day length is known a priori, like the exchange
    close)."""
    us = ordering.epoch_us(cfg.ts_col)
    sec_of_day = F.pmod(F.floor(us / F.lit(1_000_000)), F.lit(86400))
    mins = sec_of_day / F.lit(60.0)
    return df.select(
        "*",
        mins.cast("double").alias("mins_since_midnight"),
        (F.lit(1440.0) - mins).cast("double").alias("mins_until_midnight"),
        (sec_of_day / F.lit(86400.0)).cast("double").alias("day_progress"),
        F.floor(mins / F.lit(30.0)).cast("int").alias("halfhour_bucket"),
    )


def with_distinct_so_far(df: DataFrame, cfg: PipelineConfig,
                         col: str = "tool",
                         out_col: str | None = None) -> DataFrame:
    """Exact running count of distinct non-null ``col`` values seen up to and
    including the current turn (vocabulary-growth feature).

    Rolling exact distinct needs the whole frame (collect_set is O(n*w));
    the CUMULATIVE form is O(n): flag each (conv, value)'s first occurrence
    with row_number()==1, then prefix-sum the flags under the stable order.
    Two window specs (hash(conv_id, col) then hash(conv_id)) — the flag
    window's exchange is the only extra cost, and both are plain shuffles
    with no UDF. NULLs never count.
    """
    out = out_col or f"distinct_{col}_so_far"
    wv = Window.partitionBy(cfg.key_col, col).orderBy(*cfg.order_cols)
    first = (
        F.when(F.col(col).isNotNull() & (F.row_number().over(wv) == 1), 1)
        .otherwise(0)
    )
    df = df.withColumn("_first_occ", first)
    cum = ordering.cumulative(cfg)
    return df.withColumn(
        out, F.sum("_first_occ").over(cum).cast("long")
    ).drop("_first_occ")


def with_session_features(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Per-turn session-relative features on top of `with_sessions`:
    ``turn_in_session`` (1-based) and ``secs_in_session``.

    Both derive from the cumulative frame alone — position/timestamp of the
    most recent session start via max-over-cum of start-flagged values — so
    no second partitioning by (conv, session_id) is needed; everything stays
    in the one hash(conv_id) window cascade.
    """
    df = with_sessions(df, cfg)
    w = ordering.stable_window(cfg)
    cum = ordering.cumulative(cfg)
    us = ordering.epoch_us(cfg.ts_col)
    rn = F.row_number().over(w)
    start_rn = F.max(F.when(F.col("is_session_start") == 1.0, rn)).over(cum)
    start_us = F.max(F.when(F.col("is_session_start") == 1.0, us)).over(cum)
    return df.select(
        "*",
        (rn - start_rn + 1).cast("long").alias("turn_in_session"),
        ((us - start_us) / 1e6).cast("double").alias("secs_in_session"),
    )


def with_cusum(df: DataFrame, cfg: PipelineConfig, col,
               k: float, threshold: float,
               out_prefix: str = "cusum") -> DataFrame:
    """One-sided CUSUM drift statistic per conversation:
    s_i = max(0, s_{i-1} + (x_i - k)), alarm when s_i >= threshold.

    The max(0, .) reset looks like a sequential recurrence, but it is the
    drawdown identity: s_i = C_i - min(0, min_{j<=i} C_j) with
    C = cumsum(x - k) — a prefix sum and a prefix min, both O(n) in the one
    stable window cascade, no UDF and no recursive walk (contrast with the
    volume sampler, whose reset-to-zero-on-fire genuinely needs recursion
    because the reset value feeds back into the threshold test).

    With integer-valued x and k, every intermediate is an exact integer in
    doubles, so the oracle is bit-stable.
    """
    cum = ordering.cumulative(cfg)
    x = F.col(col) if isinstance(col, str) else col
    df = df.withColumn("_cus", F.sum(x - F.lit(float(k))).over(cum))
    s = F.col("_cus") - F.least(F.lit(0.0), F.min("_cus").over(cum))
    return df.select(
        "*",
        s.cast("double").alias(f"{out_prefix}_stat"),
        (s >= F.lit(float(threshold))).cast("int").alias(f"{out_prefix}_alarm"),
    ).drop("_cus")


def with_streaks(df: DataFrame, cfg: PipelineConfig, col: str = "role",
                 out_prefix: str | None = None) -> DataFrame:
    """Gaps-and-islands: length (so far) and ordinal of the current run of
    consecutive equal ``col`` values — e.g. how many times in a row the
    same tool has been invoked (retry bursts), or the current same-role
    streak.

    Construction: group key = row_number under the stable order minus
    row_number within (conv, value) — constant within a run, distinct
    across runs (the classic islands identity; NULL values form their own
    runs keyed by the value partition treating NULL as a group). Then the
    position within (conv, group) is the streak length at each turn. Two
    window specs over the same hash(conv_id)-compatible partitioning
    ((conv) and (conv, col)) — one extra exchange, no UDF.
    """
    p = out_prefix or f"{col}_streak"
    w_all = ordering.stable_window(cfg)
    w_val = Window.partitionBy(cfg.key_col, col).orderBy(*cfg.order_cols)
    grp = (F.row_number().over(w_all) - F.row_number().over(w_val)).alias("_grp")
    df = df.withColumn("_grp", grp)
    w_run = Window.partitionBy(cfg.key_col, col, "_grp").orderBy(*cfg.order_cols)
    run_pos = F.row_number().over(w_run)
    # ordinal of the run within the conversation: count of run STARTS so far
    start = (run_pos == 1).cast("int")
    df = df.withColumn("_rs", start)
    run_ord = F.sum("_rs").over(ordering.cumulative(cfg))
    return df.select(
        "*",
        run_pos.cast("long").alias(f"{p}_len"),
        run_ord.cast("long").alias(f"{p}_ord"),
    ).drop("_grp", "_rs")


def recency_weighted_counts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    half_life_s: float = 86_400.0,
) -> DataFrame:
    """Recency-weighted activity score per key at the corpus's max
    timestamp T: sum over events of 0.5^((T - t)/half_life) — the
    exponential-decay engagement feature recommendation/priority systems
    keep per entity, computed in ONE pass instead of a stateful scan.

    Decay exponents derive from integer microsecond differences against
    a single broadcast max-T aggregate, so the float work is one pow +
    sum per row — partial-aggregable, shuffle carries one double per
    key. Emits n_events alongside as the exact integer anchor.
    """
    from .ordering import epoch_us

    us = epoch_us(ts_col)
    t_max = df.agg(F.max(us).alias("_tmax"))
    half_us = F.lit(half_life_s * 1e6)
    return (
        df.select(F.col(key_col), us.alias("_us"))
        .join(F.broadcast(t_max))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.pow(F.lit(0.5), (F.col("_tmax") - F.col("_us")) / half_us)
            ).alias("recency_score"),
        )
    )


def markov_role_loglik(
    df: DataFrame, cfg: PipelineConfig, smoothing: int = 1
) -> DataFrame:
    """Per-conversation log-likelihood of the role path under the
    corpus-level first-order Markov model with Laplace(+k) smoothing —
    the sequence-anomaly score a transcript pipeline uses to flag
    conversations whose turn structure is improbable (e.g. tool->tool
    storms, user monologues) relative to the corpus.

    p(q|p) = (n_pq + k) / (n_p + k*R) from global transition counts
    (R = distinct observed roles); each conversation scores
    ll = sum over its transitions of ln p(q|p).

    Engine-exactness: per-edge logs quantize to int64 nanos before any
    sum (the zipf_fit rule), so ``ll_nanos`` is an exact integer
    aggregate; the ratio is built with one cast-to-double per operand —
    the same IEEE sequence on both engines.

    Scale shape: ONE shuffle builds the transitions (the lag window on
    conv_id); the model is a <= R^2-row aggregate broadcast back onto the
    edge stream, then one groupBy(conv_id). The model table never grows
    with corpus size, so this is 100-TB-safe by construction.
    """
    w = ordering.stable_window(cfg)
    tr = (
        df.select(
            F.col(cfg.key_col),
            F.lag("role").over(w).alias("prev"),
            F.col("role"),
        )
        .filter(F.col("prev").isNotNull())
    )
    counts = tr.groupBy("prev", "role").agg(F.count(F.lit(1)).alias("n_pq"))
    row_tot = tr.groupBy("prev").agg(F.count(F.lit(1)).alias("n_p"))
    n_roles = tr.agg(F.countDistinct("role").alias("n_roles"))
    k = F.lit(int(smoothing))
    model = (
        counts.join(row_tot, "prev")
        .crossJoin(F.broadcast(n_roles))
        .select(
            "prev", "role",
            F.floor(
                F.log(
                    (F.col("n_pq") + k).cast("double")
                    / (F.col("n_p") + k * F.col("n_roles")).cast("double")
                )
                * F.lit(1e9)
                + F.lit(0.5)
            ).cast("long").alias("ll_nanos_edge"),
        )
    )
    return (
        tr.join(F.broadcast(model), ["prev", "role"])
        .groupBy(cfg.key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_transitions"),
            F.sum("ll_nanos_edge").cast("long").alias("ll_nanos"),
        )
    )


def loop_stats(df: DataFrame, cfg: PipelineConfig, max_period: int = 3) -> DataFrame:
    """Agent-loop detection: per conversation, the longest run of turns
    whose (role, text) digest equals the digest ``k`` turns back, for each
    period k = 1..max_period — the stuck-agent signature (repeating the
    same tool call / response cycle). A run of length r at period k means
    the last r turns replayed the k-turn cycle; ``loop_flag`` marks
    conversations with at least two full periods (run >= 2k for some k).

    One conv-keyed window sort (shared with every per-conversation
    operator), lag comparisons on 32-char digests, gaps-and-islands run
    lengths, one grouped aggregate. No text comparison after the digest
    projection — scale shape is digests only.
    """
    key = cfg.key_col
    w = ordering.stable_window(cfg)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = df.withColumn(
        "_d",
        F.md5(F.concat_ws("\x1f", F.col("role"), F.coalesce(F.col("text"), F.lit("")))),
    )
    aggs = [F.count("*").cast("long").alias("n_turns")]
    flag = F.lit(False)
    for k in range(1, max_period + 1):
        eq = F.when(F.col("_d") == F.lag("_d", k).over(w), 1).otherwise(0)
        d = d.withColumn(f"_eq{k}", eq).withColumn(
            f"_grp{k}", F.sum(1 - F.col(f"_eq{k}")).over(cum)
        )
        aggs.append(F.max(f"_run{k}").cast("long").alias(f"max_run_p{k}"))
        flag = flag | (F.col(f"max_run_p{k}") >= F.lit(2 * k))
    # run length of consecutive eq=1 inside each island
    for k in range(1, max_period + 1):
        wk = Window.partitionBy(key, f"_grp{k}").orderBy(*cfg.order_cols)
        d = d.withColumn(
            f"_run{k}",
            F.when(F.col(f"_eq{k}") == 1, F.row_number().over(wk) - 1).otherwise(0),
        )
    out = d.groupBy(key).agg(*aggs)
    return out.withColumn("loop_flag", flag)


def conv_changepoint(
    df: DataFrame,
    cfg: PipelineConfig,
    col=None,
) -> DataFrame:
    """Single most-likely level-shift point per conversation — the CUSUM
    changepoint estimator, kept ENTIRELY in integers.

    The classic statistic argmax_k |S_k − (k/n)·S_n| (how far the running
    sum strays from the uniform-pacing line) is scaled by n so no division
    ever happens: stat_k = |n·S_k − k·S_n| for k = 1..n−1 (k = left-segment
    length). Ties break to the SMALLEST k; conversations with fewer than 2
    turns are dropped. Magnitude bound: n·S_k <= n²·max(x) — int64-safe to
    ~3e9-turn conversations at x <= 1e3 (far beyond any real transcript;
    the skew router chunks long before that).

    Emits (conv_id, cp_k, cp_stat, n_turns): cp_k is the left-segment
    length, i.e. the change happens ENTERING turn_idx = cp_k.

    Scale shape: one per-conversation window cascade (cumsum + total share
    one partition spec) and one groupBy argmax via max(struct(stat, −k)) —
    a single shuffle each, no global sort, no iteration. Companion to
    with_cusum (the streaming alarm): the alarm says "drifting", this
    says WHERE the level shifted (ref analog: regime boundaries in
    src/features/time_regime.rs).
    """
    if col is None:
        col = F.length("text")
    x = (F.col(col) if isinstance(col, str) else col).cast("long")
    key = cfg.key_col
    w = Window.partitionBy(key).orderBy(*cfg.order_cols)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy(key)
    d = df.select(
        F.col(key),
        F.row_number().over(w).alias("_k"),
        F.sum(x).over(cum).alias("_sk"),
        F.sum(x).over(tot).alias("_sn"),
        F.count(F.lit(1)).over(tot).alias("_n"),
    ).filter((F.col("_k") < F.col("_n")) & (F.col("_n") >= 2))
    stat = F.abs(F.col("_n") * F.col("_sk") - F.col("_k") * F.col("_sn"))
    best = (
        d.select(
            key,
            F.struct(
                stat.alias("s"), (-F.col("_k")).alias("nk"), F.col("_n").alias("n")
            ).alias("_c"),
        )
        .groupBy(key)
        .agg(F.max("_c").alias("_c"))
    )
    return best.select(
        key,
        (-F.col("_c.nk")).cast("long").alias("cp_k"),
        F.col("_c.s").cast("long").alias("cp_stat"),
        F.col("_c.n").cast("long").alias("n_turns"),
    )


def merge_consecutive_turns(df: DataFrame, cfg: PipelineConfig,
                            sep: str = "\n") -> DataFrame:
    """SFT transcript normalization: collapse every run of CONSECUTIVE
    same-role turns into one merged turn (the standard dialog cleanup
    before pair extraction — retry bursts, streamed chunks, and tool
    spam become single turns).

    Per merged run: re-indexed ``turn_idx`` (0-based run ordinal under
    the stable order), ``role``, ``text`` = run texts joined by ``sep``
    in stable (turn_idx, ts) order (empty/all-null runs -> NULL),
    ``tool`` = first turn's tool, ``ts`` = first ts, ``ts_end`` = last
    ts, ``n_merged``, ``chars`` (sum of member text lengths).

    Construction: the gaps-and-islands key (rn_all - rn_per_role, same
    identity as with_streaks) then ONE groupBy — the run members are
    carried as a sorted struct array (collect_list + array_sort, exact
    because (turn_idx, ts) is a total order within a conversation), so
    text assembly is a JVM transform/concat, no second window pass and
    no UDF. Shuffles only on (conv, role, run) — conversation-bounded.
    """
    w_all = ordering.stable_window(cfg)
    w_val = Window.partitionBy(cfg.key_col, "role").orderBy(*cfg.order_cols)
    t = df.withColumn(
        "_grp", F.row_number().over(w_all) - F.row_number().over(w_val)
    )
    arr = F.array_sort(
        F.collect_list(F.struct(*[F.col(c) for c in cfg.order_cols],
                                F.col("text"), F.col("tool")))
    )
    agg = t.groupBy(cfg.key_col, "role", "_grp").agg(
        F.min(F.struct(*[F.col(c) for c in cfg.order_cols])).alias("_first"),
        F.min(cfg.ts_col).alias("ts"),
        F.max(cfg.ts_col).alias("ts_end"),
        F.count(F.lit(1)).cast("long").alias("n_merged"),
        F.sum(F.coalesce(F.length("text"), F.lit(0))).cast("long").alias("chars"),
        arr.alias("_arr"),
    )
    texts = F.filter(
        F.transform("_arr", lambda s: s["text"]), lambda x: x.isNotNull()
    )
    joined = F.array_join(texts, sep)
    w_runs = Window.partitionBy(cfg.key_col).orderBy("_first")
    return agg.select(
        cfg.key_col,
        (F.row_number().over(w_runs) - 1).cast("int").alias("turn_idx"),
        "role",
        F.when(joined == "", F.lit(None)).otherwise(joined).alias("text"),
        F.element_at("_arr", 1)["tool"].alias("tool"),
        "ts", "ts_end", "n_merged", "chars",
    )
