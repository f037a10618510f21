"""Structured Streaming variants of the engine's stateful operators.

The reference is itself a one-pass stream (SURVEY §2.10): watermark-free
ordered input, tumbling-by-count sampling, session-style lifecycles, reset()
as partition boundary. The batch engine treats each Iceberg snapshot as
bounded input; this module is the streaming restatement for live transcript
feeds:

* session_window aggregation == the gap-based sessionizer;
* windowed counts with watermark == the rolling rate features (time-based
  frames — count-based frames don't exist in streaming, documented
  deviation);
* applyInPandasWithState == the cumulative per-conversation state
  (turns_so_far, role counts, volume sampler with exact reset-on-fire).

These run under `spark.readStream`; tests drive them with the rate / memory
sources and foreachBatch.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..config import PipelineConfig


def streaming_sessions(events: DataFrame, cfg: PipelineConfig,
                       watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessions via session_window: one row per closed session with
    turn count and char volume (streaming twin of operators.state.with_sessions)."""
    gap = f"{int(cfg.session_gap_s)} seconds"
    return (
        events.withWatermark(cfg.ts_col, watermark)
        .groupBy(
            F.col(cfg.key_col),
            F.session_window(F.col(cfg.ts_col), gap).alias("session"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("chars"),
        )
        .select(
            cfg.key_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_turns",
            "chars",
        )
    )


def streaming_turn_rates(events: DataFrame, cfg: PipelineConfig,
                         window: str = "5 minutes", slide: str = "1 minute",
                         watermark: str = "10 minutes") -> DataFrame:
    """Sliding time-window per-conversation rates (streaming analog of the
    count-based rolling frames — time-based because streaming state must be
    watermark-bounded)."""
    return (
        events.withWatermark(cfg.ts_col, watermark)
        .groupBy(F.col(cfg.key_col), F.window(cfg.ts_col, window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum((F.col("role") == "tool").cast("long")).alias("tool_turns"),
            F.avg(F.coalesce(F.length("text"), F.lit(0))).alias("char_mean"),
        )
        .select(
            cfg.key_col,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "turns",
            "tool_turns",
            "char_mean",
        )
    )


# --- stateful cumulative features (applyInPandasWithState) --------------------

STATE_SCHEMA = StructType([
    StructField("turns", LongType()),
    StructField("user_turns", LongType()),
    StructField("assistant_turns", LongType()),
    StructField("tool_turns", LongType()),
    StructField("chars", DoubleType()),
    StructField("vol_acc", DoubleType()),
])

CUM_OUTPUT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", LongType()),
    StructField("ts", TimestampType()),
    StructField("turns_so_far", LongType()),
    StructField("user_turns_so_far", LongType()),
    StructField("tool_turns_so_far", LongType()),
    StructField("chars_so_far", DoubleType()),
    StructField("is_sample", LongType()),
])


def _cum_state_fn(volume_target: float):
    """Per-conversation cumulative state + exact volume sampler (reset on
    fire) — the reference's Pipeline state loop as streaming group state
    (reference: src/pipeline.rs:606-736, sampling.rs:154-184)."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            turns, user_t, asst_t, tool_t, chars, acc = state.get
        else:
            turns, user_t, asst_t, tool_t, chars, acc = 0, 0, 0, 0, 0.0, 0.0
        for pdf in pdfs:
            pdf = pdf.sort_values(["turn_idx", "ts"], kind="mergesort")
            out = {k: [] for k in ("turns_so_far", "user_turns_so_far",
                                   "tool_turns_so_far", "chars_so_far", "is_sample")}
            for role, text in zip(pdf["role"], pdf["text"]):
                n = len(text) if isinstance(text, str) else 0
                turns += 1
                user_t += role == "user"
                asst_t += role == "assistant"
                tool_t += role == "tool"
                chars += n
                acc += n
                fire = acc >= volume_target
                if fire:
                    acc = 0.0
                out["turns_so_far"].append(turns)
                out["user_turns_so_far"].append(user_t)
                out["tool_turns_so_far"].append(tool_t)
                out["chars_so_far"].append(chars)
                out["is_sample"].append(int(fire))
            res = pd.DataFrame({
                "conv_id": pdf[pdf.columns[0]].astype(str) if "conv_id" not in pdf else pdf["conv_id"],
                "turn_idx": pdf["turn_idx"].astype("int64"),
                "ts": pdf["ts"],
                **out,
            })
            yield res
        state.update((turns, user_t, asst_t, tool_t, float(chars), float(acc)))

    return fn


# --- transformWithState (Spark 4 stateful API) --------------------------------

TWS_OUTPUT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", LongType()),
    StructField("turns_so_far", LongType()),
    StructField("dt_us", LongType()),
    StructField("ewma_dt_us", DoubleType()),
])


def _latency_processor(alpha: float):
    """Build the StatefulProcessor lazily so importing this module never
    requires the streaming-v2 classes (they exist in pyspark>=4.0)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class ConvLatencyProcessor(StatefulProcessor):
        """Per-conversation inter-turn latency EWMA via the Spark 4
        transformWithState API: ValueState survives across micro-batches
        (RocksDB-backed, changelog-checkpointed), so a restart resumes the
        EWMA exactly where the previous run stopped. Streaming twin of the
        batch dt/EWMA features (operators/volatility.py, rolling ewma);
        reference analog: the per-instrument latency trackers inside the
        pipeline state loop (src/pipeline.rs:606-736)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType([
                StructField("last_us", LongType()),
                StructField("turns", LongType()),
                StructField("ewma_us", DoubleType()),
            ])
            self._st = handle.getValueState("conv_latency", schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._st.exists():
                last_us, turns, ewma = self._st.get()
            else:
                last_us, turns, ewma = None, 0, 0.0
            for pdf in rows:
                pdf = pdf.sort_values(["turn_idx"], kind="mergesort")
                dts, ewmas, cum = [], [], []
                for us in pdf["ts_us"]:
                    us = int(us)
                    dt = 0 if last_us is None else max(us - last_us, 0)
                    turns += 1
                    ewma = (1.0 - alpha) * ewma + alpha * float(dt)
                    last_us = us
                    dts.append(dt)
                    ewmas.append(ewma)
                    cum.append(turns)
                yield pd.DataFrame({
                    "conv_id": [key[0]] * len(pdf),
                    "turn_idx": pdf["turn_idx"].astype("int64").to_list(),
                    "turns_so_far": cum,
                    "dt_us": dts,
                    "ewma_dt_us": ewmas,
                })
            self._st.update((last_us, turns, float(ewma)))

        def close(self) -> None:
            pass

    return ConvLatencyProcessor()


def streaming_latency_state(
    events: DataFrame, cfg: PipelineConfig, alpha: float = 0.125
) -> DataFrame:
    """Per-conversation turn latency EWMA as a transformWithState stream.

    The Spark 4 stateful-v2 operator: typed ValueState per key, RocksDB
    state store, exactly-once across restarts via the checkpoint. Within a
    batch rows are processed in (turn_idx) order; cross-batch correctness
    has the same in-order-per-key contract as streaming_cumulative_state.
    Requires ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider (transformWithState only runs there — the
    caller/test sets it; get_spark leaves batch jobs on the default HDFS
    provider) and the ``protobuf`` package (pyspark's state-server protocol
    for this one API; absent in minimal installs, so the test
    import-or-skips — applyInPandasWithState below is the dependency-free
    stateful path and covers the same semantics).
    """
    ts_us = (F.unix_micros(F.col(cfg.ts_col).cast("timestamp"))).alias("ts_us")
    return (
        events.select(cfg.key_col, "turn_idx", ts_us)
        .groupBy(cfg.key_col)
        .transformWithStateInPandas(
            _latency_processor(alpha),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


def streaming_cumulative_state(events: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Cumulative per-conversation counters + exact volume sampling as a
    stateful stream. NOTE: within-batch ordering is by (turn_idx, ts); cross-
    batch correctness requires in-order delivery per key (same contract as
    the reference's ordered input)."""
    return events.select(cfg.key_col, "turn_idx", cfg.ts_col, "role", "text").groupBy(
        cfg.key_col
    ).applyInPandasWithState(
        _cum_state_fn(cfg.volume_target),
        outputStructType=CUM_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming dedup -----------------------------------------------------------

def streaming_dedup(
    events: DataFrame,
    cfg: PipelineConfig,
    watermark: str = "30 minutes",
    fp_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Exactly-once turn dedup for at-least-once transcript feeds.

    ``dropDuplicatesWithinWatermark`` keys on a content fingerprint and
    keeps state only within the event-time watermark — bounded state at
    any corpus rate, unlike a plain dropDuplicates whose state grows
    forever. The fingerprint is md5 over the key columns + text (32-byte
    state per in-flight key), so retransmitted turns with identical
    content dedup while genuine edits (different text) pass through.

    This is the streaming twin of the batch exact-dedup stage
    (operators/dedup.exact_dedup): same fingerprint recipe, windowed
    retention instead of a corpus-wide groupBy.
    """
    fp = F.md5(
        F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in fp_cols], F.col("text")
        )
    )
    return (
        events.withColumn("_fp", fp)
        .withWatermark(cfg.ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


# --- stream-stream interval join ------------------------------------------------

def streaming_tool_pairing(
    invokes: DataFrame,
    results: DataFrame,
    cfg: PipelineConfig,
    max_wait_s: int = 600,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: pair each tool invocation with the
    tool results arriving on a second stream within ``max_wait_s`` —
    the live twin of the batch lifecycle pairing (operators/lifecycle).

    Both sides carry watermarks and the join condition time-bounds the
    match (result ts in [invoke ts, invoke ts + max_wait_s]), which is
    what lets Spark expire buffered state: without the bound a
    stream-stream join would buffer both streams forever. Inner join, so
    matches emit as soon as both sides arrive; state for unmatched rows
    drops once the watermark passes their bound.

    Emits (conv_id, tool, invoke_ts, result_ts, latency_us).
    """
    i = (
        invokes.select(
            F.col(cfg.key_col).alias("i_conv"),
            F.col("tool").alias("i_tool"),
            F.col(cfg.ts_col).alias("i_ts"),
        ).withWatermark("i_ts", watermark)
    )
    r = (
        results.select(
            F.col(cfg.key_col).alias("r_conv"),
            F.col("tool").alias("r_tool"),
            F.col(cfg.ts_col).alias("r_ts"),
        ).withWatermark("r_ts", watermark)
    )
    cond = (
        (F.col("i_conv") == F.col("r_conv"))
        & (F.col("i_tool") == F.col("r_tool"))
        & (F.col("r_ts") >= F.col("i_ts"))
        & (F.col("r_ts") <= F.col("i_ts") + F.expr(f"INTERVAL {max_wait_s} SECONDS"))
    )
    return i.join(r, cond, "inner").select(
        F.col("i_conv").alias("conv_id"),
        F.col("i_tool").alias("tool"),
        F.col("i_ts").alias("invoke_ts"),
        F.col("r_ts").alias("result_ts"),
        (F.unix_micros(F.col("r_ts")) - F.unix_micros(F.col("i_ts"))).alias("latency_us"),
    )


def streaming_pit_enrich(
    tagged: DataFrame,
    cfg: PipelineConfig,
    ttl_s: float = 3600.0,
    value_col: str = "fval",
) -> DataFrame:
    """Streaming twin of operators/asof.pit_training_set for ONE timeline:
    a tagged union stream (side=0 feature rows carrying ``value_col``,
    side=1 anchor rows) keyed by conv_id flows through
    applyInPandasWithState; state is just (last feature ts, last value) —
    O(1) per key, the online feature store in miniature. Every anchor row
    emits the latest feature at-or-before it, NULLed once older than
    ``ttl_s`` (staleness expiry), never a future value (zero temporal
    leakage — the backward-inclusive as-of rule).

    Ordering contract: rows are sorted (ts, side) inside each micro-batch
    and state carries across batches, so replay order is exact when
    batches respect event time (single-file availableNow replay, or a
    watermark-disciplined source); a late feature row CANNOT retro-fill
    anchors already emitted — the documented streaming deviation from the
    batch join (same caveat as every online store).
    """
    ttl_us = int(ttl_s * 1_000_000)

    out_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", LongType()),
            StructField(value_col, LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("last_us", LongType()), StructField("last_val", LongType())]
    )

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.exists:
            last_us, last_val = state.get
        else:
            last_us, last_val = None, None
        batch = pd.concat(list(pdfs), ignore_index=True)
        # feature rows (side 0) sort BEFORE anchors at equal ts: inclusive
        batch = batch.sort_values(["ts", "side"], kind="mergesort")
        out_conv, out_turn, out_val = [], [], []
        for ts, side, turn_idx, val in zip(
            batch["ts"], batch["side"], batch["turn_idx"], batch[value_col]
        ):
            us = int(pd.Timestamp(ts).value // 1000)
            if side == 0:
                last_us, last_val = us, (None if pd.isna(val) else int(val))
            else:
                fresh = last_us is not None and us - last_us <= ttl_us
                out_conv.append(conv_id)
                out_turn.append(int(turn_idx))
                out_val.append(last_val if fresh else None)
        if last_us is not None:
            state.update((last_us, last_val if last_val is not None else None))
        yield pd.DataFrame(
            {"conv_id": out_conv, "turn_idx": out_turn, value_col: out_val}
        )

    return tagged.groupBy(cfg.key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming SFT pair extraction ------------------------------------------------

SFT_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", LongType()),
        StructField("context_turns", LongType()),
        StructField("context_chars", LongType()),
        StructField("context_user_turns", LongType()),
        StructField("response_chars", LongType()),
    ]
)

SFT_STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("n_chars", LongType()),
        StructField("n_user", LongType()),
    ]
)


def streaming_sft_pairs(
    events: DataFrame,
    cfg: PipelineConfig,
    min_context_turns: int = 1,
    response_role: str = "assistant",
) -> DataFrame:
    """Streaming twin of functions/corpus.sft_pairs: ONLINE training-pair
    extraction as transcripts arrive. State per conversation is three
    counters (turns/chars/user-turns seen so far) — O(1) per key; each
    ``response_role`` turn with enough context emits its pair row in the
    micro-batch it arrives in.

    Point-in-time safety holds by update order: the pair is emitted from
    the PRE-update counters (context strictly before the response turn) —
    the same (unboundedPreceding, -1) frame the batch operator uses, so a
    single-file availableNow replay matches the batch output exactly.
    Within-batch ordering is (turn_idx, ts) per key; cross-batch
    correctness needs in-order delivery per key (same contract as
    streaming_cumulative_state).
    """
    min_ctx = int(min_context_turns)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        n_turns, n_chars, n_user = state.get if state.exists else (0, 0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["turn_idx", "ts"], kind="mergesort")
        out = {k: [] for k in ("turn_idx", "context_turns", "context_chars",
                               "context_user_turns", "response_chars")}
        for turn_idx, role, text in zip(batch["turn_idx"], batch["role"], batch["text"]):
            tlen = 0 if pd.isna(text) else len(text)
            if role == response_role and n_turns >= min_ctx:
                out["turn_idx"].append(int(turn_idx))
                out["context_turns"].append(n_turns)
                out["context_chars"].append(n_chars)
                out["context_user_turns"].append(n_user)
                out["response_chars"].append(tlen)
            n_turns += 1
            n_chars += tlen
            n_user += 1 if role == "user" else 0
        state.update((n_turns, n_chars, n_user))
        yield pd.DataFrame({"conv_id": [conv_id] * len(out["turn_idx"]), **out})

    return (
        events.select(cfg.key_col, "turn_idx", cfg.ts_col, "role", "text")
        .groupBy(cfg.key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SFT_OUTPUT_SCHEMA,
            stateStructType=SFT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming sequential experiment monitor (SPRT) ----------------------------

SPRT_OUTPUT_SCHEMA = StructType([
    StructField("arm", LongType()),
    StructField("n_users", LongType()),
    StructField("n_conv", LongType()),
    StructField("llr_final_nano", LongType()),
    StructField("decision", StringType()),
    StructField("n_at_decision", LongType()),
    StructField("llr_at_decision_nano", LongType()),
])


def _sprt_state_fn(consts: dict):
    """Per-arm SPRT accumulator: replays the exact int64 nano-unit LLR walk
    of functions/stats.ab_sprt as streaming group state. A decision, once
    crossed, is FROZEN in state (sequential tests must not un-decide), so
    late micro-batches only advance the running totals."""
    succ, fail = consts["succ"], consts["fail"]
    upper, lower = consts["upper"], consts["lower"]

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, k, dn, dllr = state.get
        else:
            n, k, dn, dllr = 0, 0, None, None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts0_us", "uid"], kind="mergesort")
            for conv in pdf["conv"]:
                n += 1
                k += int(conv)
                llr = k * succ + (n - k) * fail
                if dn is None and (llr >= upper or llr <= lower):
                    dn, dllr = n, llr
        llr_final = k * succ + (n - k) * fail
        decision = (
            "continue" if dn is None
            else ("h1" if dllr >= upper else "h0")
        )
        yield pd.DataFrame({
            "arm": [int(key[0])],
            "n_users": [n],
            "n_conv": [k],
            "llr_final_nano": [llr_final],
            "decision": [decision],
            "n_at_decision": pd.array([dn], dtype="Int64"),
            "llr_at_decision_nano": pd.array([dllr], dtype="Int64"),
        })
        state.update((n, k, dn, dllr))

    return fn


def streaming_sprt(
    per_user: DataFrame,
    p0_ppm: int = 300_000,
    p1_ppm: int = 400_000,
    alpha_ppm: int = 50_000,
    beta_ppm: int = 50_000,
) -> DataFrame:
    """ONLINE Wald SPRT — the way an experimentation platform actually runs
    the sequential test: a stream of per-user first-touch rows
    (arm:int, uid:long, conv:int, ts0_us:long) drives a per-arm
    applyInPandasWithState accumulator that emits a decision snapshot per
    micro-batch (running totals, final LLR, h1/h0/continue, and the frozen
    first-crossing point). Bit-identical to the batch ab_sprt on the same
    rows delivered in ts0 order (the int64 nano LLR constants are the same
    driver-Python literals — functions/stats.sprt_constants).

    State per arm is four ints — bounded forever, any corpus rate.
    """
    from ..functions.stats import sprt_constants

    consts = sprt_constants(p0_ppm, p1_ppm, alpha_ppm, beta_ppm)
    return per_user.groupBy("arm").applyInPandasWithState(
        _sprt_state_fn(consts),
        outputStructType=SPRT_OUTPUT_SCHEMA,
        stateStructType="n long, k long, dn long, dllr long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# --- streaming Page-Hinkley drift monitor ---------------------------------------

PH_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("s", LongType()),
    StructField("m", LongType()),
    StructField("mmin", LongType()),
    StructField("has_min", LongType()),
])

PH_OUTPUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("n", LongType()),
    StructField("m_t", LongType()),
    StructField("ph_t", LongType()),
])


def _ph_state_fn(delta_q: int):
    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            n0, s0, m0, mmin0, has_min = state.get
        else:
            n0, s0, m0, mmin0, has_min = 0, 0, 0, 0, 0
        frames = [p for p in pdfs]
        if frames:
            pdf = pd.concat(frames).sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            x = pdf["v"].to_numpy(dtype=np.int64)
            if len(x):
                n = n0 + np.arange(1, len(x) + 1, dtype=np.int64)
                cums = s0 + np.cumsum(x)
                # numpy floor-div == DuckDB // (floor), the oracle contract
                mean_q = cums // n
                dev = x - mean_q - delta_q
                m = m0 + np.cumsum(dev)
                run_min = np.minimum.accumulate(m)
                if has_min:
                    run_min = np.minimum(run_min, mmin0)
                n0, s0, m0 = int(n[-1]), int(cums[-1]), int(m[-1])
                mmin0, has_min = int(run_min[-1]), 1
        state.update((n0, s0, m0, mmin0, has_min))
        if n0 > 0:
            yield pd.DataFrame(
                {"key": [key[0]], "n": [n0], "m_t": [m0],
                 "ph_t": [m0 - mmin0]}
            )

    return fn


def streaming_page_hinkley(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "v",
    delta_q: int = 0,
) -> DataFrame:
    """Per-key Page-Hinkley drift monitor as a stateful stream — the
    LIVE twin of functions/stats.page_hinkley: the deviation-from-
    running-mean CUSUM per key (event type), carried across
    micro-batches in group state so the alarm statistic ph_t = m_t -
    min m is exact over the whole history with O(1) state per key
    (five integers). Within-batch ordering is (ts, event_id); cross-
    batch correctness requires in-order delivery per key — the same
    contract as streaming_cumulative_state.

    The running mean floors via numpy integer division, matching the
    DuckDB oracle's flooring `//` for any sign; the whole trajectory is
    integer-exact, so the emitted final row per key equals the batch
    window computation bit-for-bit.

    Emits one row per key per micro-batch: (key, n, m_t, ph_t).
    """
    return (
        events.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(value_col).cast("long").alias("v"),
            F.col("ts"),
            F.col("event_id"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            _ph_state_fn(delta_q),
            outputStructType=PH_OUTPUT_SCHEMA,
            stateStructType=PH_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
