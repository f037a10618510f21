"""End-to-end feature plans.

The reference's Pipeline::process loop (src/pipeline.rs:606-736) restated as
one declarative DataFrame pipeline: scan -> filter -> stateful window columns
-> rolling frames -> sample filter -> label frames -> align join. Catalyst
owns the physical plan; every window shares the identical
partitionBy(conv_id).orderBy(turn_idx, ts) spec so the whole feature stage is
ONE shuffle + sort followed by fused window execs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import contract
from ..config import PipelineConfig
from ..labeling import tlob_labels
from ..operators import ordering, rolling, state


def r6(c):
    """Half-away-from-zero rounding at 6 decimals via pure float algebra —
    bit-identical between Spark expressions and the numpy kernel
    (plans/vectorized.py), unlike F.round (BigDecimal HALF_UP) vs np.round
    (half-to-even), which disagree on representable ties."""
    pos = F.floor(c * 1e6 + F.lit(0.5)) / 1e6
    neg = -(F.floor(-c * 1e6 + F.lit(0.5)) / 1e6)
    return F.when(c >= 0, pos).otherwise(neg).cast("double")


def clean_input(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Invalid-row filter (reference: src/pipeline.rs:609-612 drops system
    messages). Transcript analog: drop rows with null key/order/ts. Pushed to
    the scan by Catalyst."""
    return df.filter(
        F.col(cfg.key_col).isNotNull()
        & F.col(cfg.ts_col).isNotNull()
        & F.col("turn_idx").isNotNull()
    )


def build_features(df: DataFrame, cfg: PipelineConfig, validate: bool = True,
                   narrow: bool = False, order_stats: str = "pandas") -> DataFrame:
    """Full point-in-time feature frame: contract columns + passthrough keys.

    Zero temporal leakage by construction: every feature window frame ends at
    the current row (cumulative / trailing); only labeling uses forward frames.

    narrow=True drops the text payload before the shuffle (char_len is
    pre-computed at the scan) — the window sort then moves ~40-byte rows
    instead of ~150-byte rows. Use when downstream doesn't need raw text
    (memory bandwidth is the scaling ceiling of the window stage).
    """
    df = clean_input(df, cfg)
    if narrow:
        df = df.select(
            cfg.key_col,
            *cfg.order_cols,
            "role",
            F.coalesce(F.length("text"), F.lit(0)).cast("double").alias("char_len"),
        )
    if order_stats == "pandas":
        # hottest computation first, vectorized-numpy per conversation
        # (operators/order_stats.py) — then the JVM window cascade
        from ..operators import order_stats as os_mod

        if "char_len" not in df.columns:
            df = df.withColumn(
                "char_len", F.coalesce(F.length("text"), F.lit(0)).cast("double")
            )
        df = os_mod.with_order_stats_pandas(df, cfg)
    elif order_stats != "native":
        raise ValueError(f"unknown order_stats impl {order_stats}")

    df = state.with_state_features(df, cfg)
    df = state.with_sessions(df, cfg)
    df = state.with_time_regime(df, cfg)
    df = rolling.with_rolling_features(
        df, cfg, include_order_stats=(order_stats == "native")
    )
    if validate:
        contract.validate_feature_frame(df.columns, cfg.window_sizes)
    return df


def sample_anchors(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Event-based sampler: keep every Nth turn per conversation
    (reference: EventBasedSampler, src/preprocessing/sampling.rs:253-330)."""
    w = ordering.stable_window(cfg)
    df = df.withColumn("_rn", F.row_number().over(w))
    return df.filter(F.pmod(F.col("_rn"), F.lit(cfg.sample_every_n)) == 0).drop("_rn")


def max_conv_turns(df: DataFrame) -> int:
    """Longest conversation in the corpus — the auto-skew routing probe.
    turn_idx is dense 0-based per conversation (transcript contract), so
    max(turn_idx)+1 answers it without a groupBy.

    Fast path: when df is backed by local parquet files (≤256 of them),
    the max comes straight from the parquet FOOTER column statistics on
    the driver — zero Spark jobs, ~1 ms/file. Footer stats bound the
    UNFILTERED data, so for a filtered df this can only over-estimate —
    which at worst routes through the (bit-identical) skew path, never the
    reverse. Fallback: one map-side-combined max over the pruned int
    column (v1 parquet scans don't support aggregate pushdown, so this
    costs a ~0.15 s scan job on a 600K-row corpus)."""
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    def _strip(f: str) -> str:
        if f.startswith("file://"):
            return f[7:]
        if f.startswith("file:"):
            return f[5:]
        return f

    local = [_strip(f) for f in files
             if (f.startswith("file:") or f.startswith("/")) and f.endswith(".parquet")]
    if files and len(local) == len(files) and len(local) <= 256:
        try:
            import pyarrow.parquet as pq

            mx = -1
            for f in local:
                md = pq.ParquetFile(f).metadata
                col = next(
                    (i for i in range(md.num_columns)
                     if md.schema.column(i).name == "turn_idx"), None)
                if col is None:
                    raise ValueError("no turn_idx column in footer")
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(col).statistics
                    if st is None or st.max is None:
                        raise ValueError("missing footer stats")
                    mx = max(mx, int(st.max))
            return mx + 1
        except Exception:
            pass
    row = df.agg(F.max("turn_idx")).first()
    return int(row[0] or 0) + 1


def flagship_skewed(
    df: DataFrame,
    cfg: PipelineConfig,
    price_col: str = "char_len",
    chunk_turns: int | None = None,
) -> DataFrame:
    """Skew-safe flagship: identical rows to flagship_pipeline (tested), but
    mega-conversations are chunked (operators/skew.py) so no single task
    ever holds more than ~chunk_turns rows. Labels are computed INSIDE the
    chunked cascade via forward-context rows — no second pass, no join."""
    from ..operators.skew import build_features_skewed

    out = build_features_skewed(
        clean_input(df, cfg), cfg, chunk_turns=chunk_turns,
        with_labels=True, price_col=price_col,
    ).filter(F.col("label").isNotNull())
    return out.select(
        cfg.key_col,
        "turn_idx",
        cfg.ts_col,
        *[r6(F.col(c)).alias(c) for c in cfg.feature_columns()],
        "label",
        r6(F.col("label_pct_change")).alias("label_pct_change"),
    )


def flagship_pipeline(
    df: DataFrame,
    cfg: PipelineConfig | None = None,
    price_col: str = "char_len",
    strategy: str = "fused",
    auto_skew: bool = True,
) -> DataFrame:
    """The minimum-slice end-to-end query (SURVEY §7): features + TLOB
    labels on the per-turn scalar timeline, aligned per (conv_id, turn_idx).

    strategy='fused' (default, the scale plan): label forward-frames share
    the feature stage's partitionBy/orderBy, so Catalyst folds everything
    into ONE shuffle+sort — no second scan, no join. This is the plan you
    want at 100 TB.

    strategy='join': labels built as a separate timeline and aligned via an
    inner equi join on (conv_id, turn_idx) — mirrors the reference's
    separate alignment step (src/export_aligned/alignment.rs:136-173, a
    sort-merge join on co-partitioned sides). Kept for parity testing and
    as the shape used when labels genuinely come from a different table
    (then: the as-of join operator).

    Both strategies produce identical rows (tested).

    auto_skew=True (default) probes the longest conversation (one map-side
    max over a pruned int column) and routes the whole corpus through
    flagship_skewed when it exceeds cfg.skew_max_turns_per_task — a
    10M-turn conversation otherwise becomes one straggler task that caps
    cluster scaling (AQE cannot split Window execs).
    """
    cfg = cfg or PipelineConfig()
    if auto_skew and max_conv_turns(df) > cfg.skew_max_turns_per_task:
        return flagship_skewed(df, cfg, price_col=price_col)
    # narrow when the label timeline derives from char_len (output carries no
    # raw text, so the window sort never has to move it)
    feats = build_features(df, cfg, narrow=(price_col == "char_len"))

    if strategy == "fused":
        price = F.col("char_len") if price_col == "char_len" else F.col(price_col)
        out = tlob_labels(feats.withColumn("_p", price), cfg, price_col="_p").filter(
            F.col("label").isNotNull()
        )
    elif strategy == "join":
        raw_price = (
            F.coalesce(F.length("text"), F.lit(0)).cast("double")
            if price_col == "char_len"
            else F.col(price_col)
        )
        labels = tlob_labels(
            df.select(cfg.key_col, *cfg.order_cols, raw_price.alias("_p")),
            cfg,
            price_col="_p",
        ).select(cfg.key_col, "turn_idx", "label", "label_pct_change")
        out = feats.join(labels, on=[cfg.key_col, "turn_idx"], how="inner").filter(
            F.col("label").isNotNull()
        )
    else:
        raise ValueError(f"unknown strategy {strategy}")

    return out.select(
        cfg.key_col,
        "turn_idx",
        cfg.ts_col,
        *[r6(F.col(c)).alias(c) for c in cfg.feature_columns()],
        "label",
        r6(F.col("label_pct_change")).alias("label_pct_change"),
    )
