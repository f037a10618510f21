"""Pipeline contract constants.

Mirrors the reference's contract module (reference: src/contract.rs:21-55):
the schema version is exported as a literal feature column, division guards
use a fixed epsilon, categorical features are excluded from normalization,
and the feature count is a pure function of the config (reference:
src/features/config.rs:203-222) validated at export time (reference:
src/export_aligned/validation.rs:101-118).
"""

from __future__ import annotations

# Version literal emitted as the `schema_version` feature column
# (reference: src/contract.rs:21, src/features/signals/compute.rs:195).
SCHEMA_VERSION = 1.0

# Epsilon added to denominators to avoid division blow-ups
# (reference: src/contract.rs:55, DIVISION_GUARD_EPS = 1e-8).
DIVISION_GUARD_EPS = 1e-8

# Rate denominators floor the window duration at 1 ms
# (reference: src/features/mbo_features/window.rs:150-155).
MIN_DURATION_S = 1e-3

# Tolerance used by golden-fixture comparisons
# (reference: tests/golden_snapshot.rs FLOAT_CMP_EPS = 1e-10).
FLOAT_CMP_EPS = 1e-10

# Variance floor used by z-score style features.
MIN_STD = 1e-10

# Feature columns that are categorical / flags and must never be normalized
# (reference: src/contract.rs:43 — categorical indices [92,93,94,97]).
CATEGORICAL_FEATURES = (
    "session_ready",
    "time_regime",
    "is_session_start",
    "schema_version",
)

# --- feature schema -------------------------------------------------------
# The engine emits *named* double columns (so Catalyst can prune), packed to
# array<double> only at export. Groups mirror the reference's
# LOB / derived / MBO / signal grouping (reference: src/features/extractor.rs).

STATE_FEATURES = (
    "turn_pos",                # 0-based index of the turn within the conversation
    "turns_so_far",            # cumulative turn count (inclusive)
    "user_turns_so_far",
    "assistant_turns_so_far",
    "tool_turns_so_far",
    "chars_so_far",            # cumulative character volume
    "dt_seconds",              # seconds since previous turn (0.0 for first)
    "secs_since_start",        # seconds since first turn of the conversation
)

# Per rolling window (count-based frame of the last `w` turns), mirrors the
# reference's MboWindow counters + lazy percentile/mean-std caches
# (reference: src/features/mbo_features/window.rs:18-213).
ROLLING_FEATURES = (
    "turn_rate",        # turns / duration_seconds over the frame
    "user_frac",        # user turns / frame size
    "assistant_frac",
    "tool_rate",        # tool turns / duration_seconds
    "role_flip_rate",   # role transitions / frame size  (OFI-rate analog)
    "char_mean",
    "char_std",         # population std (reference: window.rs:190-213)
    "char_zscore",      # (len - mean) / (std + eps)
    "char_p25",
    "char_p50",
    "char_p75",
    "char_p90",
    "char_skew",        # population moment skew, 0 if n<3 or std<1e-10
    "char_hhi",         # sum((len_i/sum)^2) concentration
    "large_turn_ratio", # count(len > p90) / n
    "flow_volatility",  # population std of net role flow over 10 equal
                        # sub-windows of the frame; 0 unless the frame holds
                        # >= 10 * FLOW_VOL_MIN_PER_SUB events (reference
                        # feature 58, src/features/mbo_features/
                        # flow_features.rs:86-146)
)

# Feature-58 constants (reference: N_SUBWINDOWS / MIN_EVENTS_PER_SUBWINDOW,
# flow_features.rs:88-89; min-per-sub lowered 5 -> 2 because conversations
# are far shorter than MBO event streams — documented deviation).
FLOW_VOL_SUBWINDOWS = 10
FLOW_VOL_MIN_PER_SUB = 2

SIGNAL_FEATURES = (
    "net_role_flow",     # (user - assistant) / (user + assistant + eps), cumulative
    "net_tool_flow",     # (tool - non_tool) / (turns + eps), cumulative
    "session_id",        # gap-based session index within the conversation
    "is_session_start",  # 1.0 on the first turn of each session
    "time_regime",       # coarse time-of-day bucket 0..4
    "session_ready",     # warmup flag: >= warmup_turns turns seen
    "schema_version",    # constant SCHEMA_VERSION
)


def feature_count(window_sizes: tuple[int, ...] = (8, 32, 128)) -> int:
    """Feature width as a pure function of config.

    Mirrors FeatureConfig::feature_count (reference:
    src/features/config.rs:203-222): no schema inference anywhere — the
    width is computed from config and asserted against the produced frame.
    """
    return (
        len(STATE_FEATURES)
        + len(window_sizes) * len(ROLLING_FEATURES)
        + len(SIGNAL_FEATURES)
    )


def feature_columns(window_sizes: tuple[int, ...] = (8, 32, 128)) -> list[str]:
    """Ordered list of feature column names for the given config."""
    cols = list(STATE_FEATURES)
    for w in window_sizes:
        cols.extend(f"{f}_w{w}" for f in ROLLING_FEATURES)
    cols.extend(SIGNAL_FEATURES)
    return cols


def validate_feature_frame(columns: list[str],
                           window_sizes: tuple[int, ...] = (8, 32, 128)) -> None:
    """Hard contract gate: the feature frame must contain exactly the
    configured feature columns (reference: src/export_aligned/validation.rs:101-118
    accepts only the configured widths)."""
    expected = feature_columns(window_sizes)
    missing = [c for c in expected if c not in columns]
    if missing:
        raise ValueError(f"feature frame missing contract columns: {missing}")
