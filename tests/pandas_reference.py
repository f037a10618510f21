"""Slow, obviously-correct pandas reference implementation of the feature
contract — the golden-fixture generator (SURVEY §5: the reference's golden
snapshot tests compare 500 vectors bit-exactly at 1e-10; here every
(conv_id, turn_idx) row of a small corpus is compared allclose).

Implementation style is deliberately naive: per-conversation python loops,
recomputing each window from slices. Anything clever would risk sharing a
bug with the Spark engine.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from feature_extractor_mbo_lob_spark.config import PipelineConfig
from feature_extractor_mbo_lob_spark.contract import (
    DIVISION_GUARD_EPS,
    FLOW_VOL_MIN_PER_SUB,
    FLOW_VOL_SUBWINDOWS,
    MIN_DURATION_S,
    MIN_STD,
    SCHEMA_VERSION,
)


def _pct(sorted_vals: list[float], q: float) -> float:
    n = len(sorted_vals)
    if n == 1:
        return sorted_vals[0]
    idx = (n - 1) * q
    lo = int(math.floor(idx))
    frac = idx - lo
    hi = min(lo + 1, n - 1)
    return sorted_vals[lo] + frac * (sorted_vals[hi] - sorted_vals[lo])


def reference_features(pdf: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """pdf: transcript rows. Returns one row per input row with every
    contract feature column."""
    out_rows = []
    for conv_id, g in pdf.groupby("conv_id", sort=True):
        g = g.sort_values(["turn_idx", "ts"], kind="mergesort").reset_index(drop=True)
        us = (g["ts"].astype("int64") // 1000).to_numpy()  # ns -> us
        roles = g["role"].tolist()
        texts = g["text"].tolist()
        lens = [float(len(t)) if isinstance(t, str) else 0.0 for t in texts]

        n_user = n_asst = n_tool = 0
        chars = 0.0
        session_starts = 0
        for i in range(len(g)):
            row = {"conv_id": conv_id, "turn_idx": int(g["turn_idx"].iloc[i])}
            n_user += roles[i] == "user"
            n_asst += roles[i] == "assistant"
            n_tool += roles[i] == "tool"
            chars += lens[i]
            turns = i + 1

            row["turn_pos"] = float(i)
            row["turns_so_far"] = float(turns)
            row["user_turns_so_far"] = float(n_user)
            row["assistant_turns_so_far"] = float(n_asst)
            row["tool_turns_so_far"] = float(n_tool)
            row["chars_so_far"] = chars
            row["dt_seconds"] = 0.0 if i == 0 else (us[i] - us[i - 1]) / 1e6
            row["secs_since_start"] = (us[i] - us[0]) / 1e6
            row["net_role_flow"] = (n_user - n_asst) / (n_user + n_asst + DIVISION_GUARD_EPS)
            row["net_tool_flow"] = (n_tool - (n_user + n_asst)) / (turns + DIVISION_GUARD_EPS)
            row["session_ready"] = 1.0 if turns >= cfg.warmup_turns else 0.0
            row["schema_version"] = float(SCHEMA_VERSION)

            gap = cfg.session_gap_s * 1e6
            if i == 0 or (us[i] - us[i - 1]) > gap:
                session_starts += 1
                row["is_session_start"] = 1.0
            else:
                row["is_session_start"] = 0.0
            row["session_id"] = float(session_starts - 1)

            hr = g["ts"].iloc[i].hour
            row["time_regime"] = (
                0.0 if hr < 6 else 1.0 if hr < 12 else 2.0 if hr < 17 else 3.0 if hr < 21 else 4.0
            )

            for w in cfg.window_sizes:
                lo = max(0, i - (w - 1))
                fl = lens[lo : i + 1]
                fr = roles[lo : i + 1]
                fu = us[lo : i + 1]
                cnt = len(fl)
                dur = max((fu[-1] - fu[0]) / 1e6, MIN_DURATION_S)
                mean = sum(fl) / cnt
                var = max(sum(x * x for x in fl) / cnt - mean * mean, 0.0)
                std = math.sqrt(var)
                flips = 0.0
                for j in range(lo, i + 1):
                    if j > 0 and roles[j] != roles[j - 1]:
                        flips += 1.0
                m3 = (
                    sum(x**3 for x in fl) / cnt
                    - 3 * mean * (sum(x * x for x in fl) / cnt)
                    + 2 * mean**3
                )
                skew = 0.0 if (cnt < 3 or std < MIN_STD) else m3 / std**3
                ssum = sum(fl)
                hhi = sum(x * x for x in fl) / (ssum * ssum) if ssum > 0 else 0.0
                sv = sorted(fl)
                p90 = _pct(sv, 0.90)
                sfx = f"_w{w}"
                row["turn_rate" + sfx] = cnt / dur
                row["user_frac" + sfx] = sum(r == "user" for r in fr) / cnt
                row["assistant_frac" + sfx] = sum(r == "assistant" for r in fr) / cnt
                row["tool_rate" + sfx] = sum(r == "tool" for r in fr) / dur
                row["role_flip_rate" + sfx] = flips / cnt
                row["char_mean" + sfx] = mean
                row["char_std" + sfx] = std
                row["char_zscore" + sfx] = (lens[i] - mean) / (std + DIVISION_GUARD_EPS)
                row["char_p25" + sfx] = _pct(sv, 0.25)
                row["char_p50" + sfx] = _pct(sv, 0.50)
                row["char_p75" + sfx] = _pct(sv, 0.75)
                row["char_p90" + sfx] = p90
                row["char_skew" + sfx] = skew
                row["char_hhi" + sfx] = hhi
                row["large_turn_ratio" + sfx] = sum(x > p90 for x in fl) / cnt

                # feature 58: std of net role flow over 10 equal sub-windows
                sig = [1.0 if r == "user" else (-1.0 if r == "assistant" else 0.0)
                       for r in fr]
                nsub = FLOW_VOL_SUBWINDOWS
                ssz = cnt // nsub
                flows = []
                for si in range(nsub):
                    seg = sig[si * ssz: cnt if si == nsub - 1 else (si + 1) * ssz]
                    tot = sum(abs(x) for x in seg)
                    flows.append(sum(seg) / tot if tot > 0 else 0.0)
                fmean = sum(flows) / nsub
                fvar = sum((f - fmean) ** 2 for f in flows) / nsub
                row["flow_volatility" + sfx] = (
                    math.sqrt(fvar) if cnt >= nsub * FLOW_VOL_MIN_PER_SUB else 0.0
                )
            out_rows.append(row)
    return pd.DataFrame(out_rows)


def reference_tlob(pdf: pd.DataFrame, cfg: PipelineConfig, price: list[str] | str) -> pd.DataFrame:
    """Naive TLOB labels over a per-conv scalar series column name."""
    k, h, theta = cfg.labels.smoothing_k, cfg.labels.horizon, cfg.labels.threshold
    rows = []
    for conv_id, g in pdf.groupby("conv_id", sort=True):
        g = g.sort_values(["turn_idx", "ts"], kind="mergesort").reset_index(drop=True)
        p = g[price].astype(float).tolist()
        T = len(p)
        for t in range(T):
            ok = t - k >= 0 and t + h < T and t + h - k >= 0
            if not ok:
                rows.append({"conv_id": conv_id, "turn_idx": int(g["turn_idx"].iloc[t]),
                             "label": None, "label_pct_change": None})
                continue
            w_minus = sum(p[t - k : t + 1]) / (k + 1)
            w_plus = sum(p[t + h - k : t + h + 1]) / (k + 1)
            l = (w_plus - w_minus) / w_minus
            lab = 1 if l > theta else -1 if l < -theta else 0
            rows.append({"conv_id": conv_id, "turn_idx": int(g["turn_idx"].iloc[t]),
                         "label": lab, "label_pct_change": l})
    return pd.DataFrame(rows)
