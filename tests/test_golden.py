"""Golden-fixture parity: the Spark engine vs the naive pandas reference,
allclose(rtol=1e-9, atol=1e-10) at EVERY (conv_id, turn_idx) — the port of
the reference's golden-snapshot pyramid level (tests/golden_snapshot.rs,
FLOAT_CMP_EPS=1e-10), with per-group checksums for fault localization."""

import numpy as np
import pytest

from feature_extractor_mbo_lob_spark.config import PipelineConfig
from feature_extractor_mbo_lob_spark.plans import build_features
from feature_extractor_mbo_lob_spark.labeling import tlob_labels
from pyspark.sql import functions as F

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from pandas_reference import reference_features, reference_tlob  # noqa: E402

CFG = PipelineConfig(window_sizes=(4, 8), warmup_turns=4, session_gap_s=900.0)

GROUPS = {
    "state": [c for c in CFG.feature_columns() if not c.endswith(("_w4", "_w8"))],
    "rolling_w4": [c for c in CFG.feature_columns() if c.endswith("_w4")],
    "rolling_w8": [c for c in CFG.feature_columns() if c.endswith("_w8")],
}


@pytest.fixture(scope="module")
def frames(spark, transcripts):
    spark_out = build_features(transcripts, CFG).toPandas()
    ref_out = reference_features(transcripts.toPandas(), CFG)
    key = ["conv_id", "turn_idx"]
    s = spark_out.sort_values(key).reset_index(drop=True)
    r = ref_out.sort_values(key).reset_index(drop=True)
    assert len(s) == len(r)
    assert (s["conv_id"].values == r["conv_id"].values).all()
    assert (s["turn_idx"].values == r["turn_idx"].values).all()
    return s, r


def test_golden_allclose_every_row(frames):
    s, r = frames
    bad = []
    for c in CFG.feature_columns():
        a, b = s[c].to_numpy(float), r[c].to_numpy(float)
        if not np.allclose(a, b, rtol=1e-9, atol=1e-10):
            i = int(np.argmax(~np.isclose(a, b, rtol=1e-9, atol=1e-10)))
            bad.append((c, i, a[i], b[i]))
    assert not bad, f"{len(bad)} feature columns diverge: {bad[:5]}"


def test_golden_group_checksums(frames):
    """Per-group checksums localize faults like the reference's grouped
    golden comparison (golden_snapshot.rs per-group checksums)."""
    s, r = frames
    for gname, cols in GROUPS.items():
        cs = float(np.nansum([s[c].to_numpy(float).sum() for c in cols]))
        cr = float(np.nansum([r[c].to_numpy(float).sum() for c in cols]))
        assert abs(cs - cr) <= 1e-6 * max(1.0, abs(cr)), (gname, cs, cr)


def test_golden_tlob_labels(spark, transcripts):
    cfg = PipelineConfig(labels=CFG.labels)
    series = transcripts.select(
        "conv_id", "turn_idx", "ts",
        F.coalesce(F.length("text"), F.lit(0)).cast("double").alias("p"),
    )
    s = tlob_labels(series, cfg, price_col="p").select(
        "conv_id", "turn_idx", "label", "label_pct_change"
    ).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pdf = transcripts.toPandas()
    pdf["p"] = pdf["text"].str.len().fillna(0).astype(float)
    r = reference_tlob(pdf, cfg, "p").sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(s) == len(r)
    s_lab = s["label"].astype("float64").fillna(99).to_numpy()
    r_lab = r["label"].astype("float64").fillna(99).to_numpy()
    assert (s_lab == r_lab).all()
    mask = ~r["label_pct_change"].isna().to_numpy()
    assert np.allclose(
        s["label_pct_change"].to_numpy(float)[mask],
        r["label_pct_change"].astype(float).to_numpy()[mask],
        rtol=1e-9, atol=1e-10,
    )
