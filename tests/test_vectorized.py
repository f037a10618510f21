"""The single-pass vectorized kernel must equal the declarative flagship
plan exactly (the fused-loop twin proof)."""

import pytest

from feature_extractor_mbo_lob_spark.config import PipelineConfig
from feature_extractor_mbo_lob_spark.plans import flagship_pipeline
from feature_extractor_mbo_lob_spark.plans.vectorized import vectorized_flagship
from feature_extractor_mbo_lob_spark.sources import synth_transcripts

CFG = PipelineConfig(window_sizes=(4, 8), warmup_turns=4, session_gap_s=600.0)


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: (t[0], t[1]),
    )


def test_vectorized_equals_declarative(spark):
    t = synth_transcripts(spark, n_convs=15, min_turns=5, max_turns=40,
                          n_mega_convs=1, mega_turns=200, seed=7).cache()
    a = _rows(flagship_pipeline(t, CFG, price_col="char_len"))
    b = _rows(vectorized_flagship(t, CFG, price_col="char_len"))
    assert len(a) == len(b)
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    assert not diffs, f"{len(diffs)} differing rows, e.g. {diffs[:1]}"


def test_vectorized_partition_independence(spark):
    t = synth_transcripts(spark, n_convs=10, seed=11).cache()
    a = _rows(vectorized_flagship(t, CFG))
    b = _rows(vectorized_flagship(t.repartition(13), CFG))
    assert a == b
