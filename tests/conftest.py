import pytest

from feature_extractor_mbo_lob_spark import PipelineConfig, get_spark
from feature_extractor_mbo_lob_spark.sources import synth_transcripts


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fex-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg():
    return PipelineConfig(window_sizes=(4, 8), sample_every_n=2, warmup_turns=4)


@pytest.fixture(scope="session")
def transcripts(spark):
    """Small deterministic corpus shared by tests (cached once)."""
    df = synth_transcripts(spark, n_convs=25, min_turns=5, max_turns=40, seed=42)
    df.cache().count()
    return df
