import pytest

from feature_extractor_mbo_lob_spark import contract
from feature_extractor_mbo_lob_spark.config import PipelineConfig


def test_feature_count_is_pure_function_of_config():
    assert contract.feature_count((8, 32, 128)) == (
        len(contract.STATE_FEATURES)
        + 3 * len(contract.ROLLING_FEATURES)
        + len(contract.SIGNAL_FEATURES)
    )
    assert contract.feature_count((4,)) == (
        len(contract.STATE_FEATURES)
        + len(contract.ROLLING_FEATURES)
        + len(contract.SIGNAL_FEATURES)
    )


def test_feature_columns_match_count():
    for ws in [(8,), (8, 32), (8, 32, 128)]:
        assert len(contract.feature_columns(ws)) == contract.feature_count(ws)


def test_validate_feature_frame_rejects_missing():
    cols = contract.feature_columns((4, 8))
    contract.validate_feature_frame(cols, (4, 8))  # ok
    with pytest.raises(ValueError, match="missing contract columns"):
        contract.validate_feature_frame(cols[:-1], (4, 8))


def test_config_roundtrip_and_hash():
    c = PipelineConfig(window_sizes=(4, 8))
    c2 = PipelineConfig.from_json(c.to_json())
    assert c == c2
    assert c.config_hash() == c2.config_hash()
    assert c.config_hash() != PipelineConfig(window_sizes=(4, 16)).config_hash()
    assert c.feature_count() == contract.feature_count((4, 8))


def test_toml_config_loading(tmp_path):
    from feature_extractor_mbo_lob_spark.config import PipelineConfig

    toml = """
window_sizes = [4, 8]
volume_target = 123.0
[labels]
horizon = 7
horizons = [3, 7]
threshold = 0.02
"""
    p = tmp_path / "run.toml"
    p.write_text(toml)
    cfg = PipelineConfig.from_file(str(p))
    assert cfg.window_sizes == (4, 8)
    assert cfg.volume_target == 123.0
    assert cfg.labels.horizon == 7 and cfg.labels.horizons == (3, 7)
    assert cfg.labels.threshold == 0.02
    # JSON round-trip still agrees
    assert PipelineConfig.from_json(cfg.to_json()) == cfg
