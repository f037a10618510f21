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


def test_preset_registry_widths_validated():
    """Named schema presets (reference: src/schema/presets.rs:13-64): each
    preset's declared width is a checked literal against the contract's
    width algebra, like the reference's 40/48/76/84/98/116 table."""
    import dataclasses

    import pytest

    from feature_extractor_mbo_lob_spark import PRESETS, get_preset
    from feature_extractor_mbo_lob_spark.presets import Preset

    assert set(PRESETS) == {"minimal", "deeplob", "tlob", "fi2010", "full"}
    widths = {n: p.expected_width for n, p in PRESETS.items()}
    assert widths == {"minimal": 31, "deeplob": 47, "tlob": 47,
                      "fi2010": 63, "full": 63}
    for p in PRESETS.values():
        assert p.expected_width == contract.feature_count(p.window_sizes)
        assert len(p.feature_columns()) == p.expected_width

    # a lying width literal is rejected at construction
    with pytest.raises(ValueError, match="declared width"):
        Preset(name="bad", description="", window_sizes=(8,),
               expected_width=99)
    with pytest.raises(ValueError, match="normalization"):
        Preset(name="bad", description="", window_sizes=(8,),
               normalization="wat", expected_width=31)
    with pytest.raises(ValueError, match="unknown preset"):
        get_preset("nope")

    # build_config carries the preset fields and preserves base knobs
    from feature_extractor_mbo_lob_spark import PipelineConfig

    base = PipelineConfig(session_gap_s=60.0)
    cfg = get_preset("deeplob").build_config(base)
    assert cfg.window_sizes == (8, 32)
    assert cfg.labels.horizons == (10, 20, 50)
    assert cfg.session_gap_s == 60.0
    assert cfg.feature_count() == 47


def test_preset_selectable_from_toml():
    from feature_extractor_mbo_lob_spark import PipelineConfig

    cfg = PipelineConfig.from_toml('preset = "minimal"\nwarmup_turns = 2\n')
    assert cfg.window_sizes == (8,)
    assert cfg.seq_window == 4
    assert cfg.warmup_turns == 2          # explicit key overrides preset
    assert cfg.feature_count() == 31
    # JSON path too
    cfg2 = PipelineConfig.from_json('{"preset": "fi2010"}')
    assert cfg2.window_sizes == (8, 32, 128)
    assert cfg2.labels.horizons == (1, 2, 3, 5, 10)
