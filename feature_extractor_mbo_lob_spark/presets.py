"""Named feature-schema presets.

Mirrors the reference's paper-aligned preset layer (reference:
src/schema/presets.rs:13-64 `Preset` enum, src/contract.rs:27-39 validated
widths 40/48/76/84/98/116): each preset is a NAMED, validated bundle of
(window set, normalization strategy, sequence shape, label horizons) whose
feature width is a checked literal — a user selects ``"full"`` or
``"deeplob"`` instead of hand-assembling a config, and the width table is a
contract the tests pin, exactly like the reference's
``STABLE_FEATURE_COUNT``/``FULL_FEATURE_COUNT`` constants.

Transcript analogs of the reference presets (domain mapping per SURVEY §8):
the reference's raw-LOB level count becomes the rolling-window set; its
per-paper normalization (Z-score / bilinear) and horizon sets carry over
unchanged.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

from . import contract
from .config import PipelineConfig

_VALID_NORMALIZATION = ("none", "zscore", "minmax", "pct_change", "bilinear")


@dataclass(frozen=True)
class Preset:
    """One named, width-validated feature-schema configuration."""

    name: str
    description: str
    window_sizes: tuple[int, ...]
    normalization: str = "zscore"
    seq_window: int = 8
    seq_stride: int = 2
    horizons: tuple[int, ...] = (5, 10, 20)
    expected_width: int = 0  # validated literal, like contract.rs:27-39

    def __post_init__(self) -> None:
        if self.normalization not in _VALID_NORMALIZATION:
            raise ValueError(
                f"preset {self.name!r}: unknown normalization "
                f"{self.normalization!r} (valid: {_VALID_NORMALIZATION})"
            )
        actual = contract.feature_count(self.window_sizes)
        if self.expected_width != actual:
            raise ValueError(
                f"preset {self.name!r}: declared width {self.expected_width} "
                f"!= contract.feature_count({self.window_sizes}) = {actual}"
            )

    def build_config(self, base: PipelineConfig | None = None) -> PipelineConfig:
        """Materialize a PipelineConfig from this preset (optionally on top
        of a caller-provided base for non-preset knobs like session gap)."""
        base = base or PipelineConfig()
        return dataclasses.replace(
            base,
            window_sizes=self.window_sizes,
            seq_window=self.seq_window,
            seq_stride=self.seq_stride,
            labels=dataclasses.replace(base.labels, horizons=self.horizons),
        )

    def feature_columns(self) -> list[str]:
        return contract.feature_columns(self.window_sizes)


# Width algebra: len(STATE)=8 + |windows| * len(ROLLING)=16 + len(SIGNAL)=7.
PRESETS: dict[str, Preset] = {
    p.name: p
    for p in (
        Preset(
            name="minimal",
            description="Single fast window, no normalization — the quick-"
            "experiment schema (reference: Preset::Minimal, 40 raw).",
            window_sizes=(8,),
            normalization="none",
            seq_window=4,
            seq_stride=1,
            horizons=(5,),
            expected_width=31,
        ),
        Preset(
            name="deeplob",
            description="DeepLOB analog (Zhang et al. 2019): two windows, "
            "Z-score normalization, horizons {10,20,50} "
            "(reference: Preset::DeepLOB).",
            window_sizes=(8, 32),
            normalization="zscore",
            seq_window=8,
            seq_stride=2,
            horizons=(10, 20, 50),
            expected_width=47,
        ),
        Preset(
            name="tlob",
            description="TLOB analog (dual-attention transformer): bilinear "
            "normalization, horizons {10,20,50,100} "
            "(reference: Preset::TLOB).",
            window_sizes=(8, 32),
            normalization="bilinear",
            seq_window=8,
            seq_stride=2,
            horizons=(10, 20, 50, 100),
            expected_width=47,
        ),
        Preset(
            name="fi2010",
            description="FI-2010 analog (Ntakaris et al.): full handcrafted "
            "set over three timescales, Z-score "
            "(reference: Preset::FI2010, 144 total).",
            window_sizes=(8, 32, 128),
            normalization="zscore",
            seq_window=10,
            seq_stride=1,
            horizons=(1, 2, 3, 5, 10),
            expected_width=63,
        ),
        Preset(
            name="full",
            description="Every feature at every default timescale — the "
            "maximum schema (reference: Preset::Full, width 116).",
            window_sizes=(8, 32, 128),
            normalization="zscore",
            seq_window=8,
            seq_stride=2,
            horizons=(5, 10, 20),
            expected_width=63,
        ),
    )
}


def get_preset(name: str) -> Preset:
    try:
        return PRESETS[name]
    except KeyError:
        raise ValueError(
            f"unknown preset {name!r}; available: {sorted(PRESETS)}"
        ) from None


def config_from_preset(
    name: str, base: PipelineConfig | None = None
) -> PipelineConfig:
    return get_preset(name).build_config(base)
