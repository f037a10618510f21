"""PySpark-native point-in-time feature-engineering engine.

A from-scratch Spark-first rebuild of the capabilities of
nagarx/feature-extractor-MBO-LOB (reference at /root/reference, Rust) over
multi-turn conversation transcripts:

    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

Everything is DataFrame/window algebra; pandas UDFs appear only where
semantics are genuinely sequential (triple-barrier first-touch, exact
volume-sampler replay). See SURVEY.md for the full operator mapping.
"""

from .config import LabelConfig, PipelineConfig  # noqa: F401
from .presets import PRESETS, Preset, config_from_preset, get_preset  # noqa: F401
from .session import get_spark  # noqa: F401
