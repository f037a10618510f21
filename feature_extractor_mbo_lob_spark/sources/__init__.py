from .transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    ORACLE_TRANSCRIPTS_CTE,
    read_transcripts,
    synth_transcripts,
    transcripts_from_events,
)
from .jsonl import read_jsonl, CORRUPT_COL  # noqa: F401
