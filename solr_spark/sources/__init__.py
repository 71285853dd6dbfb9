"""Input adapters: where transcript tables come from.

The engine itself consumes DataFrames; this layer handles source formats and —
critically for resumable builds — derives the `input_token` lineage fingerprint
that keys the checkpoint manifests (indexing/manifest.py).
"""

from solr_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    input_fingerprint,
    read_transcripts,
    validate_transcripts,
)

__all__ = ["TRANSCRIPT_SCHEMA", "input_fingerprint", "read_transcripts",
           "validate_transcripts"]
