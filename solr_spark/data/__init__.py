from solr_spark.data.transcripts import (
    synth_transcripts_pandas,
    synth_transcripts_spark,
    transcripts_from_documents,
)

__all__ = [
    "synth_transcripts_pandas",
    "synth_transcripts_spark",
    "transcripts_from_documents",
]
