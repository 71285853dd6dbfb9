"""Streaming / incremental layer: topic(), daemon(), NRT segment adds, windows."""

from solr_spark.streaming.topic import (
    daemon,
    index_stream,
    signature_ledger_init,
    topic_poll,
    windowed_counts,
)

__all__ = ["daemon", "index_stream", "signature_ledger_init",
           "topic_poll", "windowed_counts"]
