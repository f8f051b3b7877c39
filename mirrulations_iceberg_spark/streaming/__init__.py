"""Structured-Streaming surface (SURVEY Phase 5).

The reference ingests incrementally with a sequential Python loop and
resume bookkeeping (``convert_to_iceberg.py:956-1121``); here that is
a checkpointed file-source stream with an idempotent ``foreachBatch``
sink, plus watermarked event-time aggregation over the events table.
"""

from .incremental import stream_comments
from .joins import attributed_purchases
from .windows import windowed_event_counts

__all__ = ["attributed_purchases", "stream_comments", "windowed_event_counts"]
