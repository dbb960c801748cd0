"""Structured Streaming operators — new capability vs the batch-only
reference (SURVEY 2.E 'streaming': absent there, driver-mandated here)."""

from mongo_arrow_spark.streaming.changes import (
    apply_changes,
    change_event_ddl,
    diff_snapshots,
    maintain_snapshot,
    watch,
)
from mongo_arrow_spark.streaming.events import (
    read_document_stream,
    sessionized,
    stream_dedup,
    stream_dedup_within_watermark,
    running_totals_stateful,
    sessionize_stateful,
    windowed_aggregate,
)

__all__ = [
    "read_document_stream",
    "windowed_aggregate",
    "sessionized",
    "stream_dedup",
    "stream_dedup_within_watermark",
    "running_totals_stateful",
    "sessionize_stateful",
    "watch",
    "change_event_ddl",
    "diff_snapshots",
    "apply_changes",
    "maintain_snapshot",
]
