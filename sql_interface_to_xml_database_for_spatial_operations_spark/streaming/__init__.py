"""Structured Streaming operators (beyond-reference — SURVEY.md §2.9).

The reference is pure request/response; this package adds the streaming
surface a modern engine needs: watermarked tumbling/sliding/session
windows and keyed dedup over an event stream. The batch-checkable
semantics live in ``operators.events_ops`` (oracle-verified); here the
same logic runs incrementally with state + watermarks.
"""

from .windows import (
    enrich_stream,
    read_events_stream,
    stateful_user_totals,
    sessionized,
    sliding_counts,
    stream_dedup,
    stream_stream_join,
    tumbling_counts,
)

__all__ = [
    "enrich_stream",
    "read_events_stream",
    "stateful_user_totals",
    "stream_stream_join",
    "tumbling_counts",
    "sliding_counts",
    "sessionized",
    "stream_dedup",
]
