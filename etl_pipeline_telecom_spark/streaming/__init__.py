"""Structured Streaming surface (SURVEY.md §2.10 extensions).

The reference is batch-only; these are the streaming forms of the
event-time plans in ``plans/eventtime.py``, asserted equal to the batch
results in tests and (where the result is deterministic) registered in
the catalog with the SAME DuckDB oracle as the batch form.
"""

from .source import read_events_stream
from .jobs import run_available_now, stream_tumbling_counts, stream_session_agg, stream_dedup
from .stateful import sessionize_with_state, sessionize_with_tws

__all__ = [
    "read_events_stream",
    "run_available_now",
    "stream_tumbling_counts",
    "stream_session_agg",
    "stream_dedup",
    "sessionize_with_state",
    "sessionize_with_tws",
]
