"""Structured Streaming operators.

The reference is batch MapReduce only (SURVEY.md §2.C: streaming
"None"); this module extends the engine's event surface to streams
with the standard Spark constructs: file/rate sources, watermarked
windowed aggregation, and stateful sessionization via
applyInPandasWithState. Batch twins of these live in queries.py
(events_hourly / events_sessionize) so semantics are cross-checked
batch-vs-stream in tests.
"""

from cascading_hive_spark.streaming.jobs import (  # noqa: F401
    hourly_counts,
    session_windows_stream,
    sessionize_stream,
    stream_events,
)
