from caffeonspark_spark.streaming.windows import (
    read_events_stream,
    tumbling_counts,
    sliding_counts,
    session_windows,
    dedup_stream,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_windows",
    "dedup_stream",
]
