from .events import (
    stream_events_from_parquet,
    streaming_tumbling_counts,
    run_stream_to_memory,
)

__all__ = [
    "stream_events_from_parquet",
    "streaming_tumbling_counts",
    "run_stream_to_memory",
]
