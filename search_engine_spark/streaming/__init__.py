from search_engine_spark.streaming.ingest import (
    IncrementalIndexer,
    streaming_hourly_event_stats,
    streaming_sessionize,
)

__all__ = [
    "IncrementalIndexer",
    "streaming_hourly_event_stats",
    "streaming_sessionize",
]
