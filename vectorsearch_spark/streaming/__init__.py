from vectorsearch_spark.streaming.ingest import stream_add
from vectorsearch_spark.streaming.rollup import (
    sessionize,
    stream_dedup_events,
    stream_enrich,
    stream_events_rollup,
)

__all__ = [
    "stream_add",
    "stream_events_rollup",
    "sessionize",
    "stream_dedup_events",
    "stream_enrich",
]
