"""Structured Streaming surface (north-star extension; the reference is
pure batch — SURVEY §2.7). Same logical aggregations as the batch catalog
(hourly_event_rollup et al.), expressed over readStream with watermarks."""

from enterprise_warp_spark.streaming.events import (  # noqa: F401
    sessionized_activity,
    stream_events,
    streaming_dedup,
    windowed_rollup,
)
