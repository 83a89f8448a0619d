"""Structured Streaming variant of the pipeline."""

from collector_spark.streaming.stateful import running_counts  # noqa: F401
from collector_spark.streaming.stream_pipeline import (  # noqa: F401
    StreamingPipeline,
    dedup_stream,
    session_counts,
    windowed_counts,
)
