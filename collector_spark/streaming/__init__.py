"""Structured Streaming variant of the pipeline."""

from collector_spark.streaming.stream_pipeline import StreamingPipeline  # noqa: F401
