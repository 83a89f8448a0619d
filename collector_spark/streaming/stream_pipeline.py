"""Streaming pipeline — the reference's timer-flushed daemon loop
(flush_frequency, e.g. internal/input/syslog/syslog.go:21,137) mapped to
Structured Streaming micro-batches.

The SAME processor chain / router / sinks used by the batch Pipeline run
inside ``foreachBatch`` — one code path for both modes (the reference has
one code path too: everything is a batch of lines). Watermarking handles
late events where the reference simply had none (§2.7 gap).

Exactly-once: Structured Streaming's checkpointLocation replaces the
manifest for source tracking; sink idempotence still comes from
deterministic ``batch_id=N`` output paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from collector_spark.pipeline import Pipeline


class StreamingPipeline:
    """Wrap a batch Pipeline for readStream sources."""

    def __init__(self, pipeline: Pipeline, checkpoint_dir: str):
        self.pipeline = pipeline
        self.checkpoint_dir = checkpoint_dir

    def start(
        self,
        stream_df: DataFrame,
        trigger_seconds: int = 300,  # reference default flush_frequency
    ) -> StreamingQuery:
        def process(batch_df: DataFrame, batch_id: int) -> None:
            self.pipeline.run_batch(batch_df, batch_id=int(batch_id))

        return (
            stream_df.writeStream.foreachBatch(process)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .start()
        )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session aggregation via the built-in session_window —
    works identically on batch and streams (with a watermark). The
    manual lag/cumsum sessionizer (__spark_entry__.q_sessionize) is the
    SQL-oracle-checkable equivalent; tests assert they agree."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exactly-once-per-key dedup with BOUNDED state: keys are
    remembered only within the watermark horizon
    (dropDuplicatesWithinWatermark), so state size is rate × horizon, not
    unbounded history — the 100 TB-stream requirement. At-least-once
    sources (kafka redelivery, the reference's replay-on-crash,
    manager.go:229-231) become exactly-once-observable downstream as long
    as redeliveries arrive within the horizon."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def windowed_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts with late-data watermark — the
    streaming aggregate the reference lacks entirely (SURVEY.md §2.7)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "cnt",
        )
    )
