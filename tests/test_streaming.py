"""Structured Streaming pipeline: file stream → processor chain →
foreachBatch sinks with checkpoint, plus watermarked windowed counts."""

import json
import os
import time

from pyspark.sql import functions as F

from collector_spark.pipeline import Pipeline, PipelineConfig, SinkSpec
from collector_spark.streaming import StreamingPipeline
from collector_spark.streaming.stream_pipeline import windowed_counts


def test_streaming_pipeline_foreachbatch(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "f1.txt").write_text(
        "\n".join(json.dumps({"code": 200, "i": i}) for i in range(20))
        + "\n"
        + json.dumps({"code": 500, "i": 99})
    )

    config = PipelineConfig(
        instance_id="stream1",
        processors=[{"kind": "cel", "rules": ["event.code == 200"]}],
        sinks=[SinkSpec("out", "parquet", None, {"path": str(tmp_path / "out")})],
    )
    pipe = Pipeline(config, state_dir=str(tmp_path / "state"))
    sp = StreamingPipeline(pipe, checkpoint_dir=str(tmp_path / "ckpt"))

    stream = spark.readStream.text(str(in_dir))
    q = sp.start(stream.withColumnRenamed("value", "value"), trigger_seconds=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(str(tmp_path / "out" / "batch_id=0"))
    assert out.count() == 20
    assert all(json.loads(r.value)["code"] == 200 for r in out.collect())

    # restart with a NEW file: exactly-once file tracking continues from
    # the checkpoint — only the new file is processed, as batch 1
    (in_dir / "f2.txt").write_text(json.dumps({"code": 200, "i": 1000}))
    q2 = sp.start(spark.readStream.text(str(in_dir)), trigger_seconds=1)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    batches = [d for d in os.listdir(tmp_path / "out") if d.startswith("batch_id=")]
    assert sorted(batches) == ["batch_id=0", "batch_id=1"]
    b1 = spark.read.parquet(str(tmp_path / "out" / "batch_id=1"))
    assert [json.loads(r.value)["i"] for r in b1.collect()] == [1000]


def test_windowed_counts_batch_semantics(spark, sf_dir):
    """windowed_counts is stream-first but the same plan runs on a batch
    DF — verify the tumbling-window math against a groupBy date_trunc."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = windowed_counts(ev, ts_col="ts", key_col="event_type", window="1 hour")
    expected = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    g = {(r.window_start, r.event_type): r.cnt for r in got.collect()}
    e = {(r.window_start, r.event_type): r.cnt for r in expected.collect()}
    assert g == e
