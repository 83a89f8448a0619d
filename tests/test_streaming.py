"""Structured Streaming pipeline: file stream → processor chain →
foreachBatch sinks with checkpoint, plus watermarked windowed counts."""

import json
import os
import time

import pytest

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


def test_streaming_crash_after_sink_before_checkpoint_commit(spark, tmp_path):
    """At-least-once + idempotent sinks = exactly-once observable output
    (the manager.go:229-231 resume contract, streaming flavor): the
    query CRASHES after the sink write + manifest commit for batch 1 but
    BEFORE Structured Streaming commits its checkpoint. On restart from
    the same checkpoint dir Spark replays batch 1 with the same files;
    the pipeline manifest marks it committed so the replay is a no-op —
    no duplicates, no loss."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "f1.txt").write_text(
        "\n".join(json.dumps({"code": 200, "i": i}) for i in range(10))
    )
    config = PipelineConfig(
        instance_id="crash1",
        processors=[{"kind": "cel", "rules": ["event.code == 200"]}],
        sinks=[SinkSpec("out", "parquet", None, {"path": str(tmp_path / "out")})],
    )
    pipe = Pipeline(config, state_dir=str(tmp_path / "state"))
    ckpt = str(tmp_path / "ckpt")

    # batch 0: clean run
    sp = StreamingPipeline(pipe, checkpoint_dir=ckpt)
    q = sp.start(spark.readStream.text(str(in_dir)), trigger_seconds=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # batch 1: crash AFTER run_batch (sink written, manifest committed)
    (in_dir / "f2.txt").write_text(
        "\n".join(json.dumps({"code": 200, "i": 100 + i}) for i in range(5))
    )

    def crashing_process(batch_df, batch_id):
        pipe.run_batch(batch_df, batch_id=int(batch_id))
        if int(batch_id) >= 1:
            raise RuntimeError("injected crash before checkpoint commit")

    q2 = (
        spark.readStream.text(str(in_dir))
        .writeStream.foreachBatch(crashing_process)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        with pytest.raises(Exception):
            q2.processAllAvailable()
    finally:
        q2.stop()

    # the sink DID get batch 1's rows; the streaming checkpoint did NOT
    # commit batch 1 (commits dir holds batch 0 only)
    assert (tmp_path / "out" / "batch_id=1").exists()
    commits = {
        c for c in os.listdir(os.path.join(ckpt, "commits")) if not c.startswith(".")
    }
    assert commits == {"0"}

    # restart clean from the same checkpoint: batch 1 replays, the
    # manifest no-ops it, and the query moves on
    q3 = sp.start(spark.readStream.text(str(in_dir)), trigger_seconds=1)
    try:
        q3.processAllAvailable()
    finally:
        q3.stop()

    commits = {
        c for c in os.listdir(os.path.join(ckpt, "commits")) if not c.startswith(".")
    }
    assert "1" in commits
    out = spark.read.parquet(str(tmp_path / "out"))
    vals = sorted(json.loads(r.value)["i"] for r in out.collect())
    # exactly once per input line: 10 from f1, 5 from f2, no dupes/loss
    assert vals == list(range(10)) + [100 + i for i in range(5)]


def test_socket_source_syslog_stream(spark):
    """syslog-over-TCP path: a local server feeds the socket source; the
    syslog processor strips PRI on the stream (reference syslog input +
    processor chained, internal/input/syslog + processor/syslog)."""
    import socket
    import threading

    import pytest

    from collector_spark.operators.syslog import SyslogParser
    from collector_spark.sources.sources import SocketSource

    lines = ["<13>hello world", "<99>second message"]
    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    def serve():
        try:
            conn, _ = server.accept()
            conn.sendall(("\n".join(lines) + "\n").encode())
            time.sleep(8)
            conn.close()
        except OSError:
            pass

    threading.Thread(target=serve, daemon=True).start()

    stream = SocketSource("127.0.0.1", port).stream(spark)
    out = SyslogParser("raw").apply(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sock")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("select count(*) c from sock").collect()[0].c >= 2:
                break
            time.sleep(0.5)
        rows = {r.value for r in spark.sql("select value from sock").collect()}
        if not rows:
            pytest.skip("loopback socket streaming unavailable in this sandbox")
        assert rows == {"hello world", "second message"}
    finally:
        q.stop()
        server.close()


def test_stateful_running_counts_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: per-key totals must ACCUMULATE across
    micro-batches (file 2 arrives after the first trigger) — the
    cross-batch state the reference cannot express."""
    from collector_spark.streaming.stateful import running_counts

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "b1.json").write_text(
        "\n".join(
            json.dumps(e)
            for e in [
                {"event_type": "click", "value": 1.0},
                {"event_type": "click", "value": 2.0},
                {"event_type": "view", "value": 5.0},
            ]
        )
    )
    stream = spark.readStream.schema("event_type string, value double").json(
        str(in_dir)
    )
    out = running_counts(stream, key_col="event_type", value_col="value")
    q = (
        out.writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        (in_dir / "b2.json").write_text(
            json.dumps({"event_type": "click", "value": 10.0})
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("select * from running").collect()
    # last update per key wins
    latest = {}
    for r in rows:
        latest[r.key] = r
    assert latest["click"].total_rows == 3
    assert latest["click"].total_value == 13.0
    assert latest["click"].batches == 2
    assert latest["view"].total_rows == 1
    assert latest["view"].batches == 1


def test_stateful_state_survives_query_restart(spark, tmp_path):
    """applyInPandasWithState state must be RESTORED from the state
    store on a fresh query over the same checkpoint dir — the per-key
    totals keep accumulating after a stop/restart, they don't reset
    (the cross-restart half of the stateful contract; the cross-batch
    half is test_stateful_running_counts_across_microbatches)."""
    from collector_spark.streaming.stateful import running_counts

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "b1.json").write_text(
        json.dumps({"event_type": "click", "value": 1.0})
        + "\n"
        + json.dumps({"event_type": "click", "value": 2.0})
    )

    emitted = []

    def start():
        # memory sink cannot recover from a checkpoint; foreachBatch can
        stream = spark.readStream.schema("event_type string, value double").json(
            str(in_dir)
        )
        out = running_counts(stream, key_col="event_type", value_col="value")
        return (
            out.writeStream.foreachBatch(
                lambda bdf, bid: emitted.extend(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # new file arrives while no query is running; a FRESH query resumes
    # from the checkpoint and must continue the totals
    (in_dir / "b2.json").write_text(json.dumps({"event_type": "click", "value": 10.0}))
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    latest = {r.key: r for r in emitted}
    r = latest["click"]
    assert r.total_rows == 3 and r.total_value == 13.0
    assert r.batches == 2  # one pre-restart batch + one post-restart


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed aggregation with a 10-minute watermark: an
    event arriving after the watermark passed its window must be dropped
    (late-data semantics the reference has no concept of, SURVEY §2.7)."""
    from collector_spark.streaming.stream_pipeline import windowed_counts

    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def write(name, rows):
        (in_dir / name).write_text(
            "\n".join(json.dumps({"ts": ts, "event_type": et}) for ts, et in rows)
        )

    # window 10:00-11:00 gets 2 events; the 12:30 event advances the
    # watermark to 12:20 > 11:00 so that window finalizes
    write("b1.json", [
        ("2024-01-01 10:00:00", "click"),
        ("2024-01-01 10:05:00", "click"),
        ("2024-01-01 12:30:00", "click"),
    ])
    stream = spark.readStream.schema("ts timestamp, event_type string").json(
        str(in_dir)
    )
    out = windowed_counts(stream, ts_col="ts", key_col="event_type",
                          window="1 hour", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # a LATE event for the already-finalized 10:00 window + a fresh one
        write("b2.json", [
            ("2024-01-01 10:30:00", "click"),   # late → must be dropped
            ("2024-01-01 14:30:00", "click"),   # advances watermark past 13:00
        ])
        q.processAllAvailable()
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        (r.window_start.isoformat(), r.event_type): r.cnt
        for r in spark.sql("select * from late").collect()
    }
    # the 10:00 window finalized at cnt=2; the late 10:30 event did NOT
    # reopen or re-emit it
    assert rows[("2024-01-01T10:00:00", "click")] == 2
    # the 12:00 window emitted once the watermark passed 13:00
    assert rows[("2024-01-01T12:00:00", "click")] == 1


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a redelivered key inside the
    horizon is suppressed (at-least-once source → exactly-once-observable
    output) with state bounded by the watermark, not unbounded history."""
    from collector_spark.streaming import dedup_stream

    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def write(name, rows):
        (in_dir / name).write_text(
            "\n".join(json.dumps({"ts": ts, "k": k}) for ts, k in rows)
        )

    write("b1.json", [
        ("2024-01-01 10:00:00", "a"),
        ("2024-01-01 10:00:30", "a"),   # duplicate within horizon → dropped
        ("2024-01-01 10:01:00", "b"),
    ])
    stream = spark.readStream.schema("ts timestamp, k string").json(str(in_dir))
    out = dedup_stream(stream, ["k"], ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # redelivery of 'a' in a later microbatch, still within horizon
        write("b2.json", [
            ("2024-01-01 10:02:00", "a"),
            ("2024-01-01 10:03:00", "c"),
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    keys = sorted(r.k for r in spark.sql("select * from sdedup").collect())
    assert keys == ["a", "b", "c"], keys


def test_session_window_matches_manual_sessionizer(spark, sf_dir):
    """The built-in session_window aggregate must produce the same
    (user, session_start, n_events) sessions as the manual lag/cumsum
    sessionizer (q_sessionize — the DuckDB-checked one)."""
    import __spark_entry__ as entry_mod
    from collector_spark.streaming.stream_pipeline import session_counts

    manual = {
        (r.user_id, r.session_start): r.n_events
        for r in entry_mod.q_sessionize(spark, sf_dir).collect()
    }
    builtin = {
        (r.user_id, r.session_start): r.n_events
        for r in session_counts(
            spark.read.parquet(f"{sf_dir}/events.parquet"),
            ts_col="ts",
            key_col="user_id",
            gap="30 minutes",
        ).collect()
    }
    assert builtin == manual


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
