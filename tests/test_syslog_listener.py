"""Syslog listener: RFC6587 octet-counting / non-transparent framing,
automatic detection, UDP datagrams, and the live TCP/UDP listener e2e
(reference internal/input/syslog/syslog.go:20-181, format.go:9-37)."""

import socket
import time

import pytest

from collector_spark.sources.syslog_listener import (
    FrameDecoder,
    SyslogListenerSource,
    extract_message,
)


def test_framing_newline_delimited():
    dec = FrameDecoder("raw")
    assert dec.feed(b"one\ntwo\r\nthr") == ["one", "two"]
    assert dec.feed(b"ee\n") == ["three"]
    assert dec.flush() == []


def test_framing_octet_counted():
    dec = FrameDecoder("RFC6587")
    msg = b"<34>1 2024-01-01T00:00:00Z h app - - - hi"
    frame = str(len(msg)).encode() + b" " + msg
    # split across arbitrary TCP segment boundaries
    assert dec.feed(frame[:10]) == []
    assert dec.feed(frame[10:] + frame) == [msg.decode()] * 2


def test_framing_rfc6587_non_transparent_fallback():
    # leading non-digit → LF-framed even in RFC6587 mode (go-syslog split)
    dec = FrameDecoder("RFC6587")
    assert dec.feed(b"<34>plain line\n") == ["<34>plain line"]


def test_framing_automatic_mixed():
    dec = FrameDecoder("automatic")
    assert dec.feed(b"5 hello<34>lf line\n") == ["hello", "<34>lf line"]


def test_framing_huge_length_prefix_falls_back_to_lf():
    """A digit-leading line that is NOT octet-counted (e.g. starts with
    an epoch timestamp) must not stall the connection waiting for GBs —
    lengths over MAX_FRAME fall back to LF framing."""
    dec = FrameDecoder("automatic")
    assert dec.feed(b"1629381122 host application started\n") == [
        "1629381122 host application started"
    ]
    assert dec.feed(b"next\n") == ["next"]  # stream continues normally


def test_framing_segmented_digit_line_never_emits_partial():
    """A digit-leading plain line split mid-digits by TCP must NOT be
    emitted partially (the rest would be misparsed as a length prefix) —
    the decoder waits for the LF, then LF-frames the whole line."""
    dec = FrameDecoder("automatic")
    assert dec.feed(b"123456789012345") == []
    assert dec.feed(b"67890 msg\n") == ["12345678901234567890 msg"]
    assert dec.feed(b"next\n") == ["next"]


def test_framing_strict_mode_accepts_large_frames_and_resyncs():
    dec = FrameDecoder("RFC6587")
    # a frame above the automatic-mode plausibility cap is still a legal
    # octet-counted frame in strict mode (payload may contain LFs)
    big = b"x" * (6 * 1024 * 1024 - 10) + b"\nwith lf\n"
    frame = str(len(big)).encode() + b" " + big
    got = dec.feed(frame)
    assert got == [big.decode().rstrip("\n")]
    # a length beyond HARD_MAX is a protocol violation: resync at next LF
    assert dec.feed(b"99999999999999 garbage\n16 <34>after resync") == [
        "<34>after resync"
    ]


def test_framing_flush_emits_unterminated_tail():
    dec = FrameDecoder("raw")
    assert dec.feed(b"partial") == []
    assert dec.flush() == ["partial"]


def test_framing_property_roundtrip_under_random_segmentation():
    """Property: any message sequence, octet-counted-encoded and split at
    arbitrary TCP segment boundaries, decodes to exactly the original
    messages in order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    msg = st.text(
        alphabet=st.characters(blacklist_characters="\r", blacklist_categories=("Cs",)),
        min_size=1,
        max_size=60,
    ).map(lambda s: s.strip()).filter(lambda s: s and not s.isdigit())

    @settings(max_examples=60, deadline=None)
    @given(msgs=st.lists(msg, min_size=1, max_size=8), data=st.data())
    def run(msgs, data):
        wire = b"".join(
            str(len(m.encode())).encode() + b" " + m.encode() for m in msgs
        )
        dec = FrameDecoder("RFC6587")
        out = []
        i = 0
        while i < len(wire):
            cut = data.draw(st.integers(min_value=1, max_value=len(wire) - i))
            out.extend(dec.feed(wire[i : i + cut]))
            i += cut
        out.extend(dec.flush())
        assert out == [m for m in msgs if m]

    run()


def test_extract_message_formats():
    m3164 = "<34>Oct 11 22:14:15 host su: 'su root' failed"
    m5424 = "<165>1 2003-10-11T22:14:15.003Z host evntslog - ID47 - an event"
    assert extract_message(m3164, "RFC3164") == "su: 'su root' failed"
    assert extract_message(m5424, "RFC5424") == "an event"
    # automatic: tries 5424 then 3164, raw passthrough on failure
    assert extract_message(m5424, "automatic") == "an event"
    assert extract_message(m3164, "automatic") == "su: 'su root' failed"
    assert extract_message("not syslog", "automatic") == "not syslog"
    assert extract_message(m3164, "raw") == m3164


def _wait_for(cond, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.05)
    return False


def test_listener_tcp_octet_and_udp_datagrams(spark):
    src = SyslogListenerSource(port=0, protocol="both", format="RFC6587").start()
    try:
        msg = b"<34>1 2024-01-01T00:00:00Z h app - - - tcp-hello"
        frame = str(len(msg)).encode() + b" " + msg
        with socket.create_connection(("127.0.0.1", src.tcp_port), timeout=5) as s:
            s.sendall(frame + b"<34>lf-msg\n")
        u = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        u.sendto(b"<34>udp-hello", ("127.0.0.1", src.udp_port))
        u.close()
        assert _wait_for(lambda: len(src._messages) >= 3), src._messages

        df, state = src.read_new(spark, None)
        got = sorted(r.value for r in df.collect())
        # RFC6587 format extracts the 5424 MSG part; unparseable pass raw
        assert got == ["<34>lf-msg", "<34>udp-hello", "tcp-hello"]
        assert state["received"] == 3

        # drained: next read is empty, state accumulates
        df2, state2 = src.read_new(spark, state)
        assert df2.count() == 0 and state2["received"] == 3
    finally:
        src.stop()


def test_listener_drives_full_pipeline_tick(spark, tmp_path):
    """End-to-end: syslog UDP datagrams → listener buffer → run_tick
    (process, fan out, commit) — the reference's syslog-input daemon
    loop with the Spark engine behind it."""
    import json as _json

    from collector_spark.pipeline import Pipeline, PipelineConfig, SinkSpec

    src = SyslogListenerSource(port=0, protocol="udp", format="RFC5424").start()
    try:
        u = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for i, code in enumerate([200, 400, 200]):
            body = _json.dumps({"code": code, "i": i})
            msg = f"<165>1 2024-01-01T00:00:0{i}Z host app - ID{i} - {body}"
            u.sendto(msg.encode(), ("127.0.0.1", src.udp_port))
        u.close()
        assert _wait_for(lambda: len(src._messages) >= 3), src._messages

        config = PipelineConfig(
            instance_id="sys1",
            processors=[{"kind": "cel", "rules": ["event.code == 200"]}],
            sinks=[SinkSpec("ok", "file", None, {"path": str(tmp_path / "ok")})],
        )
        pipe = Pipeline(config, state_dir=str(tmp_path / "state"))
        pipe.source = src
        rec = pipe.run_tick(spark)
        # RFC5424 MSG extraction leaves the JSON body; cel keeps code 200
        assert rec.per_sink_counts == {"ok": 2}
        assert rec.source_state["received"] == 3
        got = sorted(
            _json.loads(r.value)["i"]
            for r in spark.read.text(str(tmp_path / "ok" / "batch_id=0")).collect()
        )
        assert got == [0, 2]
    finally:
        src.stop()


def test_listener_registered_and_validated():
    from collector_spark.sources.sources import make_source

    src = make_source("syslog", port=0, protocol="udp", format="automatic")
    assert isinstance(src, SyslogListenerSource)
    assert src.udp_port is None  # not started at bind time
    with pytest.raises(ValueError):
        make_source("syslog", protocol="sctp")
    with pytest.raises(ValueError):
        make_source("syslog", format="RFC9999")


def test_listener_start_is_atomic_on_bind_conflict(spark):
    """If one protocol binds and the other fails (port collision), NO
    half-started listener lingers: the bound socket is closed, state is
    reset, and stop() cannot deadlock on a never-served socket."""
    blocker = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    blocker.bind(("127.0.0.1", 0))
    port = blocker.getsockname()[1]
    try:
        src = SyslogListenerSource(port=port, protocol="both", format="raw")
        with pytest.raises(OSError):
            src.start()  # TCP may bind, UDP collides → full teardown
        assert src._servers == [] and src._threads == []
        assert src.tcp_port is None and src.udp_port is None
        src.stop()  # must not hang or raise
        # TCP port was released by the teardown: we can bind it now
        probe = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        probe.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        probe.bind(("127.0.0.1", port))
        probe.close()
    finally:
        blocker.close()


def test_listener_stays_stopped_after_stop(spark):
    """read_new after an explicit stop() must NOT resurrect listeners."""
    src = SyslogListenerSource(port=0, protocol="udp", format="raw").start()
    src.stop()
    df, _ = src.read_new(spark, None)
    assert df.count() == 0
    assert src._servers == []  # no silent restart
    # an explicit restart is allowed
    src.start()
    assert src._servers
    src.stop()


def test_listener_autostarts_on_first_tick(spark):
    """A conf-driven syslog instance never calls start() — the first
    read_new brings the listeners up."""
    from collector_spark.sources.sources import make_source

    src = make_source("syslog", port=0, protocol="udp", format="raw")
    try:
        df, state = src.read_new(spark, None)
        assert df.count() == 0 and src.udp_port is not None
        u = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        u.sendto(b"hello-from-conf", ("127.0.0.1", src.udp_port))
        u.close()
        assert _wait_for(lambda: len(src._messages) >= 1)
        df2, state2 = src.read_new(spark, state)
        assert [r.value for r in df2.collect()] == ["hello-from-conf"]
        assert state2["received"] == 1
    finally:
        src.stop()
