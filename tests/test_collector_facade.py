"""Collector facade — the reference's public embedding API
(pkg/collector/collector.go:30-231): Start/Stop/Status/List lifecycle
over multiple instances, tick-driven."""

import pytest

from collector_spark import Collector
from collector_spark.sources.sources import QueuePollerSource


def _conf(out_dir, rules=None):
    return {
        "processors": [{"kind": "cel", "rules": rules or ["event.code >= 0"]}],
        "sinks": [
            {"name": "out", "kind": "file", "predicate": None,
             "config": {"path": str(out_dir)}}
        ],
    }


def test_lifecycle_start_tick_status_stop(spark, tmp_path):
    c = Collector(state_dir=str(tmp_path / "state"))

    queue = [['{"code": 200}', '{"code": 404}']]
    pipe = c.start("a", _conf(tmp_path / "a"))
    pipe.source = QueuePollerSource(lambda n: queue.pop(0) if queue else [])
    c.start("b", _conf(tmp_path / "b"))

    assert c.list() == ["a", "b"]

    records = c.tick_all(spark)
    assert set(records) == {"a"}  # b has no input block → not ticked
    assert records["a"].per_sink_counts == {"out": 2}

    st = c.status("a")
    assert st.last_successful_result_count == 2
    assert not st.has_errors
    assert set(c.list_status()) == {"a", "b"}

    c.stop("a")
    assert c.list() == ["b"]
    with pytest.raises(KeyError):
        c.stop("a")
    c.stop_all()
    assert c.list() == []


def test_start_rejects_bad_config_and_duplicates(tmp_path):
    from collector_spark.operators.cel import CelSyntaxError

    c = Collector(state_dir=str(tmp_path / "state"))
    # bad CEL fails at Start, never becomes an instance (collector.go:83-125)
    with pytest.raises(CelSyntaxError):
        c.start("bad", _conf(tmp_path / "x", rules=["event ==="]))
    assert c.list() == []
    # bad sink config (schema validation) also fails at Start
    with pytest.raises(ValueError):
        c.start("bad2", {"sinks": [{"name": "o", "kind": "file",
                                    "predicate": None, "config": {}}]})
    c.start("a", _conf(tmp_path / "a"))
    with pytest.raises(ValueError):
        c.start("a", _conf(tmp_path / "a"))


def test_tick_all_isolates_failing_instances(spark, tmp_path):
    """One instance's SOURCE failure (which escapes run_tick even with
    on_error='drop') must not stall the other instances — reference
    per-manager isolation; the error lands in status()."""
    c = Collector(state_dir=str(tmp_path / "state"))

    def boom_receiver(n):
        raise RuntimeError("receiver down")

    bad = c.start("bad", _conf(tmp_path / "bad"))
    bad.source = QueuePollerSource(boom_receiver)
    queue = [['{"code": 200}']]
    good = c.start("good", _conf(tmp_path / "good"))
    good.source = QueuePollerSource(lambda n: queue.pop(0) if queue else [])

    records = c.tick_all(spark)
    assert records["bad"].failed
    assert records["good"].per_sink_counts == {"out": 1}
    assert "receiver down" in c.status("bad").errors[0]


def test_stateless_collector_status(spark, tmp_path):
    """Without a state_dir the status API still works (the reference's
    Status is an in-memory roll-up)."""
    c = Collector()  # no state_dir
    queue = [['{"code": 200}', '{"code": 201}']]
    pipe = c.start("a", _conf(tmp_path / "a"))
    pipe.source = QueuePollerSource(lambda n: queue.pop(0) if queue else [])
    c.tick(spark, "a")
    st = c.status("a")
    assert st.last_successful_result_count == 2
    assert not st.has_errors
    assert set(c.list_status()) == {"a"}


def test_start_does_not_mutate_caller_config(tmp_path):
    from collector_spark.pipeline import PipelineConfig

    cfg = PipelineConfig.from_dict({"instance_id": "orig", **_conf(tmp_path / "a")})
    c = Collector(state_dir=str(tmp_path / "state"))
    c.start("a", cfg)
    c.start("b", cfg)
    assert cfg.instance_id == "orig"  # caller's object untouched
    assert c._instances["a"].config.instance_id == "a"
    assert c._instances["b"].config.instance_id == "b"


def test_stop_closes_listener_sources(tmp_path):
    c = Collector(state_dir=str(tmp_path / "state"))
    pipe = c.start("sys", {**_conf(tmp_path / "s"),
                           "input": {"kind": "syslog", "port": 0,
                                     "protocol": "udp", "format": "raw"}})
    pipe.source.start()
    assert pipe.source.udp_port is not None
    c.stop("sys")
    assert pipe.source._servers == []  # listener shut down
