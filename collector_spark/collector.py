"""The reference's public embedding API (pkg/collector/collector.go:30-231)
as a multi-instance facade over Pipeline.

Reference surface → here:

| reference                       | here                                  |
|---------------------------------|---------------------------------------|
| collector.New(cfg)              | Collector(state_dir=...)              |
| c.Start(id, config)             | start(id, config) — binds + validates |
| c.Stop(id) / c.StopAll()        | stop(id) / stop_all()                 |
| c.Status(id) / c.ListStatus()   | status(id) / list_status()            |
| c.List()                        | list()                                |
| c.RegisterInput/Processor/Output| register_source/processor/sink        |
|                                 | (collector_spark.registry, shared)    |
| manager goroutine loop          | tick(id) / tick_all() — the daemon    |
|                                 | tick, driven by the caller's cadence  |

The reference runs one goroutine manager per instance; in Spark the
driver is the scheduler, so ticks are explicit (or via
``submit.py --ticks``) — same lifecycle, no hidden threads."""

from __future__ import annotations

from pyspark.sql import SparkSession

from collector_spark.checkpoint import BatchRecord, Status
from collector_spark.pipeline import Pipeline, PipelineConfig


class Collector:
    def __init__(self, state_dir: str | None = None):
        self.state_dir = state_dir
        self._instances: dict[str, Pipeline] = {}

    def start(self, instance_id: str, config: PipelineConfig | dict | str) -> Pipeline:
        """Bind an instance (reference Start, collector.go:66-153):
        config is validated and plugins bound HERE — a bad config never
        becomes a registered instance. Accepts a PipelineConfig, a plain
        dict, or a JSON string."""
        import json as _json

        if instance_id in self._instances:
            raise ValueError(f"instance {instance_id!r} already started")
        if isinstance(config, str):
            config = _json.loads(config)
        if isinstance(config, dict):
            config = PipelineConfig.from_json(
                _json.dumps({**config, "instance_id": instance_id})
            )
        config.instance_id = instance_id
        pipe = Pipeline(config, state_dir=self.state_dir)
        self._instances[instance_id] = pipe
        return pipe

    def stop(self, instance_id: str) -> None:
        """Unregister (reference Stop, collector.go:155-164); sources with
        listeners/receipts get their stop() called."""
        pipe = self._instances.pop(instance_id, None)
        if pipe is None:
            raise KeyError(instance_id)
        stop_fn = getattr(pipe.source, "stop", None)
        if callable(stop_fn):
            stop_fn()

    def stop_all(self) -> None:
        for iid in list(self._instances):
            self.stop(iid)

    def list(self) -> list[str]:
        return sorted(self._instances)

    def status(self, instance_id: str) -> Status:
        pipe = self._instances[instance_id]
        if pipe.manifest is None:
            raise ValueError("status requires a state_dir-backed Collector")
        return pipe.manifest.status()

    def list_status(self) -> dict[str, Status]:
        return {iid: self.status(iid) for iid in self.list()}

    def tick(self, spark: SparkSession, instance_id: str, on_error: str = "drop") -> BatchRecord:
        """One daemon tick for one instance (the manager loop body,
        manager.go:73-177): read-new → process → outputs → commit.
        on_error='drop' mirrors the reference's log-and-continue."""
        return self._instances[instance_id].run_tick(spark, on_error=on_error)

    def tick_all(self, spark: SparkSession, on_error: str = "drop") -> dict[str, BatchRecord]:
        return {
            iid: self.tick(spark, iid, on_error=on_error)
            for iid in self.list()
            if self._instances[iid].source is not None
        }
