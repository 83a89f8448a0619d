"""collector_spark — a from-scratch, PySpark-native re-implementation of the
capabilities of ThoronicLLC/collector (reference at /root/reference, Go).

The reference is a single-node, line-at-a-time log ETL daemon:
one input -> ordered processors -> fan-out outputs, with resume state
(see /root/reference/internal/app/manager/manager.go:73-235).

This package re-expresses the same semantics Spark-first:

- rows are DataFrame rows (``value: string`` for log-shaped data, or the
  web-scale ``pages`` schema ``(url, warc_ts, html binary, text, lang)``);
- processors are declarative DataFrame transforms (Catalyst optimizes:
  predicate pushdown, column pruning, whole-stage codegen);
- per-row custom logic lives in vectorized pandas/Arrow UDFs only;
- fan-out sinks share one persisted upstream plan;
- resume state is a checkpoint manifest table committed AFTER sinks
  (at-least-once, idempotent replay via deterministic output paths —
  reference semantics per manager.go:171-235).
"""

__version__ = "0.1.0"

from collector_spark.session import get_spark  # noqa: F401
from collector_spark.collector import Collector  # noqa: F401
from collector_spark.pipeline import (  # noqa: F401
    Pipeline,
    PipelineConfig,
    SinkSpec,
    load_instances,
)
