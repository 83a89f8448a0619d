"""Plugin registries — name → stage factory.

Mirrors the reference's handler maps
(/root/reference/pkg/collector/collector.go:14-21,197-231): users register
custom inputs/processors/outputs by name; configs reference them by name.
Here a "processor" factory returns an object with
``apply(DataFrame) -> DataFrame``; a sink has ``write(df, batch_id) -> int``.
"""

from __future__ import annotations

from typing import Callable

from collector_spark.operators.cel import CelFilter
from collector_spark.operators.csv_parse import CsvParser
from collector_spark.operators.grok import GrokParser
from collector_spark.operators.json_mutate import JsonMutator
from collector_spark.operators.kv import KvParser
from collector_spark.operators.syslog import SyslogParser
from collector_spark.sinks import SINK_REGISTRY, make_sink
from collector_spark.sources.sources import SOURCE_REGISTRY, make_source

PROCESSOR_REGISTRY: dict[str, Callable] = {
    "cel": CelFilter,
    "json": JsonMutator,
    "syslog": SyslogParser,
    "kv": KvParser,
    "grok": GrokParser,
    "csv": CsvParser,
}


def register_processor(name: str, factory: Callable) -> None:
    PROCESSOR_REGISTRY[name] = factory


def register_sink(name: str, factory: Callable) -> None:
    SINK_REGISTRY[name] = factory


def register_source(name: str, factory: Callable) -> None:
    """Reference RegisterInput (pkg/collector/collector.go:197-207): a
    source factory returns an object with
    ``read_new(spark, state) -> (DataFrame, state)`` (batch) and/or
    ``stream(spark) -> DataFrame``."""
    SOURCE_REGISTRY[name] = factory


def make_processor(kind: str, **config):
    from collector_spark.validation import validate_config

    try:
        cls = PROCESSOR_REGISTRY[kind]
    except KeyError:
        raise ValueError(
            f"unknown processor {kind!r}; registered: {sorted(PROCESSOR_REGISTRY)}"
        ) from None
    validate_config("processor", kind, config)
    return cls(**config)


__all__ = [
    "PROCESSOR_REGISTRY",
    "SINK_REGISTRY",
    "SOURCE_REGISTRY",
    "register_processor",
    "register_sink",
    "register_source",
    "make_processor",
    "make_sink",
    "make_source",
]
