"""Sinks (the reference's "outputs"). Every sink takes a DataFrame and
writes it, returning the written row count — the reference's
``Output.Write(inputFile) (count, error)`` contract
(/root/reference/pkg/core/output.go:3-7)."""

from collector_spark.sinks.sinks import (  # noqa: F401
    ConsoleSink,
    FileSink,
    ParquetSink,
    SINK_REGISTRY,
    make_sink,
)
