"""Library-embedding plugin API (reference pkg/collector/collector.go:
197-231): register a custom source, processor, and sink by name, drive
them purely through a config — the 'collector.New → Register* → Start'
flow."""

from pyspark.sql import functions as F

from collector_spark.pipeline import Pipeline, PipelineConfig, SinkSpec
from collector_spark.registry import (
    PROCESSOR_REGISTRY,
    SINK_REGISTRY,
    register_processor,
    register_sink,
    register_source,
)
from collector_spark.sources.sources import SOURCE_REGISTRY


class UpperProcessor:
    def __init__(self, value_col="value", **_):
        self.value_col = value_col

    def apply(self, df):
        return df.withColumn(self.value_col, F.upper(F.col(self.value_col)))


class ListSource:
    def __init__(self, rows, **_):
        self.rows = rows

    def read_new(self, spark, state):
        offset = (state or {}).get("offset", 0)
        new = self.rows[offset:]
        df = spark.createDataFrame([(r,) for r in new] or [], "value: string")
        return df, {"offset": len(self.rows)}


class CollectSink:
    def __init__(self, **_):
        self.seen = []

    def write(self, df, batch_id=None):
        rows = [r.value for r in df.collect()]
        self.seen.extend(rows)
        return len(rows)


def test_custom_source_processor_sink_roundtrip(spark):
    register_processor("upper_test", UpperProcessor)
    register_source("list_test", ListSource)
    collected = CollectSink()
    register_sink("collect_test", lambda **kw: collected)
    try:
        config = PipelineConfig(
            instance_id="custom1",
            input={"kind": "list_test", "rows": ["a", "b"]},
            processors=[{"kind": "upper_test"}],
            sinks=[SinkSpec("out", "collect_test", None, {})],
        )
        pipe = Pipeline(config)
        rec = pipe.run_tick(spark)
        assert rec.per_sink_counts == {"out": 2}
        assert sorted(collected.seen) == ["A", "B"]
    finally:
        PROCESSOR_REGISTRY.pop("upper_test", None)
        SOURCE_REGISTRY.pop("list_test", None)
        SINK_REGISTRY.pop("collect_test", None)
