#!/usr/bin/env python
"""Multi-sink fan-out bench → BENCH/FANOUT.md.

Measures the full reference fan-out semantics — Pipeline.run_batch with
the persisted tagged pass and three physical sinks (two predicated
parquet + one catch-all text), per-sink counts, per-partition lineage,
manifest commit — over the same cached pages table bench_scaling uses
(SPARK_GRAFT_PAGES_N pages, default 1.6M). One JSON line on stdout.

Round-2 relevance: sink counts now come from observe() on the write
action instead of re-reading the written output, so this wall time is
the direct evidence for the count-back removal.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_PAGES_N", "1600000")

import bench
from collector_spark.operators.extract import HtmlExtractor
from collector_spark.pipeline import Pipeline, PipelineConfig, SinkSpec
from collector_spark.session import get_spark

from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT = "/tmp/spark_graft_fanout"


def main() -> None:
    spark = get_spark(
        app_name="fanout_bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 2
    )
    from pyspark.sql import functions as FF

    spark.range(1000).agg(FF.sum("id")).collect()  # JVM warm
    path = bench.ensure_pages(spark)
    pages = spark.read.parquet(path)
    lines = (
        HtmlExtractor(engine="native")
        .log_lines(pages)
        .filter(F.col("value").startswith("{"))
    )

    best = None
    record = None
    for rep in range(2):  # rep 1 warms python workers; rep 2 measures
        shutil.rmtree(OUT, ignore_errors=True)
        config = PipelineConfig(
            instance_id="fanout",
            processors=[
                # keep every JSON line (round-1 FANOUT shape: ok + errors
                # partition the batch, catch-all gets everything)
                {"kind": "cel", "rules": ["event.code >= 0"]},
                {"kind": "json", "add": [{"key": "env", "value": "prod"}]},
            ],
            sinks=[
                SinkSpec("ok", "parquet", "event.code == 200", {"path": f"{OUT}/ok"}),
                SinkSpec("errors", "parquet", "event.code != 200", {"path": f"{OUT}/errors"}),
                SinkSpec("all", "file", None, {"path": f"{OUT}/all"}),
            ],
        )
        pipe = Pipeline(config, state_dir=f"{OUT}/state")
        t0 = time.perf_counter()
        record = pipe.run_batch(lines, batch_id=rep)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best

    total_rows = sum(record.per_sink_counts.values())
    n_pages = bench.N_PAGES
    result = {
        "metric": "fanout_run_batch_wall",
        "value": round(best, 2),
        "unit": "sec",
        "cpus": CPUS,
        "pages_n": n_pages,
        "sink_counts": record.per_sink_counts,
        "sink_rows_per_sec": round(total_rows / best, 1),
        "docs_per_sec": round(n_pages / best, 1),
        "partitions": len(record.partition_counts),
    }
    print(json.dumps(result))

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "FANOUT.md"), "w") as f:
        f.write(f"""# BENCH/FANOUT — multi-sink write path at scale

The aggregate-only flagship (BASELINE.md) measures parse→route→agg; this
measures the full REFERENCE fan-out semantics — `Pipeline.run_batch`
with the persisted tagged pass and three physical sinks (two predicated
parquet + one catch-all text), per-sink counts, per-partition lineage,
manifest commit — on {n_pages:,} pages / {3 * n_pages:,} extracted lines,
local[{CPUS}], best of 2 (rep 1 warms Python workers):

- wall: **{best:.1f} s** end-to-end, all sink writes included — counts
  come from `observe()` on the write pass (round 2 removed the
  count-back re-read of written output)
- rows written across sinks: {total_rows:,} (ok {record.per_sink_counts['ok']:,} +
  errors {record.per_sink_counts['errors']:,} + all {record.per_sink_counts['all']:,})
  → **~{total_rows / best / 1000:.0f}k sink-rows/s**, ~{n_pages / best / 1000:.0f}k docs/s
- per-partition lineage recorded for {len(record.partition_counts)} partitions;
  manifest committed after sinks

Reproduce: `python bench_fanout.py` (env `SPARK_GRAFT_PAGES_N`,
`SPARK_GRAFT_CPUS`); same shape as
`tests/test_pipeline_e2e.py::test_pipeline_end_to_end_with_manifest`.
""")


if __name__ == "__main__":
    main()
