#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion (no real cluster in this sandbox): run the SAME pages pipeline
on the SAME input at local[8] and local[32], report docs/sec at both and
eff = T8_wall / T32_wall ... expressed as throughput(32) / (4 × throughput(8)).

Each parallelism level runs in a fresh subprocess (own JVM) so executor
thread pools, shuffle partitions, and memory are configured per level.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
os.environ["SPARK_GRAFT_SF_DIR"] = %(sf_dir)r
os.environ["SPARK_GRAFT_CPUS"] = str(%(cpus)d)
import bench
from collector_spark.session import get_spark
spark = get_spark(app_name="scalebench", master="local[%(cpus)d]",
                  shuffle_partitions=%(cpus)d * 2)
from pyspark.sql import functions as F
spark.range(1000).agg(F.sum("id")).collect()  # JVM warm
path = bench.ensure_pages(spark)
# measure steady-state: best of %(reps)d reps
best = None
for _ in range(%(reps)d):
    t0 = time.perf_counter()
    res = bench.run_pages_pipeline(spark, path)
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print("RESULT " + json.dumps({"cpus": %(cpus)d, "sec": best,
                              "docs_per_sec": bench.N_PAGES / best,
                              "sink_counts": res["sink_counts"]}))
"""


def run_level(cpus: int, sf_dir: str, reps: int = 3) -> dict:
    code = CHILD % {"repo": REPO, "sf_dir": sf_dir, "cpus": cpus, "reps": reps}
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"level {cpus} failed:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    r8 = run_level(8, sf_dir)
    r32 = run_level(32, sf_dir)
    eff = r32["docs_per_sec"] / (4.0 * r8["docs_per_sec"])
    speedup = r32["docs_per_sec"] / r8["docs_per_sec"]
    result = {
        "metric": "scaling_efficiency_local8_to_local32",
        "value": round(eff, 3),
        "unit": "ratio",
        "docs_per_sec_8": round(r8["docs_per_sec"], 1),
        "docs_per_sec_32": round(r32["docs_per_sec"], 1),
        "speedup_4x_cores": round(speedup, 2),
        "counts_equal": r8["sink_counts"] == r32["sink_counts"],
        "sf_dir": sf_dir,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured scaling evidence

North-rule criterion: throughput scaling efficiency >= 0.8 between N and
4N executors. Sandbox substitution (no real cluster): the SAME pages
pipeline (parse -> enrich -> route -> aggregate over the deterministic
synthetic Common-Crawl-style table) on the SAME input, local[8] vs
local[32], fresh JVM each, best of 3 steady-state reps.

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[8]  | {r8['sec']:.2f} | {r8['docs_per_sec']:.1f} |
| local[32] | {r32['sec']:.2f} | {r32['docs_per_sec']:.1f} |

- speedup at 4x cores: **{speedup:.2f}x**
- scaling efficiency eff = T32/(4*T8) = **{eff:.3f}** (target >= 0.8)
- per-sink counts identical across levels: {r8['sink_counts'] == r32['sink_counts']}
- sink counts: {json.dumps(r8['sink_counts'])}

Reproduce: `python bench_scaling.py` (env `SPARK_GRAFT_SF_DIR` to change scale).
"""
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
