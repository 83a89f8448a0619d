"""sf1 spot-bench (round-4 VERDICT #8): run the top-10 headline queries
at sf0.1 and at the 10x deterministic upsample (/tmp/sf1, built by
tools/upsample_sf.py) and report the per-row slowdown ratio

    per_row_ratio = sf1_sec / (10 * sf01_sec)

Linear scaling => ratio ≈ 1.0 (fixed job overhead makes big-input ratios
come in UNDER 1). The VERDICT line is ratio ≤ 1.5 per query, else the
complexity cliff gets named and fixed.

Usage: python tools/spot_bench_sf1.py  (writes one JSON line to stdout)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPOT_QUERIES = [
    # parse family (Arrow pandas-UDF primaries + native grok)
    "cef_roundtrip",
    "kv_roundtrip",
    "grok_access_log",
    "json_mutate",
    # CEL (struct-macro JSON parse was a named cliff candidate)
    "cel_filter_struct_macro",
    # dedup family
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "dedup_span_removal",
    # ANN + corpus join
    "ann_ivf_kmeans_topk",
    "contamination_check",
]

SF01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1", "/tmp/sf1")
SCALE = float(os.environ.get("SPARK_GRAFT_SF1_SCALE", 10.0))


def main() -> None:
    import __spark_entry__ as entry
    from collector_spark import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(master=f"local[{cpus}]")
    qs = entry.queries()

    # warm the Python workers + codegen so the first measured query does
    # not pay daemon fork + pandas import (CLAUDE.md: 10-40x on cold)
    qs["dedup_simhash"](spark, SF01).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    out = {}
    for name in SPOT_QUERIES:
        fn = qs[name]
        secs = {}
        for label, sf_dir in (("sf01", SF01), ("sf1", SF1)):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            spark.catalog.clearCache()
            secs[label] = round(best, 3)
        ratio = round(secs["sf1"] / (SCALE * secs["sf01"]), 3)
        out[name] = {**secs, "per_row_ratio": ratio}
        print(f"# {name}: sf01={secs['sf01']}s sf1={secs['sf1']}s per_row_ratio={ratio}", file=sys.stderr)

    worst = max(out, key=lambda k: out[k]["per_row_ratio"])
    print(json.dumps({
        "metric": "sf1_spot_per_row_ratio_worst",
        "value": out[worst]["per_row_ratio"],
        "worst_query": worst,
        "unit": "ratio",
        "scale": SCALE,
        "queries": out,
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
