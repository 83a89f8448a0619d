"""A/B probe for the pages_extract_udf "regression" (round-4 VERDICT #4).

extract.py has not changed since round 2 and the pages parquet is
content-addressed by (n, seed), so any r3d→r4 delta in pages_extract_udf
is environmental. This probe interleaves, in ONE session:

    [cpu calibration, bus calibration, extract timing] x ROUNDS

and reports each round plus the best-of-run numbers. If the best
extract raw lands near the r3d anchor (1.221 s) when the cpu
calibration is near its idle anchor (5.893 s), the r4 number (3.13 s
raw in a 0.74-factor window) is proven a window artifact. If extract
stays high while cpu calibration is idle, the bus rounds show whether
DRAM bandwidth (the Arrow transfer bottleneck) explains the residual.

Usage: python tools/ab_extract.py   (one JSON line to stdout)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", 4))


def main() -> None:
    import bench
    from collector_spark import get_spark
    from collector_spark.operators.extract import HtmlExtractor

    spark = get_spark(master=f"local[{bench.CPUS}]")
    pages_path = bench.ensure_pages(spark)
    pages = spark.read.parquet(pages_path)

    # warm: codegen + Python daemon fork + pandas import
    HtmlExtractor(engine="pandas").log_lines(pages).count()

    rounds = []
    for i in range(ROUNDS):
        cal = bench._calibrate(spark)
        bus = bench._bw_calibrate()
        t0 = time.perf_counter()
        HtmlExtractor(engine="pandas").log_lines(pages).count()
        ext = round(time.perf_counter() - t0, 3)
        rounds.append({"cpu_cal": cal, "bus_cal": bus, "extract": ext})
        print(f"# round {i}: cal={cal} bus={bus} extract={ext}", file=sys.stderr)

    best_ext = min(r["extract"] for r in rounds)
    best_cal = min(r["cpu_cal"] for r in rounds)
    best_bus = min(r["bus_cal"] for r in rounds)
    print(json.dumps({
        "metric": "pages_extract_udf_ab",
        "value": best_ext,
        "unit": "sec",
        "rounds": rounds,
        "best_extract_sec": best_ext,
        "best_cpu_cal_sec": best_cal,
        "best_bus_cal_sec": best_bus,
        "r3d_anchor": {"extract_sec": 1.221, "cpu_cal_sec": 5.893},
        "extract_normalized": round(best_ext * 5.893 / best_cal, 3),
        "pages_n": bench.N_PAGES,
        "cpus": bench.CPUS,
    }))


if __name__ == "__main__":
    main()
