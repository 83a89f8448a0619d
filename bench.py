#!/usr/bin/env python
"""Bench harness — headline queries + the north-star pages pipeline.

Usage:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, ...extras}

The pages pipeline (parse → enrich → route → aggregate over the
synthetic Common-Crawl-style table, BASELINE.json north_rule) is benched
as ``pages_pipeline``; its docs/sec appears in extras. The pages table is
generated once per (sf, seed) and cached as parquet in /tmp so generation
cost never pollutes the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SEED = 42

# pages-table size scales with sf (sf0.1 → 40k pages, 3 log lines each);
# SPARK_GRAFT_PAGES_N overrides (bench_scaling uses a larger table so the
# parallel region dominates fixed job overhead)
_SF_FROM_DIR = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_PAGES = int(
    os.environ.get("SPARK_GRAFT_PAGES_N", max(int(400_000 * _SF_FROM_DIR), 200))
)

BENCH_QUERIES = [
    "pipeline_parse_route_agg",
    "cel_filter_accept",
    "json_mutate",
    "syslog_strip",
    "kv_roundtrip",
    "cef_roundtrip",
    "enrich_broadcast_agg",
    "agg_pricing_summary",
    "window_top_orders",
    "event_window_agg",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "token_count_agg",
    "quality_score",
    "lang_id",
    "asof_join",
    "sessionize",
    "dedup_ngram_jaccard",
    "join_shuffle_agg",
    "ann_lsh_topk",
    "multimodal_features",
]


def _pages_path() -> str:
    return f"/tmp/spark_graft_pages_n{N_PAGES}_s{SEED}.parquet"


def ensure_pages(spark) -> str:
    path = _pages_path()
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from collector_spark.datagen import write_pages

        write_pages(spark, path, N_PAGES, seed=SEED)
    return path


def run_pages_pipeline(spark, pages_path: str) -> dict:
    """The north-star job: scan pages → extract text + log lines (Arrow
    UDF over binary html) → CEL filter → JSON mutate → enrich (broadcast
    domain/tld lookups) → route → aggregate.

    ONE pass: per-category aggregation carries the per-route match sums,
    so per-sink counts (sum over categories) and the category rollup come
    out of a single map + one tiny shuffle — no persist, no second job.
    (Multi-sink WRITES need the persisted fan-out — that path is
    Pipeline.run_batch, exercised by the e2e tests and the verify drive;
    an aggregate-only pipeline should not pay a cache materialization.)"""
    from collector_spark.datagen import lookup_dfs
    from collector_spark.operators.cel import CelFilter
    from collector_spark.operators.enrich import url_domain, url_tld
    from collector_spark.operators.extract import HtmlExtractor
    from collector_spark.operators.json_mutate import JsonMutator
    from collector_spark.operators.router import Route, Router

    pages = spark.read.parquet(pages_path)
    lookups = lookup_dfs(spark, SEED)

    # native engines: the whole parse stage is Catalyst expressions
    # (regexp_extract_all/explode/replace) inside whole-stage codegen —
    # the pandas-UDF path is benchmarked separately as pages_extract_udf
    ex = HtmlExtractor(engine="native")
    lines = ex.log_lines(pages, keep_cols=("url",)).filter(
        F.col("value").startswith("{")
    )
    lines = CelFilter(
        rules=["event.code == 200 || event.code >= 400"], action="accept"
    ).apply(lines)
    lines = JsonMutator(
        add=[{"key": "pipeline", "value": "bench"}], engine="native"
    ).apply(lines)
    enriched = (
        lines.withColumn("domain", url_domain(F.col("url")))
        .withColumn("tld", url_tld(F.col("url")))
        .join(F.broadcast(lookups["domain_map"]), "domain", "left")
        .join(F.broadcast(lookups["tld_map"]), "tld", "left")
    )
    router = Router(
        [
            Route("ok", "event.code == 200"),
            Route("errors", "event.code >= 400"),
            Route("all", None),
        ]
    )
    aggs = [
        F.sum(col.cast("long")).alias(name) for name, col in router._route_cols()
    ]
    per_cat = enriched.groupBy("category").agg(*aggs).collect()
    counts = {
        name: int(sum(r[name] or 0 for r in per_cat))
        for name, _ in router._route_cols()
    }
    return {"sink_counts": counts, "n_categories": len(per_cat)}


def main() -> None:
    from collector_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        app_name="collector_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS * 2, 16),
    )

    queries = entry_mod.queries()
    timings: dict[str, float] = {}

    # warm the JVM and the Python-worker pool once (daemon fork + pandas/
    # pyarrow imports otherwise land on the first measured query)
    spark.range(1000).agg(F.sum("id")).collect()
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _warm(s):
        return s

    spark.range(100000, numPartitions=CPUS).select(_warm("id").alias("x")).agg(
        F.sum("x")
    ).collect()

    pages_path = ensure_pages(spark)

    # best-of-2 per query: this host exhibits multi-x wall-clock noise
    # spikes; min is the honest steady-state.
    for name in BENCH_QUERIES:
        fn = queries[name]
        reps = 2
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    # pages pipeline: best of 2 (this host shows multi-x wall-clock noise
    # spikes; the min is the honest steady-state figure)
    pages_sec = None
    for _ in range(2):
        t0 = time.perf_counter()
        result = run_pages_pipeline(spark, pages_path)
        dt = time.perf_counter() - t0
        pages_sec = dt if pages_sec is None or dt < pages_sec else pages_sec
    timings["pages_pipeline"] = round(pages_sec, 3)

    # the Arrow/pandas-UDF extraction path, measured honestly on its own
    from collector_spark.operators.extract import HtmlExtractor as _HX

    udf_sec = None
    for _ in range(2):
        t0 = time.perf_counter()
        _HX(engine="pandas").log_lines(spark.read.parquet(pages_path)).count()
        dt = time.perf_counter() - t0
        udf_sec = dt if udf_sec is None or dt < udf_sec else udf_sec
    timings["pages_extract_udf"] = round(udf_sec, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "e2e_parse_route_aggregate_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _SF_FROM_DIR,
        "pages_n": N_PAGES,
        "pages_docs_per_sec": round(N_PAGES / pages_sec, 1),
        "pages_sink_counts": result["sink_counts"],
        "cpus": CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
