"""The north-star pages job as a reusable plan builder.

scan pages → native extract of embedded log lines (regexp_extract_all +
explode inside whole-stage codegen; the binary html column never leaves
the scan stage) → CEL filter → JSON mutate (native add) → broadcast
enrich (domain/tld lookups) → ONE aggregation pass whose per-category
row carries the per-route match sums, so per-sink counts (sum over
categories) and the category rollup come from a single map + one tiny
shuffle.

Used by bench.py (throughput + scaling evidence) and by
tests/test_plans_scale.py (physical-plan assertions: exactly one
exchange, broadcast-only joins, html-only-in-scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.datagen import lookup_dfs
from collector_spark.operators.cel import CelFilter
from collector_spark.operators.enrich import url_domain, url_tld
from collector_spark.operators.extract import HtmlExtractor
from collector_spark.operators.json_mutate import JsonMutator
from collector_spark.operators.router import Route, Router

ROUTES = [
    Route("ok", "event.code == 200"),
    Route("errors", "event.code >= 400"),
    Route("all", None),
]


def build_pages_agg(spark: SparkSession, pages: DataFrame, seed: int = 42) -> DataFrame:
    """(category, ok, errors, all) — one row per category."""
    lookups = lookup_dfs(spark, seed)
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
    router = Router(ROUTES)
    aggs = [
        F.sum(col.cast("long")).alias(name) for name, col in router._route_cols()
    ]
    return enriched.groupBy("category").agg(*aggs)


def run_pages_pipeline(spark: SparkSession, pages_path: str, seed: int = 42) -> dict:
    per_cat = build_pages_agg(spark, spark.read.parquet(pages_path), seed).collect()
    counts = {
        r.name: int(sum(row[r.name] or 0 for row in per_cat)) for r in ROUTES
    }
    return {"sink_counts": counts, "n_categories": len(per_cat)}
