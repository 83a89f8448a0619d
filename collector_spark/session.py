"""SparkSession factory tuned for this engine.

Local mode is the test/bench environment; the same settings are what we
would submit with ``spark-submit --py-files`` to a real cluster (AQE,
Arrow, skew-join handling are cluster-relevant, not local-only hacks).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "collector_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults follow the scale playbook: AQE on (runtime coalesce + skew
    join), Arrow on (all custom per-row logic is pandas-UDF based), UTC
    session timezone, shuffle partitions sized to cores not the 200
    default.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[*]"
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        if master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = max(int(master[6:-1]) * 2, 8)
        else:
            shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # throughput batch engine: ParallelGC beats G1 decisively on
        # allocation-heavy string/regex work at high thread counts
        # (measured 4-10x on this class of hardware); pause times are
        # irrelevant for batch. Applied to BOTH driver (== executor in
        # local mode) and executors (cluster submit).
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        # duplicate kv keys: last one wins, like a dict insert loop
        # (reference parseKeyValue, kv.go:130-136)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
