"""Bucketed co-located joins (catalog.write_bucketed): two tables
bucketed on the same key must join with ZERO shuffle exchanges —
the write-time pre-shuffle that makes repeated big joins affordable."""

from pyspark.sql import functions as F

from collector_spark.catalog import Catalog
from collector_spark.plans.inspect import executed_plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    cat = Catalog(spark, root=str(tmp_path))
    orders = spark.range(0, 10000).select(
        F.col("id").alias("o_id"), (F.col("id") % 97).alias("k"), F.rand(1).alias("v")
    )
    items = spark.range(0, 30000).select(
        (F.col("id") % 10000).alias("o_id"), F.col("id").alias("item_id")
    )
    cat.write_bucketed(orders, "t_orders", ["o_id"], buckets=8)
    cat.write_bucketed(items, "t_items", ["o_id"], buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a real (non-broadcast) join so bucketing is what's tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = cat.read_bucketed("t_orders")
        b = cat.read_bucketed("t_items")
        joined = a.join(b, "o_id")
        assert joined.count() == 30000
        plan = executed_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hash" not in plan, plan  # co-located: no shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders")
        spark.sql("DROP TABLE IF EXISTS t_items")
