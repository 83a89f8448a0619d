"""Salting (operators/salt.py): salted join/agg must be row-identical to
the plain versions while spreading hot keys over many buckets."""

from pyspark.sql import functions as F

from collector_spark.operators.salt import salted_agg_count, salted_join


def _skewed(spark, n=2000):
    # 90% of rows share one key — the Zipf head
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("cold"), (F.col("id") % 50).cast("string"))
        ).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [("hot", 1), ("cold3", 2), ("missing", 9)], ["k", "r"]
    )
    plain = left.join(right, "k").select("k", "v", "r")
    salted = salted_join(left, right, on=["k"], buckets=8).select("k", "v", "r")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left = _skewed(spark, 200)
    right = spark.createDataFrame([("hot", 1)], ["k", "r"])
    plain = left.join(right, "k", "left").select("k", "v", "r")
    salted = salted_join(left, right, on=["k"], buckets=4, how="left").select(
        "k", "v", "r"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_count_matches_groupby(spark):
    df = _skewed(spark)
    plain = {r.k: r.cnt for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r.k: r.cnt for r in salted_agg_count(df, ["k"], buckets=8).collect()}
    assert plain == salted


def test_salt_spreads_hot_key(spark):
    from collector_spark.operators.salt import salt_col

    df = _skewed(spark).withColumn("_salt", salt_col(8, F.col("v")))
    hot_salts = (
        df.filter(F.col("k") == "hot").select("_salt").distinct().count()
    )
    assert hot_salts == 8  # every bucket gets a share of the hot key
