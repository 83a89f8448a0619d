"""As-of join semantics (operators/asof.py): DuckDB ASOF JOIN is the
ground truth (t.ts >= m.ts, latest match, left-outer)."""

from datetime import datetime

from pyspark.sql import functions as F

from collector_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _fixture(spark):
    trades = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T00:00:30")),
            (2, "a", _ts("2024-01-01T00:01:00")),  # exact-ts match
            (3, "a", _ts("2024-01-01T00:00:10")),  # before any mark → NULL
            (4, "b", _ts("2024-01-01T00:05:00")),
            (5, "c", _ts("2024-01-01T00:05:00")),  # key with no marks → NULL
        ],
        "event_id long, event_type string, ts timestamp",
    )
    marks = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T00:00:20"), 10.0),
            ("a", _ts("2024-01-01T00:01:00"), 20.0),
            ("b", _ts("2024-01-01T00:00:00"), 30.0),
        ],
        "event_type string, ts timestamp, mark_value double",
    )
    return trades, marks


def test_asof_backward(spark):
    trades, marks = _fixture(spark)
    out = {
        r.event_id: r.mark_value
        for r in asof_join(trades, marks, on=["event_type"], ts_col="ts").collect()
    }
    assert out == {1: 10.0, 2: 20.0, 3: None, 4: 30.0, 5: None}


def test_asof_forward(spark):
    trades, marks = _fixture(spark)
    out = {
        r.event_id: r.mark_value
        for r in asof_join(
            trades, marks, on=["event_type"], ts_col="ts", direction="forward"
        ).collect()
    }
    # forward: earliest mark with mark.ts >= trade.ts
    assert out == {1: 20.0, 2: 20.0, 3: 10.0, 4: None, 5: None}


def test_asof_keeps_all_left_rows_and_columns(spark):
    trades, marks = _fixture(spark)
    out = asof_join(trades, marks, on=["event_type"], ts_col="ts")
    assert out.count() == trades.count()
    assert out.columns == ["event_id", "event_type", "ts", "mark_value"]


def test_asof_single_shuffle_plan(spark):
    """The plan must be union → one exchange on the key → window; no
    join/cross-product node (that is the 100-TB design constraint)."""
    trades, marks = _fixture(spark)
    plan = asof_join(trades, marks, on=["event_type"], ts_col="ts")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 2  # key shuffle (+AQE coalesce variants)


def test_asof_matches_duckdb(spark, sf_dir):
    import duckdb

    import __spark_entry__ as entry_mod

    df = entry_mod.q_asof_join(spark, sf_dir)
    got = {r.event_id: r.mark_value for r in df.collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    exp = dict(con.execute(entry_mod.oracle_sql()["asof_join"]).fetchall())
    assert got == exp


def test_asof_null_timestamps_never_match(spark):
    """NULL-ts right rows sort first under the asc sweep and used to
    become the backward match for every left row; NULL-ts left rows
    swept up every right row in the forward (desc) ordering. Both must
    yield NULL, like DuckDB ASOF JOIN."""
    from collector_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("a", 10, 1), ("a", None, 2)], "k string, ts long, lid long"
    )
    right = spark.createDataFrame(
        [("a", None, 99.0), ("a", 5, 1.5)], "k string, ts long, price double"
    )
    for direction in ("backward", "forward"):
        got = {
            r.lid: r.price
            for r in asof_join(
                left, right, on=["k"], ts_col="ts", direction=direction
            ).collect()
        }
        assert got[2] is None, direction  # NULL-ts left row: no match
        if direction == "backward":
            assert got[1] == 1.5  # real match, never the NULL-ts 99.0
        else:
            assert got[1] is None  # no right.ts >= 10
