"""Multiline log merge — fold continuation lines (stack traces, wrapped
messages) into their parent record.

The reference's line model is strictly one-record-per-line
(internal/input/file reads line-wise; processors never join lines), so
Java stack traces and indented continuations arrive as broken records.
This operator supplies the standard logstash-multiline semantics as a
Catalyst plan: a line matching ``start_pattern`` BEGINS a record; every
following non-start line (within the same stream) is appended to it.

Scale shape: ONE window shuffle partitioned by the stream column (a
file path / source id — bounded-size groups by construction: one log
file's lines), ordered by the line-number column. The record id is the
running count of start flags (a cumulative sum — Spark evaluates it
with a single sort within the stream partition), and the merge itself
is a groupBy concat. Leading orphan continuation lines (before any
start line) get record id 0 and are emitted as their own record —
droppable by the caller via ``drop_orphans``.

DuckDB replays the exact plan: SUM(flag) OVER (PARTITION BY stream
ORDER BY line_no), then string_agg ordered by line_no.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_multiline"]


def merge_multiline(
    df: DataFrame,
    start_pattern: str,
    stream_col: str = "path",
    order_col: str = "line_no",
    value_col: str = "value",
    sep: str = "\n",
    drop_orphans: bool = False,
) -> DataFrame:
    """(stream, record_no, first line's order, merged text, n_lines).

    ``start_pattern`` is an unanchored Java/RE2-portable regex (same
    dialect contract as CEL matches()); lines that match begin a new
    record, everything else appends to the current one.
    """
    flag = F.col(value_col).rlike(start_pattern).cast("int")
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lines = df.withColumn("_rec", F.sum(flag).over(w))
    if drop_orphans:
        lines = lines.filter(F.col("_rec") > 0)
    return (
        lines.groupBy(stream_col, "_rec")
        .agg(
            F.min(order_col).alias("start_line"),
            # sort_array on (order, line) structs: deterministic merge
            # order whatever the aggregation arrival order
            F.concat_ws(
                sep,
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("v"))
                        )
                    ),
                    lambda s: s["v"],
                ),
            ).alias("record"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            F.col(stream_col),
            F.col("_rec").alias("record_no"),
            "start_line",
            "record",
            "n_lines",
        )
    )
