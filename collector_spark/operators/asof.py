"""As-of (point-in-time) join — a custom operator the reference lacks
(SURVEY.md §2.7 gap list; the msgraph cursor `internal/input/msgraph/
msgraph.go:105-132` is the closest reference analogue of time-ordered
lookup).

Semantics: for every left row, attach the value of the most recent right
row with ``right.ts <= left.ts`` within the same key group (DuckDB /
kdb ASOF JOIN semantics, left-outer: unmatched left rows keep NULL).

Scale design — NOT a range cross-join: both sides are unioned with a
side marker, shuffled ONCE on the join key, and swept with a single
``last(value, ignorenulls=True)`` ordered window (right rows sort before
left rows at equal timestamps so an exact-ts match is visible). Cost is
one shuffle + one sort per key partition — the same plan shape Spark
uses for any window aggregate, so it survives a 1000-executor scale-up
as long as single keys fit a partition (salt upstream if one key
dominates; see operators/salt.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# right rows must sort BEFORE left rows at an identical timestamp so the
# left row can see an exact-ts right match (ASOF `>=` semantics)
_RIGHT_MARKER = 0
_LEFT_MARKER = 1


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left-outer as-of join; returns all left columns + right value_cols.

    direction='backward' (default): latest right.ts <= left.ts.
    direction='forward': earliest right.ts >= left.ts.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != ts_col
    ]
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.lit(_LEFT_MARKER).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r = right.select(
        *[
            F.col(c)
            if (c in on or c == ts_col)
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.lit(_RIGHT_MARKER).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    # NULL-timestamp RIGHT rows sort first under asc ordering and would
    # become the backward match for EVERY left row (DuckDB ASOF returns
    # no match for them); they can never satisfy right.ts <= left.ts
    r = r.filter(F.col(ts_col).isNotNull())
    unioned = l.unionByName(r)

    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts_col).desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    swept = unioned.select(
        *left_cols,
        F.col("__side"),
        *[
            # a NULL-ts LEFT row can satisfy neither ts bound (in the
            # desc/forward ordering nulls sort LAST and would otherwise
            # sweep up every right row)
            F.when(
                F.col(ts_col).isNotNull(),
                F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w),
            ).alias(c)
            for c in value_cols
        ],
    )
    return swept.filter(F.col("__side") == _LEFT_MARKER).drop("__side")
