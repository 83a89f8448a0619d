"""Funnel conversion — ordered step matching over an event stream:
how many users did step 1, then step 2 AFTER it, then step 3 after
that. The reference's per-line model cannot express cross-row order;
this is the standard product/security-analytics funnel (signup →
activate → purchase; recon → exploit → exfil).

Semantics: a user reaches step i at the EARLIEST event of type i that
is strictly later than their step-(i-1) time (first-touch funnel, no
lookback window unless ``within_seconds`` bounds the whole journey
from step 1).

Scale shape: one groupBy per step, each a map-side-combined min over
(user, ts) rows pre-filtered to that step's type — the event table is
scanned once per step but only (user, ts) columns survive the scan
(column pruning), and each join key is the user id. No windows over
the raw stream, no per-user event sorting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_counts", "retention_cohorts"]


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """(cohort, periods_since, n_users) — classic retention triangle:
    users grouped by their FIRST-activity period, counted distinct in
    every later period they appear. Two aggregations: per-user first
    period (map-side-combined min), then a distinct count per
    (cohort, offset) over the user-period pairs — no windows over the
    raw stream."""
    p = F.date_trunc(period, F.col(ts_col)).cast("date")
    activity = df.select(
        F.col(user_col).alias("_u"), p.alias("_p")
    ).distinct()
    first = activity.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    return (
        activity.join(first, "_u")
        .groupBy(
            F.col("_cohort").alias("cohort"),
            F.datediff(F.col("_p"), F.col("_cohort")).alias("days_since"),
        )
        .agg(F.count_distinct("_u").alias("n_users"))
    )


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """(step_idx, step, n_users) — users reaching each funnel step in
    order. ``within_seconds`` caps the whole journey's duration
    relative to the user's step-1 time."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.min(ts_col).alias("_t"))
        .withColumn("_t0", F.col("_t"))
    )

    def step_count(i: int, s: str, frame: DataFrame) -> DataFrame:
        # a global count-agg yields one row even for an empty step —
        # a step nobody reached reports 0, matching the SQL COUNT(*)
        return frame.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step_idx"), F.lit(s).alias("step"), "n_users"
        )

    counts = [step_count(0, steps[0], cur)]
    for i, s in enumerate(steps[1:], start=1):
        ev = df.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
        )
        joined = ev.join(cur, "_u").filter(F.col("_ts") > F.col("_t"))
        if within_seconds is not None:
            joined = joined.filter(
                F.col("_ts").cast("double")
                <= F.col("_t0").cast("double") + float(within_seconds)
            )
        cur = joined.groupBy("_u", "_t0").agg(F.min("_ts").alias("_t"))
        counts.append(step_count(i, s, cur))
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out
