"""Skew handling — explicit key salting for shuffle joins and heavy
aggregations on Zipf-skewed keys (the synthetic pages table draws
``domain(url)`` Zipfian precisely so this is exercised; see
collector_spark/datagen.py).

When to use what, per the scale playbook:

- small dim join           → ``F.broadcast`` (operators/enrich.py): no
                             shuffle at all, skew irrelevant.
- big-big join, skewed key → ``salted_join`` below: the skewed side gets
                             a deterministic salt in [0, buckets); the
                             other side is replicated once per salt.
                             One hot key's rows now spread over
                             ``buckets`` reducers.
- skewed groupBy           → usually FINE as-is (Spark's partial
                             aggregation combines map-side, so the hot
                             key ships one partial row per task). Use
                             ``salted_agg_count`` only when per-key
                             state is large (e.g. collect_set).
- everything else          → AQE skew-join splitting is already on
                             (session.py: spark.sql.adaptive.skewJoin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(buckets: int, *cols: Column) -> Column:
    """Deterministic salt in [0, buckets): hash of the given columns
    (use row-unique columns; falls back to a per-row random draw when
    none are given — still reproducible per partition layout)."""
    if cols:
        return F.pmod(F.hash(*cols), F.lit(buckets))
    return (F.rand(seed=42) * buckets).cast("int")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    buckets: int = 16,
    how: str = "inner",
    salt_by: list[str] | None = None,
) -> DataFrame:
    """Shuffle join where ``skewed``'s join-key distribution is heavy:
    salt the skewed side, replicate ``other`` across all salts, join on
    (key..., salt), drop the salt. Output rows identical to the plain
    join; the hot key's shuffle partition shrinks by ~``buckets``x.

    Only join types that never emit unmatched ``other`` rows are allowed:
    for right/full joins each unmatched ``other`` row would surface once
    per salt replica (``buckets`` duplicates), silently corrupting the
    result — rejected with ValueError instead.

    ``salt_by``: row-distinguishing columns of the skewed side used to
    derive the deterministic salt (default: all non-key columns).
    """
    # no "cross": a cross join takes no join keys, so the salted-key
    # rewrite is meaningless there (and Spark rejects how='cross' with an
    # on-clause anyway) — fail here with the helpful error instead
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched rows of the "
            f"replicated side; allowed: {sorted(allowed)}"
        )
    salt_src = [F.col(c) for c in (salt_by or [c for c in skewed.columns if c not in on])]
    l = skewed.withColumn("_salt", salt_col(buckets, *salt_src))
    r = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return l.join(r, on=on + ["_salt"], how=how).drop("_salt")


def salted_agg_count(
    df: DataFrame,
    key_cols: list[str],
    buckets: int = 16,
    salt_by: list[str] | None = None,
) -> DataFrame:
    """Two-phase count per key: partial count on (key, salt), final sum
    on key. Only worth it when a single reducer's per-key state would be
    big; plain groupBy().count() already map-side combines."""
    salt_src = [F.col(c) for c in (salt_by or [c for c in df.columns if c not in key_cols])]
    partial = (
        df.withColumn("_salt", salt_col(buckets, *salt_src))
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias("cnt"))
