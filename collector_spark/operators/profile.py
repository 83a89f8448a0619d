"""Column profiling — the data-quality report a pipeline runs before
trusting a new table: per-column row count, null count, and exact
distinct count, in ONE aggregation pass.

Scale shape: a single df.agg computes every stat (count/sum are
map-side combined; the exact count_distinct expands per column but
stays one job), and the wide 1-row result is unpivoted driver-free via
an array-of-structs explode — no per-column re-scan of a 100 TB table
(n_cols scans is the naive formulation's cost).

Stats are type-free (counts only), so the DuckDB oracle is exact for
any column type; numeric ranges belong to doc_length_quantiles /
approx_distinct_profile which already cover them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_null, n_distinct) — one row per profiled
    column, exact counts, single scan."""
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = []
    for c in cols:
        aggs.append(F.count(F.lit(1)).alias(f"__n_{c}"))
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    packed = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{c}").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(packed).alias("p")).select(
        "p.column", "p.n_rows", "p.n_null", "p.n_distinct"
    )
