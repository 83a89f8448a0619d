"""Rule-driven router — the reference's multi-output fan-out, made
predicate-aware.

Reference semantics (internal/app/manager/manager.go:179-216): every
configured output receives the SAME processed batch, sequentially; an
output error skips that output but the batch still commits. Our router
generalizes this: each sink has an optional CEL-subset predicate
(predicate absent = receives everything, exactly the reference behavior);
a row may match multiple sinks.

Physical strategy (scale):
- the upstream plan is computed ONCE and persisted, then each sink writes
  a filtered view — N sinks cost one materialization + N cheap filtered
  passes, not N recomputations (the reference re-reads its temp file per
  output, manager.go:190-199, which is the same idea on local disk);
- per-sink aggregate counts come from the same pass via ``groupBy`` over
  a routes array (``explode`` of matched sink names), one shuffle of
  (sink, count) partials only — map-side combined, tiny at any scale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from collector_spark.operators.cel import CelFilter, ColumnCompiler, SqlCompiler, parse_rule


@dataclass
class Route:
    """One sink: name + optional CEL-subset predicate."""

    name: str
    predicate: str | None = None  # None = match all rows (reference fan-out)

    def column(self, mode: str = "json", value_col: str = "value") -> Column:
        if self.predicate is None:
            return F.lit(True)
        ast = parse_rule(self.predicate)
        compiler = ColumnCompiler(mode=mode, value_col=value_col)
        return F.coalesce(compiler.compile(ast).cast("boolean"), F.lit(False))

    def sql(self, mode: str = "json", value_col: str = "value") -> str:
        if self.predicate is None:
            return "TRUE"
        ast = parse_rule(self.predicate)
        return f"COALESCE({SqlCompiler(mode=mode, value_col=value_col).compile(ast)}, FALSE)"


class Router:
    """Fan a DataFrame out to named routes.

    with_routes()   → adds an array<string> ``routes`` column (matched sinks)
    split()         → {sink_name: filtered DataFrame view} over a persisted parent
    sink_counts()   → DataFrame (sink, cnt) per-sink aggregate counts
    """

    def __init__(self, routes: list[Route], mode: str = "json", value_col: str = "value"):
        if not routes:
            raise ValueError("at least one route required")
        names = [r.name for r in routes]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate route names: {names}")
        # names flow into selectExpr identifiers, F.sum aliases, and the
        # oracle SQL's string literals — reject anything that would be
        # SQL syntax (e.g. 'my-route' parses as subtraction; a quote
        # breaks the literal) at config time, like the reference's
        # config validation
        bad = [n for n in names if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", n)]
        if bad:
            raise ValueError(
                f"route names must match [A-Za-z_][A-Za-z0-9_]*: {bad}"
            )
        self.routes = routes
        self.mode = mode
        self.value_col = value_col

    def _route_cols(self) -> list[tuple[str, Column]]:
        return [(r.name, r.column(self.mode, self.value_col)) for r in self.routes]

    def with_routes(self, df: DataFrame, out_col: str = "routes") -> DataFrame:
        pairs = self._route_cols()
        arr = F.array_compact(
            F.array(*[F.when(c, F.lit(n)) for n, c in pairs])
        )
        return df.withColumn(out_col, arr)

    def split(self, df: DataFrame, persist: bool = True) -> dict[str, DataFrame]:
        """One persisted parent, N filtered children (write each to its sink)."""
        if persist:
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
        return {name: df.filter(col) for name, col in self._route_cols()}

    def sink_counts(self, df: DataFrame) -> DataFrame:
        """Per-sink aggregate counts (the reference's per-output written
        count, e.g. internal/output/file/file.go:83-91) in ONE pass:
        sum of boolean matches per route — no explode, no extra shuffle
        beyond the final tiny aggregation."""
        aggs = [
            # COALESCE: empty input sums to NULL in Spark but the SQL
            # twin emits 0 — keep the two sides hash-identical
            F.coalesce(F.sum(col.cast("long")), F.lit(0)).alias(name)
            for name, col in self._route_cols()
        ]
        wide = df.agg(*aggs)
        # unpivot to (sink, cnt); names are backtick-quoted identifiers
        # (validated at __init__, but e.g. a reserved word still needs
        # quoting inside selectExpr)
        pairs = ", ".join(f"'{r.name}', `{r.name}`" for r in self.routes)
        return wide.selectExpr(
            f"stack({len(self.routes)}, {pairs}) as (sink, cnt)"
        )

    def sink_counts_sql(self, from_clause: str) -> str:
        """DuckDB equivalent of sink_counts() for the oracle gate."""
        selects = []
        for r in self.routes:
            pred = r.sql(self.mode, self.value_col)
            selects.append(
                f"SELECT '{r.name}' AS sink, COALESCE(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END), 0) AS cnt FROM {from_clause}"
            )
        return " UNION ALL ".join(selects)
