"""CSV/TSV line parser — delimited records as a pipeline processor.

The reference parses kv/cef/syslog/json lines but has no delimited-
record processor (§2.7 gap list); log exports and flat telemetry feeds
are routinely CSV/TSV. This is the fully-native Catalyst form:
``from_csv`` with a user schema (quoting, escapes, and type coercion
JVM-side — no Python per row), PERMISSIVE mode with a corrupt-record
column so malformed lines are DROPPED exactly like the reference's
kv drop-on-parse-failure (kv.go:50-60) instead of surfacing as
half-null rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["csv_extract", "CsvParser"]


def _check_flat_schema(schema: str) -> None:
    # CSV records are flat; a nested type ("a array<int>") would also
    # break the comma-split field listing — reject it loudly
    if "<" in schema or ">" in schema:
        raise ValueError(
            f"csv schema must use flat atomic types, got {schema!r}"
        )
    if "_corrupt" in [f.strip().split(" ")[0] for f in schema.split(",")]:
        raise ValueError("'_corrupt' is a reserved csv field name")


def _parsed(value: Column, schema: str, sep: str, quote: str, escape: str) -> Column:
    # PERMISSIVE + corrupt column is the standard Spark malformed-line
    # pattern: a line that does not fit the schema lands in _corrupt.
    # escape defaults to the quote char: RFC-4180 doubled-quote style
    # (csv.writer / Excel / Postgres COPY / DuckDB) — Spark's own
    # default escape is backslash, which mis-reads standard CSV.
    full_schema = schema + ", _corrupt string"
    return F.from_csv(
        value,
        F.lit(full_schema),
        {
            "sep": sep,
            "quote": quote,
            "escape": escape,
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": "_corrupt",
        },
    )


def csv_extract(
    df: DataFrame,
    schema: str,
    sep: str = ",",
    value_col: str = "value",
    drop_malformed: bool = True,
    quote: str = '"',
    escape: str = '"',
) -> DataFrame:
    """Append one typed column per schema field. ``drop_malformed``
    filters lines the schema rejects; ``False`` keeps them with NULLs."""
    _check_flat_schema(schema)
    parsed = _parsed(F.col(value_col), schema, sep, quote, escape)
    out = df.withColumn("_p", parsed)
    if drop_malformed:
        out = out.filter(F.col("_p._corrupt").isNull())
    fields = [f.strip().split(" ")[0] for f in schema.split(",")]
    return out.select(
        *df.columns, *[F.col(f"_p.{f}").alias(f) for f in fields]
    )


class CsvParser:
    """Pipeline processor: ``{"kind": "csv", "schema": ..., "sep": ...}``
    — delimited lines in, JSON objects out (the kv/syslog/grok line
    model), malformed lines dropped."""

    def __init__(
        self,
        schema: str,
        sep: str = ",",
        value_col: str = "value",
        quote: str = '"',
        escape: str = '"',
    ):
        _check_flat_schema(schema)
        self.schema = schema
        self.sep = sep
        self.quote = quote
        self.escape = escape
        self.value_col = value_col
        self.fields = [f.strip().split(" ")[0] for f in schema.split(",")]

    def apply(self, df: DataFrame) -> DataFrame:
        parsed = _parsed(
            F.col(self.value_col), self.schema, self.sep, self.quote, self.escape
        )
        keep = [c for c in df.columns if c != self.value_col]
        return (
            df.withColumn("_p", parsed)
            .filter(F.col("_p._corrupt").isNull())
            .select(
                *keep,
                F.to_json(
                    F.struct(*[F.col(f"_p.{f}").alias(f) for f in self.fields])
                ).alias(self.value_col),
            )
        )

    def rejects(self, df: DataFrame) -> DataFrame:
        """Dead-letter complement of apply(): malformed lines with a
        reason column (see GrokParser.rejects)."""
        parsed = _parsed(
            F.col(self.value_col), self.schema, self.sep, self.quote, self.escape
        )
        return (
            df.withColumn("_p", parsed)
            .filter(F.col("_p._corrupt").isNotNull())
            .drop("_p")
            .withColumn("reject_reason", F.lit("csv_malformed"))
        )
