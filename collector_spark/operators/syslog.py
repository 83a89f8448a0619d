"""`syslog` processor — PRI strip / RFC3164 / RFC5424 MSG extraction.

Reference: internal/processor/syslog/syslog.go:52-141.

Spark-first design: all three modes compile to native regexp expressions
(JVM-side, whole-stage codegen) — no Python per row at all. The regex
patterns are the same ones the shared oracle uses, so pytest pins
byte-level parity on the reference's fixture vectors
(syslog_test.go:8-51). Rows that fail to parse are dropped
(reference logs + skips, syslog.go:70-93).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Keep in sync with collector_spark.oracle semantics.
_PRI = r"^<([0-9]{1,3})>"
# RFC3164: <PRI>Mmm dd hh:mm:ss host MSG   (day may be space-padded)
_RFC3164_MSG = r"^<[0-9]{1,3}>[A-Z][a-z]{2} [ 0-9][0-9] [0-9]{2}:[0-9]{2}:[0-9]{2} \S+ (.*)$"
# RFC5424: <PRI>VER TS HOST APP PROCID MSGID SD MSG ; SD is '-' XOR
# adjacent [..] groups (exclusive — mixing let a '-' swallow a
# '[...]'-leading MSG head as fake SD; oracle._RFC5424_RE matches)
_RFC5424_MSG = (
    r"^<[0-9]{1,3}>[1-9][0-9]{0,2} \S+ \S+ \S+ \S+ \S+ (?:-|(?:\[[^\]]*\])+) (.*)$"
)


def syslog_raw_col(col: Column) -> Column:
    return F.regexp_replace(col, _PRI, "")


def syslog_rfc3164_col(col: Column) -> Column:
    """NULL when the line does not match (→ dropped)."""
    extracted = F.regexp_extract(col, _RFC3164_MSG, 1)
    return F.when(col.rlike(_RFC3164_MSG), extracted)


def syslog_rfc5424_col(col: Column) -> Column:
    extracted = F.regexp_extract(col, _RFC5424_MSG, 1)
    return F.when(col.rlike(_RFC5424_MSG), extracted)


_MODES = {
    "raw": syslog_raw_col,
    "rfc3164": syslog_rfc3164_col,
    "rfc5424": syslog_rfc5424_col,
}


class SyslogParser:
    """syslog processor (config: {type: raw|rfc5424|rfc3164}, default raw)."""

    def __init__(self, type: str = "raw", value_col: str = "value"):
        if type not in _MODES:
            raise ValueError(f"syslog type must be one of {sorted(_MODES)}, got {type!r}")
        self.type = type
        self.value_col = value_col

    def apply(self, df: DataFrame) -> DataFrame:
        col = F.trim(F.col(self.value_col))
        df = df.filter(F.length(col) > 0)
        out = df.withColumn(self.value_col, _MODES[self.type](col))
        if self.type != "raw":
            out = out.filter(F.col(self.value_col).isNotNull())
        return out

    def tag(self, df: DataFrame) -> tuple[DataFrame, Column]:
        """Non-dropping variant for the quarantine path."""
        trimmed = F.trim(F.col(self.value_col))
        nonempty = F.length(trimmed) > 0
        out = df.withColumn(self.value_col, _MODES[self.type](trimmed))
        keep = nonempty
        if self.type != "raw":
            keep = keep & F.col(self.value_col).isNotNull()
        return out, keep

    def sql_expr(self, col: str = "value") -> str:
        """Equivalent DuckDB expression for the oracle gate."""
        if self.type == "raw":
            return f"regexp_replace(trim({col}), '{_PRI}', '')"
        pattern = _RFC3164_MSG if self.type == "rfc3164" else _RFC5424_MSG
        escaped = pattern.replace("'", "''").replace("\\", "\\\\")
        return f"regexp_extract(trim({col}), '{escaped}', 1)"
