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
        engine: str = "pandas",
    ):
        self.add = add or []
        self.remove = remove or []
        self.replace = replace or []
        if mode not in ("json", "columns"):
            raise ValueError(mode)
        if engine not in ("pandas", "native"):
            raise ValueError(engine)
        if engine == "native" and (
            self.remove
            or self.replace
            or any("." in a["key"] for a in (add or []))
        ):
            # the native fast path is top-level-add only (string surgery
            # on compact JSON); everything else goes through the oracle UDF
            raise ValueError(
                "engine='native' supports only top-level add actions; "
                "use engine='pandas' for remove/replace/nested keys"
            )
        self.mode = mode
        self.value_col = value_col
        self.engine = engine
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
        if self.engine == "native":
            return self._apply_native(df)
        df, keep = self.tag(df)
        return df.filter(keep)

    def tag(self, df: DataFrame) -> tuple[DataFrame, "F.Column"]:
        """Non-dropping variant for the quarantine path (always the
        oracle-UDF engine — the native fast path interleaves its own
        validity filter with string surgery)."""
        if self.mode == "columns":
            return self._apply_columns(df), F.lit(True)
        udf = make_mutate_udf(self.add, self.remove, self.replace)
        out = df.withColumn(self.value_col, udf(F.col(self.value_col)))
        # non-JSON → None → quarantined (json.go:88-99)
        return out, F.col(self.value_col).isNotNull()

    def _apply_native(self, df: DataFrame) -> DataFrame:
        """Top-level add on compact JSON object lines as pure Catalyst
        string surgery (sjson appends before the closing brace exactly
        like this). Requirements, enforced at plan build + runtime:
        only objects survive (non-JSON / non-object lines are dropped,
        matching the reference), and keys being added must not already
        exist (checked per row; pre-existing keys fall back to a
        replace-style set via the same append after a delete is NOT
        supported natively — such rows keep their old value dropped by
        the guard below going through the slow path is the correct
        choice; for the pipelines in this repo added keys are new)."""
        col = F.trim(F.col(self.value_col))
        out = df.withColumn(self.value_col, col).filter(
            (F.length(col) > 0)
            & F.try_parse_json(col).isNotNull()
            & col.startswith("{")
        )
        import json as _json
        import re as _re

        for a in self.add:
            frag = _json.dumps({a["key"]: a["value"]}, separators=(",", ":"))[1:-1]
            # regex-ESCAPED form of the json-escaped key: a key like
            # 'a+b' or 'f(x' must match literally, not as regex syntax
            key_re = _re.escape(_json.dumps(a["key"])[1:-1])
            val_json = _json.dumps(a["value"], separators=(",", ":"))
            v = F.col(self.value_col)
            appended = F.when(
                F.regexp_like(v, F.lit(r"^\{\s*\}$")),
                F.concat(F.lit("{"), F.lit(frag), F.lit("}")),
            ).otherwise(
                F.concat(
                    F.expr(
                        f"substring({self.value_col}, 1, length({self.value_col}) - 1)"
                    ),
                    F.lit(","),
                    F.lit(frag),
                    F.lit("}"),
                )
            )
            # sjson.Set semantics: existing key is OVERWRITTEN (true
            # key-presence test via json_object_keys — get_json_object
            # can't tell {"k":null} from a missing key, and the null
            # case must overwrite, not append a duplicate key).
            exists = F.array_contains(F.json_object_keys(v), a["key"])
            pattern = f'("{key_re}"\\s*:\\s*)("(?:[^"\\\\]|\\\\.)*"|[^,}}\\]]+)'
            replacement = "$1" + val_json.replace("\\", "\\\\").replace("$", "\\$")
            replaced = F.regexp_replace(v, pattern, replacement)
            # the regex rewrite is GLOBAL and textual — it is only safe
            # when the key's value is a scalar and the key string occurs
            # exactly once in the line. A nested-object value or a
            # same-named key inside a nested object would be silently
            # corrupted; such rows are left UNCHANGED here (documented
            # native-engine limitation — engine='pandas' implements full
            # sjson.Set semantics).
            nested_val = F.coalesce(
                F.get_json_object(v, f"$.{a['key']}").rlike(r"^[\[{]"),
                F.lit(False),
            )
            ambiguous = F.size(F.split(v, f'"{key_re}"\\s*:')) > 2
            safe = exists & ~nested_val & ~ambiguous
            out = out.withColumn(
                self.value_col,
                F.when(safe, replaced).when(exists, v).otherwise(appended),
            )
        return out

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
