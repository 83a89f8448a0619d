"""HTML → text extraction over the binary ``html`` column.

This is the web-scale "parse" stage of the north star: a vectorized
pandas UDF applies the grok/regex extraction to ``html: binary`` and
produces ``extracted_text: string`` byte-identical (per url) to the
ground-truth ``text`` column / the pure-Python oracle
(collector_spark.oracle.extract_text).

Scale notes:
- the UDF receives Arrow record batches (no per-row Python at the Spark
  layer); inside the batch we use pandas ``.str`` vectorized ops for the
  regex passes and only fall back to a per-element join for paragraph
  reassembly;
- the plan must NEVER read ``html`` unless extraction is requested —
  callers select columns explicitly so parquet column pruning holds
  (verified in tests via the scan's ReadSchema).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from collector_spark import oracle


def _extract_text_series(html: pd.Series) -> pd.Series:
    # decode binary → str once per batch
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)
    # strip <script>/<style> and collect <p> bodies, vectorized
    s = s.str.replace(oracle._SCRIPT_STYLE_RE, "", regex=True)
    paras = s.str.findall(oracle._P_RE)
    return paras.map(
        lambda ps: "\n".join(oracle.html_unescape(p) for p in ps) if ps is not None else None
    )


def _extract_log_lines_series(html: pd.Series) -> pd.Series:
    return html.map(lambda b: oracle.extract_log_lines(b) if b is not None else None)


extract_text_udf = F.pandas_udf(_extract_text_series, T.StringType())
extract_log_lines_udf = F.pandas_udf(
    _extract_log_lines_series, T.ArrayType(T.StringType())
)


class HtmlExtractor:
    """Parse stage: pages(url, warc_ts, html, …) → + extracted_text.

    ``with_log_lines=True`` additionally explodes the embedded
    <pre data-log="1"> log lines into a ``value`` column — the bridge from
    the web-scale payload to the reference's line-oriented processors.
    """

    def __init__(self, html_col: str = "html", out_col: str = "extracted_text"):
        self.html_col = html_col
        self.out_col = out_col

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.out_col, extract_text_udf(F.col(self.html_col)))

    def log_lines(self, df: DataFrame, keep_cols: tuple[str, ...] = ("url",)) -> DataFrame:
        """pages → one row per embedded log line (column ``value``)."""
        cols = [F.col(c) for c in keep_cols]
        return (
            df.select(*cols, extract_log_lines_udf(F.col(self.html_col)).alias("_lines"))
            .select(*cols, F.explode("_lines").alias("value"))
        )
