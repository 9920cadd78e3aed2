"""Grouped-map pandas operators (§2.10: the applyInPandas surface).

``applyInPandas`` shuffles on the group key and hands each *complete*
group to a Python worker as one pandas frame — the right tool when the
per-group logic genuinely needs the whole group materialized (model
scoring, per-group fits). Two scale caveats, both inherent to the API:
each group must fit in a worker's memory, and low-cardinality keys cap
parallelism at the group count. For algebraic per-group statistics the
window-function rewrite (see the q94 oracle) stays JVM-side and
streams; ``grouped_zscore`` exists to exercise and test the grouped-map
path itself with semantics simple enough to verify exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def grouped_zscore(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    out_col: str = "z",
) -> DataFrame:
    """All input columns + ``out_col``: the population z-score of
    ``value_col`` within its group (0.0 for zero-variance groups)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def fn(pdf):
        v = pdf[value_col]
        sd = float(v.std(ddof=0)) if len(v) else 0.0
        m = float(v.mean()) if len(v) else 0.0
        pdf = pdf.copy()
        pdf[out_col] = 0.0 if sd == 0.0 else (v - m) / sd
        return pdf

    return df.groupBy(*keys).applyInPandas(fn, out_schema)
