"""Filter / predicate algebra (SURVEY.md §2.2).

The reference has a single stubbed comparison (``EqaulsExpr`` [sic],
``comparison.rs:8-45``); the full predicate algebra is Tier C. Spark's
Column operators already provide 3-valued NULL logic; these helpers add
eager column checking and keep predicates in built-in (codegen'd,
parquet-pushable) form — never Python UDFs.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import AttributeMissing


def _col(df: DataFrame, name: str) -> Column:
    if name not in df.columns:
        raise AttributeMissing(name, df.columns)
    return F.col(name)


def where(df: DataFrame, predicate: Column) -> DataFrame:
    return df.filter(predicate)


def eq(df: DataFrame, name: str, value: Any) -> Column:
    """The reference's stubbed equality (``comparison.rs:8-31``), bound
    eagerly against the input schema like ``Expr::bind``."""
    return _col(df, name) == F.lit(value)


def between(df: DataFrame, name: str, lo: Any, hi: Any) -> Column:
    return _col(df, name).between(lo, hi)


def isin(df: DataFrame, name: str, values: Sequence[Any]) -> Column:
    return _col(df, name).isin(list(values))


def is_null(df: DataFrame, name: str) -> Column:
    return _col(df, name).isNull()


def like(df: DataFrame, name: str, pattern: str) -> Column:
    return _col(df, name).like(pattern)


def rlike(df: DataFrame, name: str, pattern: str) -> Column:
    return _col(df, name).rlike(pattern)
