"""Sorts / limits / top-k (SURVEY.md §2.6).

Scale notes: ``orderBy().limit(k)`` is planned by Catalyst as
``TakeOrderedAndProject`` — each partition keeps only its local top-k and
the driver merges k·p rows; there is never a full sort. A *total* sort
(``orderBy`` without limit) range-partitions by sampled boundaries — fine,
but only ask for it when output order is the product.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame


def sort(df: DataFrame, *order_by: Column | str) -> DataFrame:
    return df.orderBy(*order_by)


def sort_within_partitions(df: DataFrame, *order_by: Column | str) -> DataFrame:
    """Per-partition sort — no shuffle; pairs with repartition(key) to get
    clustered+sorted output (e.g. for sorted parquet writes)."""
    return df.sortWithinPartitions(*order_by)


def limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(n)


def offset(df: DataFrame, n: int) -> DataFrame:
    return df.offset(n)


def topk(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (no full sort). ``order_by``
    should be a total order for deterministic results."""
    return df.orderBy(*order_by).limit(k)
