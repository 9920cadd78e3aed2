"""Window functions (SURVEY.md §2.5) and per-group top-k (§2.6).

Scale notes: a window spec with ``partitionBy`` shuffles once on the
partition keys and sorts within partitions — same cost as a groupBy on the
same keys. A window WITHOUT partitionBy collapses everything into a single
partition and must be rejected for large data; ``require_partitioned``
guards that.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def require_partitioned(partition_by: Sequence[str | Column]) -> None:
    if not partition_by:
        raise ValueError(
            "window without partitionBy serializes the whole dataset through "
            "one task; partition keys are mandatory in this engine"
        )


def spec(
    partition_by: Sequence[str | Column],
    order_by: Sequence[str | Column] | None = None,
) -> WindowSpec:
    require_partitioned(partition_by)
    w = Window.partitionBy(*partition_by)
    if order_by:
        w = w.orderBy(*order_by)
    return w


def per_group_topk(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number — the §2.6 per-group top-k.

    Callers must make ``order_by`` a total order (add a unique tiebreaker)
    or the survivor set is nondeterministic.
    """
    w = spec(partition_by, order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def running(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    aggs: dict[str, Column],
) -> DataFrame:
    """Running aggregates over ROWS UNBOUNDED PRECEDING..CURRENT ROW."""
    w = spec(partition_by, order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df
    for name, col in aggs.items():
        out = out.withColumn(name, col.over(w))
    return out
