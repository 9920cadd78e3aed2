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


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str,
) -> DataFrame:
    """Gap-based batch sessionization: input columns + ``session_num``
    (1-based per user). A session starts at a user's first event and at
    every event more than ``gap_seconds`` after the previous one.

    Two stacked windows on the SAME (user, ts, tiebreak) partitioning —
    lag to flag session starts, running sum to number them — so Catalyst
    plans ONE shuffle + one sort, not two (adjacent Window nodes with
    identical specs share the exchange). ``tiebreak_col`` must make the
    per-user order total, or lag survivors are partition-order dependent.
    This is the batch twin of the streaming session window
    (``streaming/windows.session_agg``): same gap semantics, verifiable
    against plain SQL.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    prev_ts = F.lag(ts_col).over(w)
    is_start = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_num",
        F.sum(is_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
