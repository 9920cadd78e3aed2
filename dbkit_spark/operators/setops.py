"""Set operations & dedup (SURVEY.md §2.7).

``dedup_keep_first`` exists because ``dropDuplicates(subset)`` keeps an
*arbitrary* row per key — fine for idempotent pipelines, wrong whenever the
survivor matters. The deterministic version costs one shuffle on the key
(same as dropDuplicates) plus a within-partition sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..errors import AttributeMissing


def _check_union_schemas(a: DataFrame, b: DataFrame) -> None:
    missing = set(a.columns) ^ set(b.columns)
    if missing:
        raise AttributeMissing(", ".join(sorted(missing)), sorted(set(a.columns) | set(b.columns)))


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    _check_union_schemas(a, b)
    return a.unionByName(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return union_all(a, b).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersectAll(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.subtract(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def distinct(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    if subset:
        for c in subset:
            if c not in df.columns:
                raise AttributeMissing(c, df.columns)
        return df.dropDuplicates(list(subset))
    return df.distinct()


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """Deterministic subset-dedup: keep the first row per key under the
    given total order (add a unique tiebreaker for full determinism)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def set_split_tags(
    df: DataFrame,
    key_cols: Sequence[str],
    pred_a: Column,
    pred_b: Column,
    tags: tuple[str, str, str] = ("both", "only_a", "only_b"),
) -> DataFrame:
    """Fused 3-way set split: the single-shuffle rewrite of
    ``intersect(A,B) ∪ except(A,B) ∪ except(B,A)`` when A and B are
    predicate-selections of the SAME input.

    The operator composition costs 2 distincts + 3 set-op shuffles over 5
    scans; this computes membership flags in ONE groupBy over ONE scan and
    tags each key. At 100 TB that is the difference between one shuffle of
    the keys and five. Output rows/columns identical to the composition:
    (tag, *key_cols), one row per key satisfying either predicate.
    """
    flags = (
        df.filter(pred_a | pred_b)
        .groupBy(*key_cols)
        .agg(
            F.max(pred_a.cast("int")).alias("__in_a"),
            F.max(pred_b.cast("int")).alias("__in_b"),
        )
    )
    tag = (
        F.when((F.col("__in_a") == 1) & (F.col("__in_b") == 1), tags[0])
        .when(F.col("__in_a") == 1, tags[1])
        .otherwise(tags[2])
    )
    return flags.select(tag.alias("tag"), *key_cols)
