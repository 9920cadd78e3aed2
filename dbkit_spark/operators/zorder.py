"""Z-order (Morton) clustering for multi-dimensional data skipping.

Parquet row-group/file pruning works off min/max stats per column. A sort
on column A makes A-ranges skippable but scatters B; interleaving the bits
of both columns' rank buckets (the Morton curve) makes BOTH dimensions'
ranges locally narrow, so a 2-D range predicate skips most files. This is
the technique behind lakehouse `OPTIMIZE ZORDER BY` — here as a plain
DataFrame transform + writer.

Scale design: bucket boundaries come from ``approxQuantile`` (one sampled
pass, same mechanism as Spark's range partitioner) and are broadcast as
literals; bucket assignment and bit interleaving are then pure map-side
JVM expressions. No global window, no single-partition funnel — the only
shuffle is the final range-partition by z-value. At 100 TB: compute once
per table rewrite; the win compounds with every subsequent selective scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 8  # 256 rank buckets per dimension


def _bucket(c: str, boundaries: list[float], bits: int) -> Column:
    """Equi-depth bucket in [0, 2^bits): count of boundaries <= value.
    O(2^bits) comparisons per row, map-side, whole-stage-codegen'd."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    raw = F.size(F.filter(arr, lambda b: b <= F.col(c).cast("double")))
    return F.least(raw.cast("long"), F.lit((1 << bits) - 1))


def zorder_value(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = ZBITS,
    relative_error: float = 0.01,
) -> DataFrame:
    """Append ``__z``: the Morton interleave of each column's equi-depth
    rank bucket. Bit j of dimension d lands at position j*len(cols)+d.
    Rank buckets (not value buckets) so skewed distributions still spread
    over all 2^bits buckets."""
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    bucket_cols = []
    for c in cols:
        boundaries = df.approxQuantile(c, probs, relative_error)
        bucket_cols.append(_bucket(c, boundaries, bits).alias(f"__b_{c}"))
    with_buckets = df.select("*", *bucket_cols)
    z = F.lit(0).cast("long")
    for j in range(bits):
        for d, c in enumerate(cols):
            bit = F.shiftright(F.col(f"__b_{c}"), j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * len(cols) + d))
    return with_buckets.withColumn("__z", z).drop(*[f"__b_{c}" for c in cols])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 16,
    bits: int = ZBITS,
) -> None:
    """Cluster rows by z-value into ``num_files`` range-partitioned sorted
    files; each file covers a compact hyper-rectangle of the key space, so
    min/max stats prune on every z-ordered dimension."""
    zdf = zorder_value(df, cols, bits)
    (
        zdf.repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
