"""Equi-width histogram aggregation (the OLAP `histogram`/`width_bucket`
primitive).

One map-side bucket expression + one hash agg — the cheapest possible
distribution profile at 100 TB (profile.py gives per-column summary
stats; this gives the shape). Under/overflow rows land in explicit
sentinel bins (-1 / nbins) instead of being clamped or dropped — silent
clamping is how bad data hides from a distribution plot.

NULLs are excluded (they have no position on the axis; count them with
quality_audit.not_null or profile_table).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_width_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Per-(keys, bin) counts over ``nbins`` equal-width bins spanning
    [lo, hi). Output: keys..., ``bin`` (-1 underflow, ``nbins``
    overflow), ``bin_lo``, ``bin_hi``, ``n``. Empty bins are absent (at
    100 TB a dense bin spine is the caller's gapfill problem — see
    operators/timeseries.gapfill_locf for the same decision)."""
    if nbins <= 0:
        raise ValueError("nbins must be positive")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / nbins
    c = F.col(col)
    bin_ = (
        F.when(c < lo, F.lit(-1))
        .when(c >= hi, F.lit(nbins))
        .otherwise(F.floor((c - lo) / F.lit(width)))
        .cast("long")
    )
    return (
        df.filter(c.isNotNull())
        .withColumn("bin", bin_)
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bin_lo", F.lit(lo) + F.col("bin") * F.lit(width))
        .withColumn("bin_hi", F.lit(lo) + (F.col("bin") + 1) * F.lit(width))
        .select(*keys, "bin", "bin_lo", "bin_hi", "n")
    )
