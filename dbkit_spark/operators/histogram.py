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

def quantile_bin(
    df: DataFrame,
    col: str,
    k: int,
    exact: bool = False,
    rel_err: float = 0.001,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Equi-depth (quantile) binning: append ``bin`` in 1..k.

    The DEFAULT is the 100 TB path: boundaries from ``approxQuantile``
    (Greenwald–Khanna summary — one distributed pass with map-side
    partial summaries, error ``rel_err``) broadcast as literals, then a
    pure map-side comparison chain assigns bins — no global sort, no
    single-partition window anywhere in the plan. This is the same
    trade Spark's own QuantileDiscretizer makes: bin populations are
    equal to within ``rel_err``·n rather than exactly, which is what
    feature discretization actually needs.

    ``exact=True`` is the opt-in fixture/oracle mode: a global
    ``ntile(k)`` ordered by (col, tiebreak_col) — bit-exact equi-depth
    populations, total-order deterministic, but the window serializes
    the data through ONE reducer. Only for small inputs and
    cross-engine exactness baselines (q184).

    Ties-at-boundary semantics (sampled path): a value v lands in the
    lowest bin whose upper boundary is >= v, so duplicated mass at a
    boundary goes entirely to one bin (equi-depth is undefined under
    heavy ties anyway; exact ntile splits such ties arbitrarily by the
    tiebreak column instead).

    NULLs are excluded, matching equi_width_histogram.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    c = F.col(col)
    clean = df.filter(c.isNotNull())
    if exact:
        from pyspark.sql import Window

        order = [c] + ([F.col(tiebreak_col)] if tiebreak_col else [])
        return clean.withColumn("bin", F.ntile(k).over(Window.orderBy(*order)))
    if k == 1:  # degenerate: everything is bin 1; approxQuantile([]) NPEs
        return clean.withColumn("bin", F.lit(1).cast("int"))
    probs = [i / k for i in range(1, k)]
    boundaries = clean.stat.approxQuantile(col, probs, rel_err)
    bin_ = F.lit(1).cast("int")
    for b in boundaries:
        bin_ = bin_ + F.when(c > F.lit(float(b)), 1).otherwise(0)
    return clean.withColumn("bin", bin_)

def quantile_bin_grouped(
    df: DataFrame,
    col: str,
    k: int,
    keys: Sequence[str],
    accuracy: int = 10_000,
) -> DataFrame:
    """PER-GROUP equi-depth binning: append ``bin`` in 1..k computed
    against each group's OWN quantile boundaries — the form feature
    discretization actually takes (per event type, per language, per
    tenant), where one global set of boundaries would wash out
    per-group distributions.

    Scale shape: boundaries come from ``percentile_approx`` (the GK
    sketch as a real aggregate — map-side partial summaries, one
    exchange on the group keys, never a driver collect), the boundary
    table is group-count-sized and broadcasts back, and bin assignment
    is a map-side higher-order count of boundaries below the value.
    No window anywhere; adding a group multiplies nothing.

    Ties-at-boundary go to the lower bin, matching ``quantile_bin``'s
    sampled path. NULL values are excluded. Groups smaller than ``k``
    still emit valid (degenerate, tie-heavy) bins — equi-depth is
    undefined under that few rows, same caveat as everywhere.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if not keys:
        raise ValueError("keys must be non-empty (use quantile_bin)")
    c = F.col(col)
    clean = df.filter(c.isNotNull())
    if k == 1:
        return clean.withColumn("bin", F.lit(1).cast("int"))
    probs = F.array(*[F.lit(i / k) for i in range(1, k)])
    bnd = clean.groupBy(*keys).agg(
        F.percentile_approx(col, probs, F.lit(accuracy)).alias("_bnds")
    )
    joined = clean.join(F.broadcast(bnd), list(keys))
    bin_ = (
        F.lit(1)
        + F.size(F.filter("_bnds", lambda b: c > b))
    ).cast("int")
    return joined.withColumn("bin", bin_).drop("_bnds")
