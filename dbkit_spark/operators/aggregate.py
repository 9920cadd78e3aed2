"""Aggregation surface (SURVEY.md §2.4) + oracle-exact numeric discipline.

Spark and any oracle engine (DuckDB) sum doubles in different orders;
IEEE-754 addition is non-associative, so a naive ``sum(double)`` is not
reproducible across engines (SURVEY.md §7.4 "hard parts"). The fix used
throughout this engine: aggregate in *decimal* (exact, associative), then
cast the final value back to double. Both engines round the same binary
double to the same decimal, sum exactly, and convert the exact decimal to
the same binary double — bit-equal results, order-independent.

At 100 TB this is also the *fast* path: Spark's decimal aggregation stays
inside Tungsten codegen with partial (map-side) aggregation; no UDFs.

Helpers come in pairs: a DataFrame-side Column builder and the equivalent
ANSI-SQL fragment (for ``oracle_sql()``), so queries can never drift from
their oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Wide enough for 100 TB-scale sums of prices: 10^(38-scale) headroom.
_PREC = 25


def dec(col: Column | str, scale: int = 2) -> Column:
    """Round a double column to an exact decimal (deterministic: the
    nearest decimal to a given binary double is unique)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({_PREC},{scale})")


def dec_sql(expr: str, scale: int = 2) -> str:
    return f"CAST({expr} AS DECIMAL({_PREC},{scale}))"


def stable_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent cross-engine-exact sum of a double column."""
    return F.sum(dec(col, scale)).cast("double")


def stable_sum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM({dec_sql(expr, scale)}) AS DOUBLE)"


def stable_avg(col: Column | str, scale: int = 2) -> Column:
    """Exact-sum / exact-count in double — one deterministic FP division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def stable_avg_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM({dec_sql(expr, scale)}) AS DOUBLE) / COUNT({expr})"


def rounded(col: Column, digits: int = 6) -> Column:
    """For inherently order-sensitive stats (stddev/corr/...): round to
    ``digits`` so ~1e-15 relative error cannot flip the hash."""
    return F.round(col, digits)


def group_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    """groupBy + agg with mandatory output aliases (the engine's rule:
    every computed column is named, SURVEY.md 'column names must match').

    Scale: Spark plans partial (map-side) + final aggregation
    automatically; keys with heavy skew are handled by AQE.
    """
    exprs = [expr.alias(name) for name, expr in aggs.items()]
    if keys:
        return df.groupBy(*keys).agg(*exprs)
    return df.agg(*exprs)


# --- incremental aggregate maintenance ---------------------------------------
MERGEABLE = {"count", "sum", "min", "max"}


def aggregate_table(
    df: DataFrame, keys: list[str], specs: dict[str, tuple[str, str | None]]
) -> DataFrame:
    """Build a MERGEABLE aggregate table: ``specs`` maps output column →
    (agg, input column), agg ∈ {count, sum, min, max} — the
    self-decomposable aggregates (avg/stddev derive from sum+count at
    read time; non-decomposable aggs like exact percentiles need the
    sketch family instead). ``count`` with input None counts rows."""
    aggs = []
    for out, (agg, col) in specs.items():
        if agg not in MERGEABLE:
            raise ValueError(
                f"{out}: agg {agg!r} is not mergeable; store decomposable "
                "parts (sum+count) or use a sketch"
            )
        fn = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}[agg]
        src = F.lit(1) if agg == "count" and col is None else F.col(col)
        aggs.append(fn(src).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregates(
    base: DataFrame,
    delta_raw: DataFrame,
    keys: list[str],
    specs: dict[str, tuple[str, str | None]],
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: fold a raw
    ``delta_raw`` batch into an existing ``base`` aggregate table and
    return the refreshed table — cost ∝ |delta| + |aggregate table|,
    NEVER a rescan of history (the point of keeping the base at 100 TB:
    the day's 100 GB delta refreshes a view over years of data).

    Exactness: counts/sums merge by SUM (use decimal inputs for the
    engine-wide order-free guarantee), min/max by MIN/MAX — each agg is
    a commutative monoid, so merge(agg(A), agg(B)) == agg(A ∪ B)
    identically, which the q299 differential pins against a full
    recompute. Plan: one aggregation of the delta, one unionByName with
    the base, one merge aggregation on the keys.

    Deletions/updates are out of contract (append-only deltas) — pair
    with `operators/reconcile` for correction flows.
    """
    delta_agg = aggregate_table(delta_raw, keys, specs)
    merged_aggs = []
    for out, (agg, _col) in specs.items():
        fn = F.sum if agg in ("count", "sum") else (
            F.min if agg == "min" else F.max
        )
        merged = fn(F.col(out)).alias(out)
        merged_aggs.append(merged)
    both = base.unionByName(delta_agg)
    out_df = both.groupBy(*keys).agg(*merged_aggs)
    # counts stay BIGINT through the SUM merge
    for out, (agg, _col) in specs.items():
        if agg == "count":
            out_df = out_df.withColumn(out, F.col(out).cast("long"))
    return out_df
