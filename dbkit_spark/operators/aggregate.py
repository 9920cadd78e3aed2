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
