"""Declarative data-quality audit: constraint checks over a set of
tables, reported as one violations table.

The warehouse "expectations" pattern (dbt tests / Deequ / Great
Expectations): declare constraints, get back one row per constraint with
checked/violation counts — never a per-row failure dump, so the report
is O(constraints), not O(data).

Constraint kinds:
- ``not_null(table, col)``
- ``unique(table, cols)``        — duplicate key groups
- ``foreign_key(child, fk, parent, pk)`` — orphaned child rows
- ``in_range(table, col, lo, hi)``      — out-of-bounds values (NULLs
  are not range violations; declare ``not_null`` separately)

100 TB design: every check is a single-pass aggregate. ``not_null`` and
``in_range`` are map-side count-if folds (one scan can host many of
them via shared-scan union). ``unique`` is one hash agg on the key.
``foreign_key`` is a left-anti join — at scale AQE/broadcast handles the
usual small-parent case, and the violation COUNT (not the rows) is all
that crosses stages. The final report is a tiny union.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    kind: str
    build: Callable[[dict[str, DataFrame]], DataFrame]


def _report(name: str, kind: str, checked: F.Column, violations: F.Column):
    return [
        F.lit(name).alias("constraint"),
        F.lit(kind).alias("kind"),
        checked.cast("long").alias("n_checked"),
        violations.cast("long").alias("n_violations"),
    ]


def not_null(table: str, col: str) -> Check:
    def build(tables):
        return tables[table].agg(
            *_report(
                f"not_null:{table}.{col}",
                "not_null",
                F.count(F.lit(1)),
                F.count_if(F.col(col).isNull()),
            )
        )

    return Check(f"not_null:{table}.{col}", "not_null", build)


def unique(table: str, cols: str | Sequence[str]) -> Check:
    cols = [cols] if isinstance(cols, str) else list(cols)
    key = ",".join(cols)

    def build(tables):
        groups = tables[table].groupBy(*cols).agg(F.count(F.lit(1)).alias("__n"))
        return groups.agg(
            *_report(
                f"unique:{table}.{key}",
                "unique",
                F.count(F.lit(1)),
                F.count_if(F.col("__n") > 1),
            )
        )

    return Check(f"unique:{table}.{key}", "unique", build)


def foreign_key(child: str, fk: str, parent: str, pk: str) -> Check:
    def build(tables):
        c, p = tables[child], tables[parent]
        # left join with a hit marker: checked count and orphan count fall
        # out of ONE pass over the child (an anti-join + separate count
        # would scan it twice and need a cross join to recombine)
        marked = c.select(F.col(fk).alias("__fk")).join(
            p.select(F.col(pk).alias("__pk")).distinct().withColumn(
                "__hit", F.lit(1)
            ),
            F.col("__fk") == F.col("__pk"),
            "left",
        )
        return marked.agg(
            *_report(
                f"foreign_key:{child}.{fk}->{parent}.{pk}",
                "foreign_key",
                F.count(F.lit(1)),
                F.count_if(F.col("__hit").isNull()),
            )
        )

    return Check(f"foreign_key:{child}.{fk}->{parent}.{pk}", "foreign_key", build)


def in_range(table: str, col: str, lo: float, hi: float) -> Check:
    def build(tables):
        c = F.col(col)
        return tables[table].agg(
            *_report(
                f"in_range:{table}.{col}[{lo},{hi}]",
                "in_range",
                F.count(c),
                F.count_if(c.isNotNull() & ((c < lo) | (c > hi))),
            )
        )

    return Check(f"in_range:{table}.{col}[{lo},{hi}]", "in_range", build)


def audit(tables: dict[str, DataFrame], checks: Sequence[Check]) -> DataFrame:
    """Run every check and union the one-row reports into the audit
    table (constraint, kind, n_checked, n_violations, ok)."""
    if not checks:
        raise ValueError("audit requires at least one check")
    frames = [c.build(tables) for c in checks]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.withColumn("ok", F.col("n_violations") == 0)


def observe_metrics(
    df: DataFrame, name: str, metrics: dict[str, F.Column]
) -> tuple[DataFrame, "object"]:
    """Attach zero-cost pipeline metrics to a DataFrame via Spark's
    Observation API: the named aggregates are computed DURING whatever
    action next consumes ``df`` — no second scan, no separate job.

    The production-telemetry complement to the audit checks above: an
    audit is its own (cheap) pass you schedule; an observation rides an
    existing write/collect for free, which at 100 TB is the only
    affordable way to track per-batch row counts, null rates, and value
    bounds on every pipeline run. Returns ``(observed_df, observation)``
    — read ``observation.get`` after an action has run.

    Metrics must be aggregate expressions (count/sum/min/max/...): the
    observation executes them as accumulator-style partial aggregates
    merged on the driver, exactly one value per metric per action.
    """
    if not metrics:
        raise ValueError("metrics must contain at least one aggregate")
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return out, obs
