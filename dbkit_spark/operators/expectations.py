"""Declarative data-contract checking: an expectation-suite runner.

The operational complement to `operators/profile.py` — profiling asks
"what does this data look like?", a CONTRACT asks "does this batch
satisfy the rules we agreed on?" before it is allowed downstream
(the Great-Expectations-shaped gate every production pipeline runs at
ingest). Rules are declarative tuples; the runner folds ALL of them
into ONE aggregation pass:

- row-level rules (not_null, in_range, matches, in_set, min_length)
  become conditional sums combined map-side — N rules never means N
  jobs or N scans (the profile_table discipline);
- uniqueness rides the same pass as approx-free exact arithmetic:
  duplicate count = count(col) − count_distinct(col).

Output is long-format, one row per rule: (rule, column, n_checked,
n_violations, pass_rate, passed) — pass_rate is a small-int division
(raw-double portable), `passed` applies the rule's max_violation_rate
(default 0: hard gate).

Reference trace: none — dbkit stops at ToStr (`expression/convert.rs`);
contracts are north-star pipeline surface.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violation(kind: str, col: Column, params: dict[str, Any]) -> Column:
    """Boolean column: True where the ROW violates the rule. NULL
    handling: except for not_null itself, NULL values are SKIPPED
    (not violations) — compose with a not_null rule to forbid them."""
    if kind == "not_null":
        return col.isNull()
    if kind == "in_range":
        lo, hi = params["lo"], params["hi"]
        return col.isNotNull() & ~col.between(F.lit(lo), F.lit(hi))
    if kind == "matches":
        return col.isNotNull() & ~col.rlike(params["pattern"])
    if kind == "in_set":
        return col.isNotNull() & ~col.isin(list(params["values"]))
    if kind == "min_length":
        return col.isNotNull() & (F.length(col) < int(params["n"]))
    raise ValueError(f"unknown expectation kind {kind!r}")


def expectation_report(
    df: DataFrame,
    rules: Sequence[tuple[str, str, str, dict[str, Any]]],
) -> DataFrame:
    """Evaluate ``rules`` — (rule_name, kind, column, params) — in ONE
    aggregation pass. ``kind='unique'`` takes no params; every other
    kind is row-level. ``params['max_violation_rate']`` (default 0.0)
    sets the pass threshold per rule."""
    aggs = []
    for name, kind, column, params in rules:
        c = F.col(column)
        if kind == "unique":
            aggs.append(F.count(c).alias(f"_n_{name}"))
            aggs.append(
                (F.count(c) - F.countDistinct(c)).alias(f"_v_{name}")
            )
        else:
            viol = _violation(kind, c, params)
            checked = (
                F.count(F.lit(1))
                if kind == "not_null"
                else F.count(c)
            )
            aggs.append(checked.alias(f"_n_{name}"))
            aggs.append(
                F.sum(F.when(viol, 1).otherwise(0)).alias(f"_v_{name}")
            )
    wide = df.agg(*aggs)
    out_rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.lit(column).alias("column"),
                F.col(f"_n_{name}").cast("long").alias("n_checked"),
                F.col(f"_v_{name}").cast("long").alias("n_violations"),
                F.when(F.col(f"_n_{name}") == 0, F.lit(1.0))
                .otherwise(
                    1.0
                    - F.col(f"_v_{name}").cast("double")
                    / F.col(f"_n_{name}")
                )
                .alias("pass_rate"),
                (
                    F.when(
                        F.col(f"_n_{name}") == 0, F.lit(True)
                    ).otherwise(
                        F.col(f"_v_{name}").cast("double")
                        / F.col(f"_n_{name}")
                        <= F.lit(
                            float(params.get("max_violation_rate", 0.0))
                        )
                    )
                ).alias("passed"),
            )
            for name, kind, column, params in rules
        ]
    )
    return wide.select(F.explode(out_rows).alias("r")).select(
        "r.rule",
        "r.column",
        "r.n_checked",
        "r.n_violations",
        "r.pass_rate",
        "r.passed",
    )
