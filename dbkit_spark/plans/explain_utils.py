"""Physical-plan inspection (SURVEY.md §4, §7.4).

The scale contract is enforced here: tests assert that filters reach the
parquet scan (PushedFilters), that projections prune the read schema, that
small-dimension joins broadcast, and that non-equi joins did NOT silently
become nested-loop joins over large inputs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates pushed into the parquet scan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the parquet scan (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def assert_broadcast_join(df: DataFrame) -> None:
    strategies = join_strategies(df)
    assert any(s == "BroadcastHashJoin" for s in strategies), (
        f"expected a BroadcastHashJoin, got {strategies}"
    )


def assert_no_nested_loop_join(df: DataFrame) -> None:
    """Guard for SURVEY.md §7.4: non-equi joins silently degrading to NLJ."""
    strategies = join_strategies(df)
    bad = [s for s in strategies if s in ("BroadcastNestedLoopJoin", "CartesianProduct")]
    assert not bad, f"plan contains nested-loop/cartesian join: {bad}"
