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


def _plan_children(node):
    """Children of a physical-plan node, descending through AQE wrappers.

    QueryStageExec wraps its subtree behind ``.plan()`` (children() is
    empty), and AdaptiveSparkPlanExec hides the current plan behind
    ``.executedPlan()`` — both must be traversed or the walk stops at the
    wrapper and misses the aggregate underneath.
    """
    kids = []
    try:
        seq = node.children()
        kids = [seq.apply(i) for i in range(seq.size())]
    except Exception:
        pass
    if not kids:
        for accessor in ("plan", "executedPlan", "child"):
            try:
                inner = getattr(node, accessor)()
                if inner is not None:
                    kids = [inner]
                    break
            except Exception:
                continue
    return kids


def _walk_plan(node):
    yield node
    for child in _plan_children(node):
        yield from _walk_plan(child)


def _subtree_is_scalar(node) -> bool:
    """True if this physical subtree provably produces at most one row:
    it contains an aggregate with zero grouping expressions (a global
    scalar aggregate) on the path to every leaf, or it is a literal
    one-row relation."""
    for n in _walk_plan(node):
        cls = n.getClass().getSimpleName()
        if cls in (
            "HashAggregateExec",
            "ObjectHashAggregateExec",
            "SortAggregateExec",
        ):
            try:
                if n.groupingExpressions().size() == 0:
                    return True
            except Exception:
                continue
        if cls in ("LocalTableScanExec", "RDDScanExec") and "OneRowRelation" in n.toString():
            return True
    return False


def nlj_offenders(df: DataFrame) -> list[str]:
    """Structural NLJ gate (VERDICT r7 item 1): walk the physical plan and
    return a description of every BroadcastNestedLoopJoin whose broadcast
    side is NOT a scalar (no-grouping-key aggregate / one-row relation),
    plus every CartesianProduct. Intentional broadcast-scalar cross joins
    (1-row totals, thresholds, grids derived from a global agg) pass
    automatically, so adding one never goes stale against an allowlist."""
    root = df._jdf.queryExecution().executedPlan()
    out: list[str] = []
    for node in _walk_plan(root):
        cls = node.getClass().getSimpleName()
        if cls == "CartesianProductExec":
            out.append("CartesianProduct")
        elif cls == "BroadcastNestedLoopJoinExec":
            build = str(node.buildSide().toString())
            kids = _plan_children(node)
            if len(kids) != 2:
                out.append("BroadcastNestedLoopJoin(unreadable)")
                continue
            side = kids[0] if build == "BuildLeft" else kids[1]
            if not _subtree_is_scalar(side):
                out.append(f"BroadcastNestedLoopJoin(non-scalar {build})")
    return out


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
