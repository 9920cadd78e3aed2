"""Plan-quality tests (the 100 TB contract, SURVEY.md §4/§7.4):
pushdown reaches the scan, projections prune the read schema, small dims
broadcast, rewrites of non-native joins avoid nested-loop plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbkit_spark.catalog import load_all
from dbkit_spark.plans import (
    assert_broadcast_join,
    assert_no_nested_loop_join,
    pushed_filters,
    read_schema_columns,
)
from dbkit_spark.plans.explain_utils import join_strategies
from dbkit_spark.sources import read_table

CATALOG = load_all()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = CATALOG["q03_filter_predicates"].fn(spark, sf_dir)
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed
    assert any("l_returnflag" in p for p in pushed), pushed


def test_column_pruning(spark, sf_dir):
    df = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cols = read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}, cols


def test_small_dim_join_broadcasts(spark, sf_dir):
    df = CATALOG["q07_join_3way_revenue"].fn(spark, sf_dir)
    assert_broadcast_join(df)


def test_fact_dim_broadcast(spark, sf_dir):
    df = CATALOG["q10_join_broadcast_brand"].fn(spark, sf_dir)
    assert_broadcast_join(df)


def test_asof_join_no_nlj(spark, sf_dir):
    df = CATALOG["q12_asof_click_view"].fn(spark, sf_dir)
    assert_no_nested_loop_join(df)


def test_range_join_no_nlj(spark, sf_dir):
    """The bin-bucket rewrite must plan as an equi-join on the bin, not a
    BroadcastNestedLoopJoin over the raw range predicate."""
    df = CATALOG["q13_range_join_tiers"].fn(spark, sf_dir)
    strategies = join_strategies(df)
    assert "BroadcastNestedLoopJoin" not in strategies, strategies
    assert "CartesianProduct" not in strategies, strategies


def test_topk_plans_take_ordered(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    df = orders.orderBy(F.col("o_totalprice").desc()).limit(5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
