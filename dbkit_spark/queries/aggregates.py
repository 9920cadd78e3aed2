"""Aggregation queries (SURVEY.md §2.4): global aggs, distinct aggs,
stats, rollup/grouping sets, filtered agg, collect aggs, approx aggs,
exact percentiles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.aggregate import dec, rounded, stable_avg_sql, stable_sum, stable_sum_sql
from ..sources import read_table


@register(
    "q14_agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_customers,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           {stable_sum_sql("o_totalprice")} AS sum_price,
           {stable_avg_sql("o_totalprice")} AS avg_price,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order
    FROM orders
    """,
    notes="global (no-key) aggregation incl. count distinct",
)
def q14_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        stable_sum("o_totalprice").alias("sum_price"),
        (F.sum(dec("o_totalprice")).cast("double") / F.count("o_totalprice")).alias("avg_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@register(
    "q15_agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS std_qty,
           ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS covar_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    notes="order-sensitive stats rounded to 6dp (SURVEY §7.4 canonicalization)",
)
def q15_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        rounded(F.stddev_samp("l_quantity")).alias("std_qty"),
        rounded(F.var_samp("l_quantity")).alias("var_qty"),
        rounded(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        rounded(F.covar_samp("l_quantity", "l_discount")).alias("covar_qty_disc"),
    )


@register(
    "q16_agg_distinct",
    oracle=f"""
    SELECT l_linestatus,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_distinct_qty,
           COUNT(DISTINCT l_returnflag) AS n_flags,
           COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem
    GROUP BY l_linestatus
    """,
    notes="distinct aggregates (sum distinct in decimal for exactness)",
)
def q16_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.sum_distinct(dec("l_quantity")).cast("double").alias("sum_distinct_qty"),
        F.countDistinct("l_returnflag").alias("n_flags"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@register(
    "q17_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n,
           {stable_sum_sql("o_totalprice")} AS total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    notes="rollup with grouping() markers (Spark grouping_id bit order "
    "matches GROUPING(a)+2*GROUPING(b) only for this 2-col encoding)",
)
def q17_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        (F.grouping("o_orderstatus") + F.lit(2) * F.grouping("o_orderpriority")).alias("gid"),
        F.count("*").alias("n"),
        stable_sum("o_totalprice").alias("total"),
    )


@register(
    "q18_filtered_agg",
    oracle=f"""
    SELECT o_orderpriority,
           {stable_sum_sql("o_totalprice")} AS total_all,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS total_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open
    FROM orders
    GROUP BY o_orderpriority
    """,
    notes="FILTER (WHERE ...) aggregates via when() on the Spark side",
)
def q18_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        stable_sum("o_totalprice").alias("total_all"),
        F.sum(F.when(F.col("o_orderstatus") == "F", dec("o_totalprice")))
        .cast("double")
        .alias("total_f"),
        F.count(F.when(F.col("o_orderstatus") == "O", F.lit(1))).alias("n_open"),
    )


@register(
    "q19_collect_agg",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
    notes="collect_set canonicalized (sorted + joined) for cross-engine compare",
)
def q19_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.count("*").alias("n"),
    )


@register(
    "q20_approx_distinct",
    oracle=None,
    notes="HLL++ sketch values are engine-specific -> rows-only check; "
    "exactness covered by q14/q16 countDistinct",
)
def q20_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@register(
    "q21_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
           ROUND(median(l_discount), 6) AS med_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    notes="exact interpolated percentiles (Spark percentile == DuckDB "
    "quantile_cont), rounded 6dp",
)
def q21_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        rounded(F.percentile("l_quantity", 0.5)).alias("p50_qty"),
        rounded(F.percentile("l_extendedprice", 0.9)).alias("p90_price"),
        rounded(F.median("l_discount")).alias("med_disc"),
    )
