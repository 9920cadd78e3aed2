"""Extended coverage queries: cube / grouping sets / pivot / unpivot
(SURVEY.md §2.4), multiset set ops (§2.7), vectorized UDF surface (§2.10),
map functions (§2.8)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import register
from ..operators.aggregate import stable_sum, stable_sum_sql
from ..operators.setops import except_all, intersect_all
from ..sources import read_table


@register(
    "q50_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n, {stable_sum_sql("l_quantity")} AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    notes="full cube (4 grouping-set combinations)",
)
def q50_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        (F.grouping("l_returnflag") + F.lit(2) * F.grouping("l_linestatus")).alias("gid"),
        F.count("*").alias("n"),
        stable_sum("l_quantity").alias("qty"),
    )


@register(
    "q51_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n, {stable_sum_sql("o_totalprice")} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    notes="explicit grouping sets (SQL path: Catalyst parses GROUPING SETS)",
)
def q51_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(f"""
        SELECT o_orderstatus, o_orderpriority,
               GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid,
               COUNT(*) AS n,
               {stable_sum_sql("o_totalprice")} AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


@register(
    "q52_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {stable_sum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o,
           {stable_sum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
    notes="pivot == conditional aggregation (portable oracle form)",
)
def q52_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            stable_sum("l_quantity").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return pivoted.select(
        "l_returnflag",
        F.col("O_qty").alias("qty_o"),
        F.col("F_qty").alias("qty_f"),
        F.col("O_n").alias("n_o"),
        F.col("F_n").alias("n_f"),
    )


@register(
    "q53_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
    """,
    notes="unpivot/melt via DataFrame.unpivot (oracle: UNION ALL form)",
)
def q53_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")


@register(
    "q54_multiset_ops",
    oracle="""
    SELECT 'inter_all' AS tag, l_orderkey FROM (
      SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT ALL
      SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    )
    UNION ALL
    SELECT 'except_all' AS tag, l_orderkey FROM (
      SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
      EXCEPT ALL
      SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    )
    """,
    notes="multiset (bag) semantics: intersectAll / exceptAll",
)
def q54_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_orderkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    inter = intersect_all(a, r).select(F.lit("inter_all").alias("tag"), "l_orderkey")
    exc = except_all(a, r).select(F.lit("except_all").alias("tag"), "l_orderkey")
    return inter.unionByName(exc)


# --- §2.10 vectorized UDF surface ------------------------------------------
@register(
    "q55_pandas_udf_scalar",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice / 1000.0
                 + datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) * 0.01,
                 6) AS score
    FROM orders
    """,
    notes="scalar pandas UDF (Arrow-vectorized); formula mirrored in SQL",
)
def q55_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def _order_score(total: pd.Series, days: pd.Series) -> pd.Series:
        """Arrow-batched scalar UDF (the analogue of the reference's batch
        expression evaluation, ``convert.rs:102-135``): row-local
        arithmetic, deterministic, mirrored exactly by the oracle SQL."""
        return (total / 1000.0) + days * 0.01

    orders = read_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    return orders.select(
        "o_orderkey",
        F.round(_order_score(F.col("o_totalprice"), days.cast("double")), 6).alias(
            "score"
        ),
    )


@register(
    "q56_grouped_agg_udaf",
    oracle="""
    SELECT o_custkey,
           round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 6) AS median_price
    FROM orders
    GROUP BY o_custkey
    """,
    notes="GROUPED_AGG pandas UDF (UDAF surface); numpy median == "
    "interpolated quantile for the oracle",
)
def q56_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(np.median(v.to_numpy()))

    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.round(median_udaf("o_totalprice"), 6).alias("median_price")
    )


@register(
    "q57_map_funcs",
    oracle="""
    SELECT event_id,
           array_to_string(
             CAST(map_keys(MAP {'type': event_type}) AS VARCHAR[]), ','
           ) AS ks,
           array_to_string(
             CAST(map_values(MAP {'type': event_type}) AS VARCHAR[]), ','
           ) AS vs,
           (MAP {'type': event_type}['type'])[1] AS type_val
    FROM events
    """,
    notes="map construction + key/value extraction; array outputs are "
    "projected to joined scalars (like q82) — pandas-side canonicalization "
    "can't sort on list-valued columns",
)
def q57_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    m = F.create_map(F.lit("type"), F.col("event_type"))
    return events.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("ks"),
        F.array_join(F.map_values(m), ",").alias("vs"),
        F.element_at(m, "type").alias("type_val"),
    )
