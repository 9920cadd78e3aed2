"""Window-function queries (SURVEY.md §2.5): ranking, analytic, frames.

Every window spec here carries partition keys (scale rule enforced by
``operators/window.py``) and a total order (unique tiebreaker) so results
are deterministic under cross-engine comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.aggregate import dec
from ..operators.window import per_group_topk, spec
from ..sources import read_table


# --- B3: per-customer top-3 orders (row_number) ----------------------------
@register(
    "q22_topk_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
    notes="per-group top-k: one shuffle on the partition key",
)
def q22_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split=False: the window exchange on o_custkey is the query's first
    # op; only a projection precedes it (A/B: 0.34 s vs 0.64 s forced)
    orders = read_table(spark, sf_dir, "orders", split=False).select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return per_group_topk(
        orders,
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )


@register(
    "q23_ranking_functions",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist() OVER w AS cdist,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
    notes="rank/dense_rank/percent_rank/cume_dist/ntile over one shared window",
)
def q23_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = spec(["o_orderstatus"], [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()])
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "q24_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND UNBOUNDED FOLLOWING) AS first_price,
           last_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND UNBOUNDED FOLLOWING) AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    notes="lag/lead/first_value/last_value with explicit full frame",
)
def q24_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = spec(["o_custkey"], [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()])
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(wfull).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
    )


@register(
    "q25_window_frames",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS near_total
    FROM orders
    """,
    notes="ROWS and numeric RANGE frames; decimal-stabilized running sums",
)
def q25_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w_rows = (
        spec(["o_custkey"], [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_range = (
        spec(["o_custkey"], [F.col("o_totalprice").asc()])
        .rangeBetween(-10000, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.sum(dec("o_totalprice")).over(w_rows).cast("double").alias("running_total"),
        F.sum(dec("o_totalprice")).over(w_range).cast("double").alias("near_total"),
    )
