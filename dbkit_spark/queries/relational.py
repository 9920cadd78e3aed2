"""Core relational queries: scan/project (§2.1-2.2 Tier A parity),
predicates (§2.2), sort/limit/top-k (§2.6), set ops & dedup (§2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.aggregate import (
    stable_avg,
    stable_avg_sql,
    stable_sum,
    stable_sum_sql,
)
from ..operators.project import Projector
from ..operators.setops import dedup_keep_first
from ..operators.sort import topk
from ..sources import read_table


# --- B1: TPC-H Q1-shaped pricing summary (scan+filter+agg+sort) -----------
@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {stable_sum_sql("l_quantity")} AS sum_qty,
           {stable_sum_sql("l_extendedprice")} AS sum_base_price,
           {stable_sum_sql("l_extendedprice * (1 - l_discount)", 6)} AS sum_disc_price,
           {stable_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
           {stable_avg_sql("l_quantity")} AS avg_qty,
           {stable_avg_sql("l_extendedprice")} AS avg_price,
           {stable_avg_sql("l_discount")} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    notes="flagship; decimal-stabilized sums for cross-engine bit-equality",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split=True: nine decimal partial aggregates over six columns are
    # heavy map-side work fused into the scan; splitting the one-row-
    # group file parallelizes them (A/B at sf0.1: 1.43 s -> 0.60 s)
    li = read_table(spark, sf_dir, "lineitem", split=True)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_sum("l_quantity").alias("sum_qty"),
            stable_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(25,6)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(25,6)")).cast("double").alias("sum_charge"),
            stable_avg("l_quantity").alias("avg_qty"),
            stable_avg("l_extendedprice").alias("avg_price"),
            stable_avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- §2.2 Tier-A parity: projection by position / name / rename -----------
@register(
    "q02_project_rename",
    oracle="""
    SELECT p_partkey AS partkey, p_brand AS brand, p_type, p_retailprice
    FROM part
    """,
    notes="reference Project operator parity (projector.rs by-pos/by-name/rename)",
)
def q02_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    return (
        Projector()
        .add_position(0, "partkey")          # project_by_position (projector.rs:53-55)
        .add_name("p_brand", "brand")        # add_as rename (projector.rs:103-109)
        .add_name("p_type")                  # project_by_name (projector.rs:58-60)
        .add_name("p_retailprice")
        .apply(part)
    )


# --- §2.2 predicate algebra ------------------------------------------------
@register(
    "q03_filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
      AND l_returnflag IN ('A', 'R')
      AND (l_quantity > 25 OR l_discount <= 0.02)
      AND NOT (l_linestatus = 'O')
      AND l_tax IS NOT NULL
    """,
    notes="BETWEEN/IN/OR/NOT/IS NULL; all predicates parquet-pushable",
)
def q03_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    pred = (
        F.col("l_shipdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
        & F.col("l_returnflag").isin("A", "R")
        & ((F.col("l_quantity") > 25) | (F.col("l_discount") <= 0.02))
        & ~(F.col("l_linestatus") == "O")
        & F.col("l_tax").isNotNull()
    )
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


# --- §2.6 sort / limit / offset / top-k ------------------------------------
@register(
    "q04_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100 OFFSET 10
    """,
    notes="TakeOrderedAndProject top-k + offset; unique tiebreaker o_orderkey",
)
def q04_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    ranked = topk(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        110,
    )
    return ranked.offset(10).limit(100)


# --- §2.7 set operations (B4) ----------------------------------------------
@register(
    "q05_set_ops",
    oracle="""
    WITH a AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'A'),
         r AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT 'both' AS tag, l_orderkey FROM (SELECT l_orderkey FROM a INTERSECT SELECT l_orderkey FROM r)
    UNION ALL
    SELECT 'only_a' AS tag, l_orderkey FROM (SELECT l_orderkey FROM a EXCEPT SELECT l_orderkey FROM r)
    UNION ALL
    SELECT 'only_r' AS tag, l_orderkey FROM (SELECT l_orderkey FROM r EXCEPT SELECT l_orderkey FROM a)
    """,
    notes="union all / intersect / except over derived selects. "
    "OPTIMIZATION_r15: executed through operators/setops.set_split_tags — "
    "the engine's fused single-shuffle rewrite of exactly this "
    "intersect/except/union composition (one scan + one groupBy instead of "
    "6 scans, 2 distincts and 3 set-op shuffles; guide §2.4). Row set, "
    "schema and values are identical by the operator's contract and "
    "pinned by the unchanged oracle; the naive composition stays covered "
    "by operators/setops and its q54 anchor",
)
def q05_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.setops import set_split_tags

    # split=False: the fused split is filter + partial-agg straight into
    # its one exchange; the scan-split shuffle measured net-negative
    # (A/B 0.71 s vs 1.03 s)
    li = read_table(spark, sf_dir, "lineitem", split=False)
    return set_split_tags(
        li,
        ["l_orderkey"],
        F.col("l_returnflag") == "A",
        F.col("l_returnflag") == "R",
        tags=("both", "only_a", "only_r"),
    )


# --- §2.7 deterministic dedup ----------------------------------------------
@register(
    "q06_dedup_first_order",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn = 1
    """,
    notes="deterministic keep-first dedup (vs arbitrary dropDuplicates)",
)
def q06_dedup_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return dedup_keep_first(
        orders.select("o_custkey", "o_orderkey", "o_orderdate"),
        keys=["o_custkey"],
        order_by=[F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
    )
