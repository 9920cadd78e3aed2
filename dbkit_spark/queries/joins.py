"""Join queries (SURVEY.md §2.3 — inner/outer/semi/anti/cross/broadcast,
plus the two joins Spark lacks natively: as-of and interval/range).

Scale notes per query are on the helper implementations in
``operators/joins.py``; tests assert broadcast/no-NLJ plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.aggregate import stable_sum, stable_sum_sql
from ..operators.joins import asof_join, broadcast_join, join, range_join
from ..sources import read_table


# --- B2: 3-way join + agg --------------------------------------------------
@register(
    "q07_join_3way_revenue",
    oracle=f"""
    SELECT n.n_name AS nation, COUNT(*) AS n_orders,
           {stable_sum_sql("o.o_totalprice")} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    notes="3-way equi-join; nation broadcast (tiny dim)",
)
def q07_join_3way_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split=False: both join sides are thin scans feeding broadcast hash
    # joins + partial agg; the two split shuffles measured net-negative
    # (A/B 0.70 s vs 1.10 s)
    orders = read_table(spark, sf_dir, "orders", split=False)
    customer = read_table(spark, sf_dir, "customer", split=False)
    nation = read_table(spark, sf_dir, "nation")
    joined = join(
        orders, customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    joined = broadcast_join(
        joined, nation.withColumnRenamed("n_nationkey", "c_nationkey"), "c_nationkey"
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            stable_sum("o_totalprice").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


# --- left outer join -------------------------------------------------------
@register(
    "q08_join_left_outer",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           COALESCE({stable_sum_sql("o.o_totalprice")}, 0.0) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    notes="left outer join preserving customers with zero orders",
)
def q08_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    customer = read_table(spark, sf_dir, "customer")
    return (
        join(customer, orders, "c_custkey", "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(stable_sum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


# --- semi / anti -----------------------------------------------------------
@register(
    "q09_join_semi_anti",
    oracle="""
    SELECT 'has_orders' AS tag, c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'no_orders' AS tag, c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    notes="left semi (EXISTS) + left anti (NOT EXISTS)",
)
def q09_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    customer = read_table(spark, sf_dir, "customer")
    has = join(customer, orders, "c_custkey", "left_semi").select(
        F.lit("has_orders").alias("tag"), "c_custkey"
    )
    without = join(customer, orders, "c_custkey", "left_anti").select(
        F.lit("no_orders").alias("tag"), "c_custkey"
    )
    return has.unionByName(without)


# --- broadcast join over the fact table ------------------------------------
@register(
    "q10_join_broadcast_brand",
    oracle=f"""
    SELECT p.p_brand AS brand, COUNT(*) AS n_items,
           {stable_sum_sql("l.l_extendedprice")} AS brand_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY brand
    """,
    notes="fact x broadcast(dim): no shuffle of lineitem for the join",
)
def q10_join_broadcast_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    return (
        broadcast_join(li, part, "l_partkey")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n_items"),
            stable_sum("l_extendedprice").alias("brand_revenue"),
        )
        .orderBy("brand")
    )


# --- cross join ------------------------------------------------------------
@register(
    "q11_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    notes="explicit cartesian product of two tiny tables (5 x 25)",
)
def q11_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    return region.select("r_name").crossJoin(nation.select("n_name"))


# --- as-of join (no native Spark primitive) --------------------------------
@register(
    "q12_asof_click_view",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts, v.ts AS ts_r, v.value AS view_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
    notes="as-of join via union+window last(ignorenulls): one shuffle on key, "
    "no range explosion (operators/joins.py asof_join)",
)
def q12_asof_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split=False: the asof rewrite's first op is the user_id exchange;
    # pre-exchange work is a thin filter/project (A/B: 0.31 s vs 0.71 s)
    events = read_table(spark, sf_dir, "events", split=False)
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = (
        events.filter(F.col("event_type") == "view")
        .select("user_id", "ts", F.col("value").alias("view_value"))
    )
    return asof_join(clicks, views, on_key="user_id", on_time="ts", direction="backward")


@register(
    "q129_asof_tolerance",
    oracle="""
    SELECT event_id, user_id, ts,
           CASE WHEN ts_r >= ts - INTERVAL 30 MINUTE THEN ts_r END AS ts_r,
           CASE WHEN ts_r >= ts - INTERVAL 30 MINUTE THEN view_value END
             AS view_value
    FROM (
      SELECT c.event_id, c.user_id, c.ts, v.ts AS ts_r, v.value AS view_value
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
        ON c.user_id = v.user_id AND c.ts >= v.ts
    )
    """,
    notes="as-of join with TOLERANCE (pandas merge_asof's max-gap "
    "parameter; operators/joins.asof_join): the nearest-preceding view "
    "only joins when within 30 minutes of the click, else the right side "
    "is nulled. Same one-key-shuffle plan as q12 — the gap cap is a "
    "map-side post-filter on the carried row's timestamp, not a join "
    "condition change; the oracle wraps DuckDB's ASOF JOIN in the "
    "identical CASE filter",
)
def q129_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    return asof_join(
        clicks,
        views,
        on_key="user_id",
        on_time="ts",
        direction="backward",
        tolerance="30 minutes",
    )


# --- interval / range join -------------------------------------------------
@register(
    "q13_range_join_tiers",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, t.tier
    FROM lineitem l
    JOIN (VALUES (0.0, 15.0, 'low'), (10.0, 30.0, 'mid'), (25.0, 60.0, 'high'))
         AS t(lo, hi, tier)
      ON l.l_quantity >= t.lo AND l.l_quantity <= t.hi
    """,
    notes="overlapping-interval join via bin-bucketing equi-join rewrite "
    "(operators/joins.py range_join) — no nested-loop plan",
)
def q13_range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split=False: broadcast bin-bucket probe + projection only — thin
    # map work, no engine shuffle to feed (A/B 1.07 s vs 1.30 s)
    li = read_table(spark, sf_dir, "lineitem", split=False).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    tiers = spark.createDataFrame(
        [(0.0, 15.0, "low"), (10.0, 30.0, "mid"), (25.0, 60.0, "high")],
        "lo double, hi double, tier string",
    )
    out = range_join(li, tiers, "l_quantity", "lo", "hi", bin_size=5.0)
    return out.select("l_orderkey", "l_linenumber", "tier")


@register(
    "q99_null_safe_join",
    oracle="""
    SELECT o.o_orderkey, NULLIF(o.o_orderstatus, 'O') AS st, v.tag
    FROM orders o
    JOIN (VALUES ('F', 'final'), (NULL, 'open')) AS v(st, tag)
      ON NULLIF(o.o_orderstatus, 'O') IS NOT DISTINCT FROM v.st
    """,
    notes="null-safe equality join (§2.3 edge semantics): <=> / IS NOT "
    "DISTINCT FROM treats NULL as a joinable value — NULL keys match the "
    "NULL row instead of silently dropping, the behavior batch dedup and "
    "dimension joins need for unknown keys; EqualNullSafe keys still plan "
    "as a hash join (broadcast, tiny dim), never a nested loop",
)
def q99_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("st"),
    )
    dim = F.broadcast(
        spark.createDataFrame(
            [("F", "final"), (None, "open")], "vst string, tag string"
        )
    )
    return orders.join(dim, orders["st"].eqNullSafe(dim["vst"])).select(
        "o_orderkey", "st", "tag"
    )
