"""Round-5 extension queries: general-depth recursion on the generic
fixpoint operator, multi-table LSH ANN recall, Spark-4 stateful
streaming, and UINT64 decimal fidelity.

Reference parity: dbkit (SURVEY §1) declares relational-calculus intent
(reference ``README.md:14``); none of these shapes exist in its
implemented surface (operation/scan_view.rs:12-56, operation/project.rs:
14-64) — they are re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import read_table


# --- general-depth reachability on iterate_until_fixpoint -------------------
@register(
    "q158_reachability_fixpoint",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT user_id AS src, (user_id * 7 + 3) % 150 AS dst FROM events
        UNION ALL
        SELECT user_id AS src, user_id + 1 AS dst FROM events WHERE user_id < 8
      )
    ),
    reach AS (
      SELECT src AS start, dst AS node FROM edges WHERE src < 5
      UNION
      SELECT r.start, e.dst AS node
      FROM reach r JOIN edges e ON r.node = e.src
    )
    SELECT start, node FROM reach
    """,
    notes="UNBOUNDED transitive closure (WITH RECURSIVE parity, "
    "completing q154's fixed-3-hop unroll): reachability from seed "
    "nodes over a cyclic graph whose closure needs 8-10 hops at every "
    "fixture SF, iterated to an actual fixpoint by "
    "operators/iterate.iterate_until_fixpoint — the generic loop "
    "(eager checkpoint barriers, scalar-measure convergence, max_iter "
    "rail) that also powers connected_components. SEMI-NAIVE "
    "evaluation: each round joins only the frontier (rows added last "
    "round, tracked by a flag column) against the edge table, not the "
    "whole reach set — at 100 TB the per-round join cost tracks the "
    "delta, the datalog discipline. Convergence = row count unchanged "
    "(the reach set only grows, so the monotone scalar measure is "
    "sound). Cycles terminate naturally: the anti-join drops already-"
    "reached pairs, so a cycle produces an empty frontier, exactly as "
    "DuckDB's UNION-distinct recursion terminates",
)
def q158_reachability_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.iterate import iterate_until_fixpoint

    ev = read_table(spark, sf_dir, "events")
    fun = ev.select(
        F.col("user_id").alias("src"),
        ((F.col("user_id") * 7 + 3) % 150).alias("dst"),
    )
    chain = ev.filter(F.col("user_id") < 8).select(
        F.col("user_id").alias("src"), (F.col("user_id") + 1).alias("dst")
    )
    edges = fun.unionByName(chain).distinct().persist()

    seeds = (
        edges.filter(F.col("src") < 5)
        .select(F.col("src").alias("start"), F.col("dst").alias("node"))
        .distinct()
        .withColumn("frontier", F.lit(True))
    )

    def step(state: DataFrame) -> DataFrame:
        frontier = state.filter(F.col("frontier")).select("start", "node")
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select("start", F.col("dst").alias("node"))
            .distinct()
            .join(state.select("start", "node"), ["start", "node"], "left_anti")
            .withColumn("frontier", F.lit(True))
        )
        return state.withColumn("frontier", F.lit(False)).unionByName(nxt)

    out = iterate_until_fixpoint(
        seeds, step, measure=lambda df: df.count(), max_iter=40
    )
    edges.unpersist()
    return out.select("start", "node")
