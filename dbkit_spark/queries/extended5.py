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
from ..operators.aggregate import stable_sum_sql
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


# --- multi-table LSH ANN ----------------------------------------------------
def _plane_dot_sql_t(p: int, table: int, dim: int = 64) -> str:
    """DuckDB expression for sign-plane p of hash table ``table`` — the
    exact md5 rule of llm/similarity._hyperplane_signs (table 0: key
    "p:d"; table t>0: key "t{t}:p:d")."""
    prefix = "" if table == 0 else f"t{table}:"
    return (
        f"list_sum(list_transform(generate_series(0, {dim - 1}), d -> "
        f"CAST(v[d + 1] AS DOUBLE) * "
        f"CASE WHEN (strpos('0123456789abcdef', substr(md5(concat('{prefix}{p}', "
        f"':', CAST(d AS VARCHAR))), 1, 1)) - 1) % 2 = 1 "
        f"THEN 1.0 ELSE -1.0 END))"
    )


def _bucket_sql_t(table: int, bits: int = 8) -> str:
    return "concat(" + ", ".join(
        f"CASE WHEN {_plane_dot_sql_t(p, table)} >= 0 THEN '1' ELSE '0' END"
        for p in range(bits)
    ) + ")"


@register(
    "q159_ann_multi_table_lsh",
    oracle=f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    bucketed AS (
      SELECT vec_id, v, {_bucket_sql_t(0)} AS b0, {_bucket_sql_t(1)} AS b1
      FROM e
    )
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM bucketed a JOIN bucketed b
      ON a.vec_id < b.vec_id AND (a.b0 = b.b0 OR a.b1 = b.b1)
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.25
    """,
    notes="MULTI-TABLE LSH ANN (llm/similarity.ann_bucketed_multi, "
    "closing the single-table recall cap): two independent md5-derived "
    "hyperplane tables computed in one corpus pass; a pair is a "
    "candidate if it collides in ANY table (union + DISTINCT before "
    "the cosine verify), so miss probability decays geometrically with "
    "table count while per-table bucket cost stays fixed — the "
    "standard recall dial alongside bits. Recall lift vs single-table "
    "at equal candidate budget is measured in tests/test_llm.py",
)
def q159_ann_multi_table_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import ann_bucketed_multi

    emb = read_table(spark, sf_dir, "embeddings")
    return ann_bucketed_multi(emb, threshold=0.25, n_tables=2)


# --- UINT64 fidelity --------------------------------------------------------
_U64_OFFSET = "9223372036854775808"  # 2^63: every derived value overflows i64
_U64_MAX = "18446744073709551615"    # 2^64 - 1: the full-range edge


def _ensure_uint64_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Write-once-per-(sf_dir) parquet file whose ``uval`` column is
    PHYSICAL parquet uint64 (pyarrow) holding values > 2^63-1, derived
    deterministically from events.user_id (2^63 + user_id, plus the
    2^64-1 edge). mtime-stamped against driver testdata regeneration.
    The driver-side materialization is metadata-sized (distinct user
    ids), a fixture-construction step — bulk ingest goes through the
    file readers."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ._fixtures import fixture_once, source_stamp

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"dbkit_u64_{tag}")
    path = os.path.join(base, "u64.parquet")

    def build() -> None:
        users = sorted(
            r.user_id
            for r in read_table(spark, sf_dir, "events")
            .select("user_id").distinct().collect()
        )
        vals = [int(_U64_OFFSET) + u for u in users] + [int(_U64_MAX)]
        os.makedirs(base, exist_ok=True)
        pq.write_table(
            pa.table({"uval": pa.array(vals, type=pa.uint64())}), path
        )

    fixture_once(base, source_stamp(sf_dir, "events"), build)
    return path


@register(
    "q160_uint64_fidelity",
    oracle=f"""
    WITH u AS (
      SELECT CAST(CAST('{_U64_OFFSET}' AS HUGEINT) + user_id AS DECIMAL(20,0)) AS uval
      FROM (SELECT DISTINCT user_id FROM events)
      UNION ALL
      SELECT CAST('{_U64_MAX}' AS DECIMAL(20,0))
    )
    SELECT COUNT(*) AS n,
           CAST(MIN(uval) AS VARCHAR) AS umin,
           CAST(MAX(uval) AS VARCHAR) AS umax,
           CAST(CAST(SUM(uval) AS DECIMAL(38,0)) AS VARCHAR) AS usum
    FROM u
    """,
    notes="UINT64 fidelity (SURVEY §1.2: dbkit u64, types.rs:67-70, maps "
    "to DecimalType(20,0) where values exceed 2^63-1): a PHYSICAL "
    "parquet uint64 file (2^63 + user_id per distinct user, plus the "
    "2^64-1 full-range edge) is read through the explicit "
    "DecimalType(20,0) schema path and aggregated in decimal "
    "arithmetic; the oracle recomputes the same values in HUGEINT from "
    "the raw events table, so any reader truncation/i64-overflow "
    "breaks min/max/sum. Aggregation runs in decimal; only the FINAL "
    "scalars are emitted as strings because pandas narrows wide "
    "decimals to float64 (which cannot represent 2^64-1) on the "
    "compare path. The TableAppender accepts the same values as "
    "Python ints (round-trip pytest in tests/test_sources_sinks.py)",
)
def q160_uint64_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from ..sources.readers import read_parquet

    path = _ensure_uint64_fixture(spark, sf_dir)
    u = read_parquet(
        spark, path, T.StructType([T.StructField("uval", T.DecimalType(20, 0))])
    )
    return u.agg(
        F.count("*").alias("n"),
        F.min("uval").cast("string").alias("umin"),
        F.max("uval").cast("string").alias("umax"),
        F.sum("uval").cast("decimal(38,0)").cast("string").alias("usum"),
    )


@register(
    "q161_ann_multi_index_query",
    oracle=f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    bucketed AS (
      SELECT vec_id, v, {_bucket_sql_t(0)} AS b0, {_bucket_sql_t(1)} AS b1
      FROM e
    )
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id,
           round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
    FROM bucketed c JOIN bucketed q
      ON (c.b0 = q.b0 OR c.b1 = q.b1) AND c.vec_id <> q.vec_id
    WHERE q.vec_id < 50
      AND round(list_cosine_similarity(q.v, c.v), 6) >= 0.1
    """,
    notes="multi-table index PERSISTENCE round-trip (q127's shape for "
    "the multi-table recall path): the corpus is hashed once into two "
    "per-table parquet indexes (each partition-pruned by its own "
    "bucket id); only the query batch is hashed at query time, once "
    "per table, and broadcast; per-table candidates union + DISTINCT "
    "before the cosine verify. The oracle recomputes both tables from "
    "the md5 rule, so a hash match proves the save/load round-trip "
    "preserves every table's bucket assignments and the vectors "
    "exactly",
)
def q161_ann_multi_index_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..llm.similarity import (
        ann_query_index_multi,
        load_hyperplane_index_multi,
        save_hyperplane_index_multi,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(tempfile.gettempdir(), f"dbkit_ann_multi_{sf_tag}")
    save_hyperplane_index_multi(emb, path, n_tables=2)
    tables = load_hyperplane_index_multi(spark, path, n_tables=2)
    return ann_query_index_multi(
        emb.filter(F.col("vec_id") < 50), tables, threshold=0.1
    )


# --- embedding near-dup dedup (end-to-end composition) ----------------------
@register(
    "q162_embedding_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    bucketed AS (
      SELECT vec_id, v, {_bucket_sql_t(0)} AS bucket FROM e
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT e2.dst, reach.r FROM reach JOIN edges e2 ON e2.src = reach.id
    )
    SELECT vec_id, label FROM embeddings
    WHERE vec_id IN (SELECT id FROM reach GROUP BY id HAVING min(r) = id)
    """,
    notes="EMBEDDING near-dup dedup end-to-end (the semantic twin of the "
    "q40/q87/q88 lexical pipeline): LSH-bucketed cosine pairs "
    "(llm/similarity.ann_bucketed, the q45 scale path) feed the "
    "connected-components survivor selection (llm/cluster."
    "dedup_survivors on operators/iterate) — one deterministic min-id "
    "survivor per cosine-similarity cluster, singletons kept. The "
    "oracle rebuilds the same pair graph from the md5 bucket rule and "
    "labels components via recursive-CTE reachability; every stage "
    "(bucketing, verify, closure) is bucketed/iterative, never "
    "all-pairs",
)
def q162_embedding_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.cluster import dedup_survivors
    from ..llm.similarity import ann_bucketed

    emb = read_table(spark, sf_dir, "embeddings")
    pairs = ann_bucketed(emb, threshold=0.3).select("id_a", "id_b")
    return dedup_survivors(
        emb, pairs, id_col="vec_id", a_col="id_a", b_col="id_b"
    ).select("vec_id", "label")


# --- runtime bloom-filter join pruning --------------------------------------
@register(
    "q163_bloom_filter_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           {stable_sum_sql("l.l_extendedprice", 2)} AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderpriority
    """,
    notes="RUNTIME BLOOM-FILTER join pruning (Catalyst InjectRuntimeFilter, "
    "the shuffle-join sibling of q145's DPP): the selective dim-side "
    "predicate builds a bloom filter (bloom_filter_agg subquery) that "
    "prunes fact rows BEFORE the join shuffle (might_contain on the "
    "fact scan) — at 100 TB this drops most of the fact table's shuffle "
    "traffic for selective joins on non-partition keys, where DPP "
    "cannot help. Fixture-scale thresholds (applicationSideScanSize=0, "
    "raised creation cap) are set ONLY during plan construction and "
    "restored — at production scale the defaults trigger on their own; "
    "plan-gated in tests/test_plans.py (might_contain + "
    "bloom_filter_agg present). Broadcast disabled for this plan so the "
    "shuffle-join path (the one bloom filters exist for) is exercised; "
    "the filter is semantically transparent, so the oracle is the "
    "plain join",
)
def q163_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregate import stable_sum

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = read_table(spark, sf_dir, "lineitem")
        o = read_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        out = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                stable_sum(F.col("l_extendedprice"), 2).alias("revenue"),
            )
        )
        # force physical planning NOW so the runtime-filter injection
        # happens under these confs; the restored session is untouched
        out._jdf.queryExecution().executedPlan()
        return out
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
