"""Round-4 extension queries: remaining TPC-H decision-support shapes
(Q4/Q6/Q10/Q12/Q14/Q19/Q20 adapted to the fixture schema — it has no
commit/receipt dates, shipmode, or partsupp, so late shipping = shipped
>60 days after order date, and lineitem unit economics stand in for
partsupp), edit-distance near-dup pairs, skew-tolerant two-stage
aggregation, and event-transition analysis.

Reference parity: dbkit (SURVEY §1) declares OLAP read-side intent; its
implemented surface (operation/scan_view.rs:12-56, operation/project.rs:
14-64) never reaches these shapes — they are re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import CATALOG, register
from ..operators.aggregate import stable_sum, stable_sum_sql
from ..sources import read_table


# --- TPC-H Q6: predicate-only revenue forecast -----------------------------
@register(
    "q131_tpch_q6_forecast",
    oracle=f"""
    SELECT {stable_sum_sql("l_extendedprice * l_discount", 4)} AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
    notes="TPC-H Q6 shape: pure scan-side predicates + global agg — the "
    "canonical pushdown benchmark. All three filters reach the parquet "
    "scan (PushedFilters), the projection prunes to 4 columns, no "
    "shuffle beyond the single global-agg exchange; revenue "
    "decimal-carried at scale 4 (price x discount)",
)
def q131_tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.02, 0.04))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            stable_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )


# --- TPC-H Q10: returned-item reporting ------------------------------------
@register(
    "q132_tpch_q10_returned",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {stable_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    notes="TPC-H Q10 shape (returned-item reporting): fact-side filters "
    "pushed before the joins, nation broadcast, customer-grouped revenue, "
    "top-20 via TakeOrderedAndProject (revenue DESC with custkey "
    "tiebreak so the cut is deterministic)",
)
def q132_tpch_q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --- TPC-H Q12: late-shipping priority classes -----------------------------
@register(
    "q133_tpch_q12_late_priority",
    oracle="""
    SELECT l.l_returnflag,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    notes="TPC-H Q12 shape (shipping-mode priority split; the fixture "
    "has no l_shipmode/commitdate so late = shipped >60d after order "
    "date, as q113 defines lateness): conditional CASE aggregation over "
    "a fact-fact join — the late filter is a join-time predicate "
    "(depends on both sides), the CASE split is map-side before the "
    "final tiny groupBy",
)
def q133_tpch_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --- TPC-H Q14: promotion effect -------------------------------------------
@register(
    "q134_tpch_q14_promo",
    oracle=f"""
    SELECT CAST(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))
                 ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))) AS DOUBLE)
             AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    notes="TPC-H Q14 shape (promotion effect): conditional-ratio global "
    "agg over a month of lineitem broadcast-joined to part; both sums "
    "decimal-carried so the single output division is the only FP op "
    "(engine-exact); date filter pushed to the scan",
)
def q134_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = read_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(30,4)"
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(30,4)")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# --- TPC-H Q19: disjunctive predicate join ---------------------------------
@register(
    "q135_tpch_q19_disjunctive",
    oracle=f"""
    SELECT {stable_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    notes="TPC-H Q19 shape (discounted revenue, OR-of-ANDs): the "
    "disjunction spans both join sides so it stays a join-time "
    "predicate, but Catalyst extracts the common p_partkey equi-key -> "
    "broadcast hash join with residual condition, never a nested loop; "
    "single-side conjuncts (brand/size unions) are pushed to the part "
    "scan as an OR filter",
)
def q135_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4
            ).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


# --- TPC-H Q4: order-priority checking (EXISTS) ----------------------------
@register(
    "q136_tpch_q4_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    notes="TPC-H Q4 shape (order-priority checking): EXISTS expressed "
    "as a LEFT SEMI join (one probe per order, no fanout — a regular "
    "join would double-count orders with several late lines); the "
    "correlated o_orderdate reference rides the join condition; date "
    "window pushed to the orders scan",
)
def q136_tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = read_table(spark, sf_dir, "lineitem")
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- TPC-H Q20: nested semi-join chain -------------------------------------
@register(
    "q137_tpch_q20_supplier_parts",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      GROUP BY l.l_suppkey
      HAVING SUM(l.l_quantity) > 300
    )
    ORDER BY s.s_suppkey
    """,
    notes="TPC-H Q20 shape (potential part promotion, adapted — no "
    "partsupp in the fixture): nested IN-subqueries become a semi-join "
    "CHAIN — part filter broadcast-semi-prunes lineitem, a suppkey "
    "aggregate applies the HAVING threshold, and the supplier probe is "
    "a final semi-join; no subquery ever re-executes per row",
)
def q137_tpch_q20_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem")
    promo_parts = read_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    heavy = (
        li.join(
            F.broadcast(promo_parts), li["l_partkey"] == promo_parts["p_partkey"], "left_semi"
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    return (
        s.join(heavy, s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --- edit-distance near-dup pairs ------------------------------------------
@register(
    "q138_edit_distance_pairs",
    oracle="""
    WITH d AS (SELECT doc_id, substr(text, 1, 40) AS prefix,
                      length(substr(text, 1, 40)) AS plen
               FROM documents),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.prefix AS pa, b.prefix AS pb
      FROM d a JOIN d b
        ON substr(a.prefix, 1, 8) = substr(b.prefix, 1, 8)
       AND a.doc_id < b.doc_id
       AND abs(a.plen - b.plen) <= 4
    )
    SELECT doc_a, doc_b,
           CAST(levenshtein(pa, pb) AS BIGINT) AS edit_dist
    FROM cand
    WHERE levenshtein(pa, pb) <= 8
    """,
    notes="edit-distance near-dup pairs (dedup family, §2.11): "
    "Levenshtein is quadratic per pair and unindexable, so candidates "
    "are bucketed by 8-char prefix + length-difference bound (a "
    "length-filter lemma: |len(a)-len(b)| <= d is necessary for "
    "distance <= d) BEFORE any distance is computed — the equi-join on "
    "the prefix shards the n^2 problem exactly like LSH bands; both "
    "engines run the same full DP metric on survivors only",
)
def q138_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("prefix")
    ).withColumn("plen", F.length("prefix"))
    a = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("prefix").alias("pa"),
        F.col("plen").alias("la"),
        F.substring("prefix", 1, 8).alias("bucket"),
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("prefix").alias("pb"),
        F.col("plen").alias("lb"),
        F.substring("prefix", 1, 8).alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("la") - F.col("lb")) <= 4)
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pa", "pb").cast("long").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 8)
    )


# --- skew-tolerant two-stage aggregation -----------------------------------
@register(
    "q139_salted_two_stage_agg",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n, {stable_sum_sql("value")} AS total_value
    FROM events GROUP BY event_type
    """,
    notes="skew-tolerant TWO-STAGE aggregation (the 100 TB pattern for "
    "heavy-hitter grouping keys, complementing q64's salted join): "
    "stage 1 groups by (key, salt=pmod(hash(row-id), 16)) so one hot "
    "key spreads over 16 reducers; stage 2 merges the 16 partials per "
    "key. The oracle is the plain one-stage groupBy — results are "
    "identical because count/decimal-sum are associative; only the "
    "shuffle layout differs (partial rows = 16 x |keys|, metadata-"
    "sized). Spark's own partial aggregation does this implicitly for "
    "built-in aggs; the explicit salt is the pattern for UDAFs and "
    "collect-style aggs where map-side combine can't help",
)
def q139_salted_two_stage_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregate import dec

    ev = read_table(spark, sf_dir, "events")
    salted = ev.withColumn("__salt", F.pmod(F.hash("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "__salt").agg(
        F.count("*").alias("__n"), F.sum(dec("value", 2)).alias("__s")
    )
    return partial.groupBy("event_type").agg(
        F.sum("__n").alias("n"), F.sum("__s").cast("double").alias("total_value")
    )


# --- event transition analysis ---------------------------------------------
@register(
    "q140_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY n DESC, event_type, next_type
    LIMIT 15
    """,
    notes="event-transition matrix (journey analysis over the events "
    "stream): per-user next-event via lead() — one user-keyed shuffle "
    "shared by the window — then a tiny transition-count agg; "
    "event_id tiebreak makes per-user order total so the lead() "
    "pairing is deterministic; top-15 with full tiebreak for a "
    "deterministic cut",
)
def q140_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    return (
        seq.groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "event_type", "next_type")
        .limit(15)
    )


_TOKS4_SQL = """
  SELECT doc_id, text, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS t
  FROM documents
"""

_SHINGLE10_SQL = (
    "list_distinct(list_transform(generate_series(1, len(t)-9), i -> "
    "concat_ws(' ', t[i+0], t[i+1], t[i+2], t[i+3], t[i+4], t[i+5], "
    "t[i+6], t[i+7], t[i+8], t[i+9])))"
)


# --- cross-document exact 10-gram contamination ----------------------------
@register(
    "q141_cross_doc_ngram10",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SHINGLE10_SQL} AS shingles
                FROM ({_TOKS4_SQL}) WHERE len(t) >= 10),
    shx AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM shx a JOIN shx b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
    )
    SELECT doc_a AS doc_id, COUNT(*) AS n_partners
    FROM pairs GROUP BY doc_a
    """,
    notes="cross-document EXACT 10-token-run detection (the substring-"
    "level contamination check training pipelines run between corpus "
    "shards, complementing q89's benchmark decontamination): docs "
    "sharing a verbatim 10-gram are flagged with their partner count. "
    "10-grams are far more selective than q42's 3-gram shingles, so the "
    "inverted-index join's bucket fanout is tiny; same equi-join shape, "
    "no quadratic risk at this n",
)
def q141_cross_doc_ngram10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import shingles_from_tokens, tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array(tokens("text"))).alias("__toks")
    )
    sh = toks.select(
        "doc_id",
        F.array_distinct(shingles_from_tokens("__toks", 10)).alias("shingles"),
    ).filter(F.size("__toks") >= 10)
    shx = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    a = shx.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shx.select(F.col("doc_id").alias("doc_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return pairs.groupBy(F.col("doc_a").alias("doc_id")).agg(
        F.count("*").alias("n_partners")
    )


# --- end-to-end corpus curation --------------------------------------------
@register(
    "q142_corpus_curation",
    oracle=f"""
    WITH survivors AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (
                 PARTITION BY sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
                 ORDER BY doc_id) AS rn
        FROM documents
      ) WHERE rn = 1
    ),
    stats AS (
      SELECT doc_id, len(t) AS n_tokens,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(t, x -> list_contains({['a', 'an', 'and', 'are', 'as', 'at', 'be', 'by', 'for', 'from', 'in', 'is', 'it', 'of', 'on', 'or', 'that', 'the', 'to', 'with']}, x))) AS DOUBLE) / len(t)
             END AS stop_ratio,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
             END AS punct_ratio,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t)
             END AS avg_wlen,
             length(text) AS n_chars
      FROM ({_TOKS4_SQL})
    )
    SELECT s.doc_id, s.n_tokens,
           CAST(CASE WHEN s.n_chars BETWEEN 100 AND 20000 THEN 0.25 ELSE 0.0 END
            + CASE WHEN s.punct_ratio <= 0.1 THEN 0.25 ELSE 0.0 END
            + CASE WHEN s.stop_ratio BETWEEN 0.02 AND 0.6 THEN 0.25 ELSE 0.0 END
            + CASE WHEN s.avg_wlen BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END
             AS DOUBLE) AS quality
    FROM stats s JOIN survivors USING (doc_id)
    WHERE (CASE WHEN s.stop_ratio >= 0.05 THEN 'en' ELSE 'unk' END) = 'en'
      AND CASE WHEN s.n_chars BETWEEN 100 AND 20000 THEN 0.25 ELSE 0.0 END
        + CASE WHEN s.punct_ratio <= 0.1 THEN 0.25 ELSE 0.0 END
        + CASE WHEN s.stop_ratio BETWEEN 0.02 AND 0.6 THEN 0.25 ELSE 0.0 END
        + CASE WHEN s.avg_wlen BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END >= 0.75
    """,
    notes="END-TO-END corpus curation (the composed shape every training "
    "pipeline ships): exact-dedup survivors ∧ heuristic lang-ID = 'en' "
    "∧ composite quality >= 0.75, emitting the curated doc set with "
    "token counts. Composes exact_dedup + lang_id + quality_score in "
    "ONE plan: dedup window and stats projection share the documents "
    "scan, the survivor semi-join is the only extra shuffle; at 100 TB "
    "each stage is the already-verified scalable operator",
)
def q142_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import lang_id, quality_score, token_count, tokens
    from ..llm.dedup import exact_dedup

    docs = read_table(spark, sf_dir, "documents")
    survivors = exact_dedup(docs).select("doc_id")
    with_toks = docs.select("doc_id", "text", tokens("text").alias("__toks"))
    tk = F.col("__toks")
    stats = with_toks.select(
        "doc_id",
        F.size(tk).cast("long").alias("n_tokens"),
        lang_id("text", tk).alias("__lang"),
        quality_score("text", tk).alias("quality"),
    )
    return (
        stats.join(survivors, "doc_id", "left_semi")
        .filter((F.col("__lang") == "en") & (F.col("quality") >= 0.75))
        .select("doc_id", "n_tokens", "quality")
    )


# --- vector math surface ---------------------------------------------------
@register(
    "q143_vector_norms",
    oracle="""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings)
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS l2,
           round(list_sum(v) / len(v), 6) AS mean_comp,
           CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos,
           round(list_sum(v), 6) AS dot_ones
    FROM e
    """,
    notes="vector math surface (functions/vectors over array<float>): "
    "L2 norm, component mean, positive-component count, dot with the "
    "all-ones vector — every fold is a JVM higher-order aggregate "
    "(zero Python crossings, zero shuffles; the whole query is one "
    "map-only projection)",
)
def q143_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import dot, norm

    emb = read_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.round(norm(v), 6).alias("l2"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / F.size("embedding"), 6
        ).alias("mean_comp"),
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x), 6).alias("dot_ones"),
    )


# --- bucketed co-located join ----------------------------------------------
def _ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write-once-per-(session, sf_dir) bucketed orders/lineitem fixture.

    Kept OUT of q144's query function so the measured query is the
    co-located join, not the bucketed write: repeat invocations (bench
    reps, plan asserts) skip the write when the catalog tables and their
    external paths already exist. A fresh session re-registers by
    rewriting once (cheap at test SFs; a real deployment writes its
    bucketed tables once, ever).

    The path is scoped PER SPARK APPLICATION: a second concurrent
    session has a fresh (empty) catalog, so a shared path would make it
    rewrite the directory out from under the first session's in-flight
    scans (FAILED_READ_FILE.FILE_NOT_EXIST — hit when two pytest
    sessions overlapped). Session-scoped paths trade a rewrite per
    session for zero cross-session interference."""
    import os
    import tempfile

    from ..sources.writers import write_bucketed

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    app = spark.sparkContext.applicationId.replace("-", "_")
    base = os.path.join(
        tempfile.gettempdir(), f"dbkit_bucketed_{tag}_{app}"
    )
    names = (f"b4_orders_{tag}", f"b4_lineitem_{tag}")
    specs = [
        (names[0], "orders", "o_orderkey", f"{base}/orders"),
        (names[1], "lineitem", "l_orderkey", f"{base}/lineitem"),
    ]
    for table, src, key, path in specs:
        if spark.catalog.tableExists(table) and os.path.isdir(path):
            continue
        write_bucketed(read_table(spark, sf_dir, src), table, 8, [key], path=path)
    return names


def _ensure_partitioned_events(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write-once-per-(session, sf_dir) partitioned-events + dim fixture
    for q145 (same rationale as ``_ensure_bucketed_tables``). Returns
    (fact_path, dim_path)."""
    import os
    import tempfile

    from ..sources.writers import write_parquet

    from ._fixtures import fixture_once, source_stamp

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"dbkit_part_events_{tag}")
    dim_path = os.path.join(tempfile.gettempdir(), f"dbkit_event_dim_{tag}")

    # the marker records the source file's mtime: a driver-regenerated
    # /root/testdata (the known ts-encoding-drift scenario) invalidates
    # the cached fixture instead of silently serving stale rows; the
    # dim table rides the fact table's marker (written in one build)
    def build() -> None:
        write_parquet(read_table(spark, sf_dir, "events"), path,
                      partition_by=["event_type"])
        spark.createDataFrame(
            [("click", "paid"), ("purchase", "paid"), ("view", "free"),
             ("error", "free"), ("login", "free")],
            "event_type string, tier string",
        ).write.mode("overwrite").parquet(dim_path)

    fixture_once(path, source_stamp(sf_dir, "events"), build)
    return path, dim_path


@register(
    "q144_bucketed_colocated_join",
    oracle=f"""
    SELECT o.o_orderstatus,
           COUNT(*) AS n,
           {stable_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    ORDER BY o.o_orderstatus
    """,
    notes="bucketed CO-LOCATED join (sources/writers.write_bucketed, the "
    "100 TB pattern for repeated fact-fact joins): orders and lineitem "
    "are written bucketed+sorted by orderkey into the session catalog, "
    "then joined from the bucketed tables — both sides arrive "
    "pre-partitioned so the join plans ZERO exchanges (plan-asserted in "
    "tests/test_plans.py); the oracle is the plain join on the raw "
    "tables, proving bucketing changes layout, never results",
)
def q144_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_t, lineitem_t = _ensure_bucketed_tables(spark, sf_dir)
    ob = spark.table(orders_t)
    lb = spark.table(lineitem_t)
    return (
        ob.join(lb, ob["o_orderkey"] == lb["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            stable_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4
            ).alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


# --- dynamic partition pruning ---------------------------------------------
@register(
    "q145_dynamic_partition_pruning",
    oracle=f"""
    SELECT e.user_id, COUNT(*) AS n, {stable_sum_sql("e.value")} AS total_value
    FROM events e
    JOIN (VALUES ('click'), ('purchase')) AS d(event_type)
      ON e.event_type = d.event_type
    GROUP BY e.user_id
    """,
    notes="DYNAMIC partition pruning (the partitioned-fact ⋈ filtered-dim "
    "shape): events is written partitioned by event_type, then joined "
    "with a 2-row dim — Spark injects a runtime partition filter from "
    "the broadcast dim so only 2 of 5 partition directories are read "
    "(dynamicpruning expression plan-asserted in tests/test_plans.py); "
    "static pruning can't do this because the partition set comes from "
    "the dim side at runtime. Oracle is the plain join on raw events",
)
def q145_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregate import dec

    path, dim_path = _ensure_partitioned_events(spark, sf_dir)
    fact = spark.read.parquet(path)
    # DPP is injected only when the dim side carries a LIKELY-SELECTIVE
    # filter over a real scan (Catalyst's hasSelectivePredicate →
    # isLikelySelective gate). Two probed traps: a literal dim constant-
    # folds to a LocalRelation, erasing the filter before the
    # PartitionPruning rule runs; and a bare boolean attribute filter
    # (billable) is NOT in isLikelySelective's pattern list — only
    # literal comparisons/IN/LIKE qualify. So: dim persisted to parquet,
    # filtered by string equality.
    dim = (
        spark.read.parquet(dim_path)
        .filter(F.col("tier") == "paid")
        .select("event_type")
    )
    return (
        fact.join(F.broadcast(dim), "event_type")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value", 2)).cast("double").alias("total_value"),
        )
    )


# --- string function surface II --------------------------------------------
@register(
    "q147_string_surface2",
    oracle="""
    SELECT doc_id,
           translate(substr(text, 1, 20), 'aeiou', '#####') AS devoweled,
           split_part(substr(text, 1, 30), ' ', 2) AS second_word,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           rpad(left(lang, 2), 5, '_') AS lang_tag,
           reverse(left(source, 4)) AS rsrc,
           repeat(left(lang, 1), 3) AS lll,
           ascii(left(text, 1)) AS first_cp,
           CAST(length(text) AS BIGINT) AS n_chars2
    FROM documents
    """,
    notes="string function surface II (§2.8, beyond q26's basics): "
    "translate / split_part / lpad / rpad / reverse / repeat / left / "
    "ascii — all JVM codegen'd, whole query is one map-only projection; "
    "every function has an exact DuckDB twin so the oracle pins "
    "semantics (1-based split_part indexing, pad-truncation rules)",
)
def q147_string_surface2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.translate(F.substring("text", 1, 20), "aeiou", "#####").alias("devoweled"),
        F.split_part(F.substring("text", 1, 30), F.lit(" "), F.lit(2)).alias(
            "second_word"
        ),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.rpad(F.substring("lang", 1, 2), 5, "_").alias("lang_tag"),
        F.reverse(F.substring("source", 1, 4)).alias("rsrc"),
        F.repeat(F.substring("lang", 1, 1), 3).alias("lll"),
        F.ascii(F.substring("text", 1, 1)).cast("long").alias("first_cp"),
        F.length("text").cast("long").alias("n_chars2"),
    )


# --- grouped quantile sketch (exact-at-this-accuracy) ----------------------
@register(
    "q148_approx_percentile",
    oracle="""
    SELECT event_type,
           quantile_disc(value, 0.25) AS p25,
           quantile_disc(value, 0.5) AS p50,
           quantile_disc(value, 0.9) AS p90,
           quantile_disc(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
    notes="approx_percentile / GK quantile sketch (§2.4, the mergeable-"
    "sketch twin of q21's exact interpolated percentiles): "
    "percentile_approx(accuracy=1e6) — with accuracy exceeding every "
    "group's row count the GK sketch's error bound collapses to 0 and "
    "the sketch returns exact discrete quantiles, so the DuckDB "
    "quantile_disc oracle pins the SAME code path a 100 TB run uses "
    "with bounded memory (the sketch is mergeable map-side state; at "
    "scale you lower accuracy, trading the proven rank-error bound)",
)
def q148_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    p = F.percentile_approx("value", [0.25, 0.5, 0.9, 0.99], 1_000_000)
    return ev.groupBy("event_type").agg(
        p.getItem(0).alias("p25"),
        p.getItem(1).alias("p50"),
        p.getItem(2).alias("p90"),
        p.getItem(3).alias("p99"),
    )


# --- analytic functions II: nth_value / ignoreNulls ------------------------
@register(
    "q149_nth_value_analytics",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           first_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END
                       IGNORE NULLS) OVER w AS first_final_price,
           CAST(count(*) OVER w AS BIGINT) AS n_so_far
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    notes="analytic surface II (§2.5, beyond q24's lag/lead/first/last): "
    "nth_value over a running frame (null until the frame holds n rows) "
    "and first_value(... IGNORE NULLS) as the 'first matching event' "
    "idiom — Spark expresses IGNORE NULLS via the ignoreNulls flag over "
    "a CASE projection; o_orderkey tiebreak keeps frames identical "
    "across engines; one customer-keyed shuffle shared by all three "
    "window functions",
)
def q149_nth_value_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    final_price = F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.first(final_price, ignorenulls=True).over(w).alias("first_final_price"),
        F.count("*").over(w).cast("long").alias("n_so_far"),
    )


# --- date/time surface II ---------------------------------------------------
@register(
    "q150_datetime_surface2",
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           date_add(o_orderdate, INTERVAL 1 MONTH) AS next_month,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(isodow(o_orderdate) - 1 AS INT) AS weekday0,
           dayname(o_orderdate) AS dname,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
           CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since
    FROM orders
    """,
    notes="date/time surface II (§2.8, beyond q28's basics): last_day / "
    "add_months (month-end clamping: Jan 31 + 1 month = Feb 29) / "
    "quarter / ISO week / weekday / day name / week truncation / day "
    "diff. Engine alignment pinned by the oracle: Spark weekday() is "
    "0=Monday = DuckDB isodow-1 (Spark dayofweek()'s 1=Sunday would "
    "mismatch); both use ISO week numbering; map-only projection",
)
def q150_datetime_surface2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.add_months(d, 1).cast("timestamp").alias("next_month"),
        F.quarter(d).alias("q"),
        F.weekofyear(d).alias("iso_week"),
        F.weekday(d).alias("weekday0"),
        F.date_format(d, "EEEE").alias("dname"),
        F.date_trunc("week", d).alias("week_start"),
        F.datediff(d, F.lit("1995-01-01")).alias("days_since"),
    )


# --- explode variants: posexplode / explode_outer ---------------------------
@register(
    "q151_explode_variants",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                       t -> t <> '')) >= 5
                  THEN list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                   t -> t <> '')[1:3]
                  ELSE [] END AS toks
      FROM documents
    )
    SELECT doc_id, CAST(pos - 1 AS INT) AS pos, tok FROM (
      SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
      FROM d WHERE len(toks) > 0
    )
    UNION ALL
    SELECT doc_id, NULL AS pos, NULL AS tok FROM d WHERE len(toks) = 0
    """,
    notes="explode variants (§2.8 lateral surface): posexplode (0-based "
    "ordinal) and explode_outer's keep-empty semantics — rows whose "
    "array is empty survive with NULL pos/token instead of vanishing "
    "(the lateral twin of a left join; plain explode drops them). The "
    "oracle emulates explode_outer with unnest + generate_subscripts "
    "UNION the empty-array rows; both sides are per-row lateral "
    "expansion, no shuffle",
)
def q151_explode_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = tokens("text")
    d = docs.select(
        "doc_id",
        F.when(F.size(toks) >= 5, F.slice(toks, 1, 3))
        .otherwise(F.array().cast("array<string>"))
        .alias("toks"),
    )
    return d.select(
        "doc_id", F.posexplode_outer("toks").alias("pos", "tok")
    )


# --- CDC apply: changelog onto base snapshot --------------------------------
@register(
    "q153_cdc_apply",
    oracle=f"""
    WITH changes AS (
      SELECT user_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
               AS rn
      FROM events
    ),
    last_change AS (SELECT user_id, op, value FROM changes WHERE rn = 1)
    SELECT c.c_custkey AS user_id,
           CASE WHEN lc.user_id IS NULL THEN c.c_acctbal ELSE lc.value END
             AS acctbal,
           CASE WHEN lc.user_id IS NULL THEN 'base' ELSE 'updated' END AS src
    FROM customer c LEFT JOIN last_change lc ON c.c_custkey = lc.user_id
    WHERE lc.op IS NULL OR lc.op <> 'D'
    """,
    notes="CDC APPLY (the changelog-onto-snapshot merge every warehouse "
    "ingest runs): events act as a per-user change stream (error = "
    "delete, anything else = upsert of value), applied onto the "
    "customer base snapshot — last-writer-wins by (ts, event_id), "
    "deleted keys drop, untouched base rows survive. One window "
    "shuffle to pick each key's final op + one left join; the same "
    "plan shape as foreachBatch upsert (q107) but expressed as a "
    "single batch merge with a full SQL oracle",
)
def q153_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cust = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last_change = (
        ev.select(
            "user_id",
            F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
            "value",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "op", "value")
    )
    merged = cust.join(
        last_change, cust["c_custkey"] == last_change["user_id"], "left"
    )
    return (
        merged.filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.col("c_custkey").alias("user_id"),
            F.when(F.col("op").isNull(), F.col("c_acctbal"))
            .otherwise(F.col("value"))
            .alias("acctbal"),
            F.when(F.col("op").isNull(), "base").otherwise("updated").alias("src"),
        )
    )


# --- bounded transitive closure --------------------------------------------
@register(
    "q154_transitive_closure",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT user_id AS src, (user_id * 7 + 3) % 150 AS dst
      FROM events
    ),
    reach AS (
      SELECT src AS start, dst AS node, 1 AS depth FROM edges WHERE src < 10
      UNION
      SELECT r.start, e.dst AS node, r.depth + 1 AS depth
      FROM reach r JOIN edges e ON r.node = e.src
      WHERE r.depth < 3
    )
    SELECT start, node, CAST(MIN(depth) AS INT) AS min_depth
    FROM reach GROUP BY start, node
    """,
    notes="bounded TRANSITIVE CLOSURE / recursive reachability (the "
    "iterative-join family next to connected components): 3-hop "
    "reachability from seed nodes over a deterministic functional graph "
    "derived from events. Spark expresses the recursion as an unrolled "
    "frontier loop — each hop is one equi-join against the edge table, "
    "min-depth dedup per round keeps the frontier from exploding (the "
    "exact label-propagation discipline connected_components uses); "
    "the oracle is DuckDB's native WITH RECURSIVE",
)
def q154_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    edges = (
        ev.select(
            F.col("user_id").alias("src"),
            ((F.col("user_id") * 7 + 3) % 150).alias("dst"),
        )
        .distinct()
        .persist()
    )
    frontier = (
        edges.filter(F.col("src") < 10)
        .select(F.col("src").alias("start"), F.col("dst").alias("node"))
        .withColumn("depth", F.lit(1))
    )
    all_reach = frontier
    for hop in (2, 3):
        nxt = (
            all_reach.filter(F.col("depth") == hop - 1)
            .join(edges, F.col("node") == edges["src"])
            .select("start", F.col("dst").alias("node"), F.lit(hop).alias("depth"))
        )
        all_reach = all_reach.unionByName(nxt)
    return all_reach.groupBy("start", "node").agg(
        F.min("depth").cast("int").alias("min_depth")
    )


# --- multi-format sink/source round-trip ------------------------------------
@register(
    "q155_format_roundtrip",
    oracle="""
    SELECT fmt, event_type, n FROM (
      SELECT 'csv' AS fmt, event_type, COUNT(*) AS n FROM events GROUP BY event_type
      UNION ALL
      SELECT 'json', event_type, COUNT(*) FROM events GROUP BY event_type
      UNION ALL
      SELECT 'orc', event_type, COUNT(*) FROM events GROUP BY event_type
    )
    """,
    notes="Tier-C format round-trip as a driver-visible query (§2.1, "
    "beyond the pytest round-trips): the events projection is written "
    "to CSV, JSON, and ORC sinks and read back through the explicit-"
    "schema readers; per-type counts from each re-read must equal the "
    "parquet-sourced oracle — a writer or reader corrupting rows, "
    "headers, or types under any format breaks the hash. Columns "
    "restricted to int/string (CSV has no binary-exact double "
    "round-trip contract)",
)
def q155_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from pyspark.sql import types as T

    from ..sources.readers import read_csv, read_json, read_orc
    from ..sources.writers import write_csv, write_json, write_orc

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"dbkit_fmt_{tag}")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    write_csv(ev, f"{base}/csv")
    write_json(ev, f"{base}/json")
    write_orc(ev, f"{base}/orc")
    parts = [
        read_csv(spark, f"{base}/csv", schema).withColumn("fmt", F.lit("csv")),
        read_json(spark, f"{base}/json", schema).withColumn("fmt", F.lit("json")),
        read_orc(spark, f"{base}/orc", schema).withColumn("fmt", F.lit("orc")),
    ]
    un = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return un.groupBy("fmt", "event_type").agg(F.count("*").alias("n"))


# --- composed pipeline: curated AND decontaminated corpus -------------------
def _q156_oracle() -> str:
    from .llm import _shingles_sql_n

    q142 = CATALOG["q142_corpus_curation"].oracle
    return f"""
    WITH curated AS ({q142}),
    sh8 AS ({_shingles_sql_n(8)}),
    bg AS (SELECT DISTINCT unnest(shingles) AS shingle FROM sh8
           WHERE doc_id % 20 = 0),
    cg AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh8
           WHERE doc_id % 20 <> 0),
    hits AS (SELECT cg.doc_id, COUNT(DISTINCT cg.shingle) AS n_hit_ngrams
             FROM cg JOIN bg USING (shingle) GROUP BY cg.doc_id)
    SELECT c.doc_id, c.n_tokens, c.quality
    FROM curated c
    WHERE c.doc_id % 20 <> 0
      AND c.doc_id NOT IN (SELECT doc_id FROM hits WHERE n_hit_ngrams >= 1)
    """


@register(
    "q156_curated_decontaminated",
    oracle=_q156_oracle(),
    notes="FINAL-CORPUS composition (the last mile of every training "
    "pipeline, composing q142 + q89): exact-dedup survivors ∧ lang 'en' "
    "∧ quality >= 0.75 ∧ NOT sharing any 8-gram with the benchmark "
    "split — expressed as the curated frame anti-joined against the "
    "contaminated id set. Each stage is the already-verified scalable "
    "operator; the anti-join adds one id-keyed shuffle over the "
    "(tiny) contaminated set",
)
def q156_curated_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.decontaminate import decontaminate

    docs = read_table(spark, sf_dir, "documents")
    curated = CATALOG["q142_corpus_curation"].fn(spark, sf_dir).filter(
        F.col("doc_id") % 20 != 0
    )
    contaminated = (
        decontaminate(
            docs.filter(F.col("doc_id") % 20 != 0),
            docs.filter(F.col("doc_id") % 20 == 0),
            n=8,
        )
        .filter(F.col("contaminated"))
        .select("doc_id")
    )
    return curated.join(contaminated, "doc_id", "left_anti")


# --- per-group IQR outlier detection ----------------------------------------
@register(
    "q157_iqr_outliers",
    oracle="""
    WITH fences AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n_total,
           COUNT(CASE WHEN e.value > f.q3 + 1.5 * (f.q3 - f.q1)
                      THEN 1 END) AS n_outliers,
           ROUND(f.q3 + 1.5 * (f.q3 - f.q1), 6) AS upper_fence
    FROM events e JOIN fences f USING (event_type)
    GROUP BY e.event_type, f.q1, f.q3
    """,
    notes="per-group IQR outlier detection (Tukey fences, the join-back-"
    "aggregate idiom): exact interpolated quartiles per event_type "
    "(Spark percentile == DuckDB quantile_cont, as q21 pins), the tiny "
    "fence table broadcast back onto the stream, upper-fence flagging "
    "map-side. The fence expression q3 + 1.5*(q3 - q1) is written "
    "IDENTICALLY on both engines so the boundary comparison sees the "
    "same double; two shuffles total (quantile agg + final rollup)",
)
def q157_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    fences = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    joined = ev.join(F.broadcast(fences), "event_type")
    fence = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return joined.groupBy("event_type", "q1", "q3").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("value") > fence, 1)).alias("n_outliers"),
    ).select(
        "event_type",
        "n_total",
        "n_outliers",
        F.round(fence, 6).alias("upper_fence"),
    )
