"""Round-5 extension queries, part 1: the remaining TPC-H decision-support
shapes (Q7/Q8/Q9/Q11/Q15/Q16 adapted to the fixture schema — no partsupp,
so lineitem unit economics stand in for supply cost / stock value, and the
lineitem→supplier bridge stands in for partsupp's part↔supplier relation).

Reference parity: dbkit (SURVEY §1) declares OLAP read-side intent
(reference ``README.md:14``); its implemented surface (operation/
scan_view.rs:12-56, operation/project.rs:14-64) never reaches these
shapes — they are re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.aggregate import dec, stable_sum, stable_sum_sql
from ..sources import read_table


# --- TPC-H Q7: volume shipping between two nations --------------------------
@register(
    "q164_tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n2.n_name AS supp_nation,
           n1.n_name AS cust_nation,
           EXTRACT(year FROM l.l_shipdate) AS l_year,
           {stable_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n1   ON c.c_nationkey = n1.n_nationkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation n2   ON s.s_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    notes="TPC-H Q7 shape (volume shipping between two trading nations): "
    "the 6-table star with TWO independent nation lookups (customer side "
    "and supplier side) and a symmetric nation-pair predicate. Both "
    "nation dims and supplier broadcast (tiny), so the only shuffles are "
    "the lineitem⋈orders⋈customer fact joins; the shipdate range is "
    "pushed to the parquet scan. The nation-pair filter applies AFTER "
    "the pair is assembled (it spans both branches) but Catalyst pushes "
    "each nation's IN ('NATION_1','NATION_2') residual to the dim scans",
)
def q164_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("n2_key"))
        .filter(
            (
                (F.col("cust_nation") == "NATION_1")
                & (F.col("supp_nation") == "NATION_2")
            )
            | (
                (F.col("cust_nation") == "NATION_2")
                & (F.col("supp_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- TPC-H Q8: national market share ----------------------------------------
@register(
    "q165_tpch_q8_market_share",
    oracle="""
    WITH all_sales AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(25,4)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o    ON l.l_orderkey = o.o_orderkey
      JOIN customer c  ON o.o_custkey = c.c_custkey
      JOIN nation n1   ON c.c_nationkey = n1.n_nationkey
      JOIN region r    ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s  ON l.l_suppkey = s.s_suppkey
      JOIN nation n2   ON s.s_nationkey = n2.n_nationkey
      JOIN part p      ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'ASIA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM all_sales
    GROUP BY o_year
    ORDER BY o_year
    """,
    notes="TPC-H Q8 shape (national market share): 8-table star — the "
    "widest join in the suite — reduced to ONE fact-side pipeline: every "
    "dim (nation x2, region, supplier, part after its p_type filter) "
    "broadcasts, so the plan is lineitem⋈orders⋈customer shuffles plus "
    "map-side hash lookups, then a single year-grouped agg computing "
    "share = conditional-sum / total-sum in one pass (no second scan, "
    "no self-join). Both sums decimal-carried; the final division is one "
    "deterministic double op identical on both engines",
)
def q165_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select("n_nationkey", "n_regionkey")
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    sales = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == n1["n_nationkey"])
        .join(F.broadcast(r), n1["n_regionkey"] == r["r_regionkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("n2_key"))
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            dec(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4
            ).alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(25,4)")
    return (
        sales.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                    .otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- TPC-H Q9: product-type profit ------------------------------------------
@register(
    "q166_tpch_q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           EXTRACT(year FROM o.o_orderdate) AS o_year,
           {stable_sum_sql(
               "l.l_extendedprice * (1 - l.l_discount)"
               " - 0.6 * p.p_retailprice * l.l_quantity", 4)} AS sum_profit
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    notes="TPC-H Q9 shape (product-type profit; the fixture has no "
    "partsupp, so supply cost = 0.6 x p_retailprice stands in for "
    "ps_supplycost exactly as extended4's Q20 adaptation does): profit "
    "per supplier-nation per year over parts matching a name substring. "
    "part (filtered by LIKE before the join), supplier, and nation all "
    "broadcast; lineitem⋈orders is the one real shuffle. The profit "
    "expression is written token-identically on both engines so the "
    "double arithmetic inside the decimal rounding matches bit-for-bit",
)
def q166_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    o = read_table(spark, sf_dir, "orders")
    n = read_table(spark, sf_dir, "nation")
    joined = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    profit = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(stable_sum(F.col("profit"), 4).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# --- TPC-H Q11: important stock (scalar-subquery threshold) ------------------
@register(
    "q167_tpch_q11_important_stock",
    oracle="""
    WITH part_value AS (
      SELECT l.l_partkey AS p_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(25,4))) AS value_dec
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name IN ('NATION_1', 'NATION_2')
      GROUP BY l.l_partkey
    )
    SELECT p_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM part_value
    WHERE CAST(value_dec AS DOUBLE) >
          0.001 * (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM part_value)
    ORDER BY part_value DESC, p_partkey
    """,
    notes="TPC-H Q11 shape (important stock; lineitem revenue stands in "
    "for ps_supplycost x ps_availqty since the fixture has no partsupp): "
    "per-part value over two nations' suppliers, kept only when it "
    "exceeds a fraction of the TOTAL value — the scalar-subquery-"
    "threshold shape. Spark computes the per-part agg ONCE, derives the "
    "global scalar by re-aggregating that (tiny) result, and broadcasts "
    "the one-row total back via crossJoin — the fact table is scanned "
    "and shuffled exactly once; the threshold compare happens on the "
    "already-reduced per-part rows. Both sides carry the value in "
    "decimal until the final compare so fraction-of-total is one "
    "deterministic double multiply on each engine",
)
def q167_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    per_part = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(dec("l_extendedprice", 4)).alias("value_dec"))
    )
    total = per_part.agg(
        F.sum("value_dec").cast("double").alias("total_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec").cast("double") > F.lit(0.001) * F.col("total_value")
        )
        .select(
            "p_partkey", F.col("value_dec").cast("double").alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), F.col("p_partkey"))
    )


# --- TPC-H Q15: top supplier -------------------------------------------------
@register(
    "q168_tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4)))
               AS total_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_dec AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_dec = (SELECT MAX(total_dec) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    notes="TPC-H Q15 shape (top supplier via a max-of-aggregate view): "
    "quarterly revenue per supplier, keep the supplier(s) achieving the "
    "maximum. The revenue 'view' is computed once; the scalar max is "
    "derived from that reduced result and broadcast back (crossJoin of "
    "a 1-row frame), so lineitem is scanned once and the equality "
    "compare runs on DECIMAL — exact, so ties are real ties on both "
    "engines, never float noise. Supplier dim broadcasts onto the "
    "per-supplier rows",
)
def q168_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = read_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4)
        ).alias("total_dec")
    )
    mx = revenue.agg(F.max("total_dec").alias("max_dec"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_dec") == F.col("max_dec"))
        .join(F.broadcast(s), F.col("supplier_no") == s["s_suppkey"])
        .select(
            "s_suppkey", "s_name", F.col("total_dec").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


# --- TPC-H Q16: supplier relationship count ----------------------------------
@register(
    "q169_tpch_q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (2, 5, 11, 28, 29, 37, 42, 50)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    notes="TPC-H Q16 shape (parts/supplier relationship; the "
    "lineitem bridge stands in for partsupp): distinct suppliers per "
    "(brand, type, size) over filtered parts, EXCLUDING suppliers on a "
    "complaint list (negative acctbal stands in for the comment LIKE). "
    "The NOT IN subquery becomes a broadcast LEFT ANTI join (s_suppkey "
    "is never null, so NOT IN == anti-join is semantics-safe); all three "
    "part predicates push to the dim scan which then broadcasts; the "
    "COUNT(DISTINCT) is Spark's two-phase distinct-expand over the one "
    "fact shuffle",
)
def q169_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(2, 5, 11, 28, 29, 37, 42, 50))
    )
    li = read_table(spark, sf_dir, "lineitem")
    bad = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


# --- grouped least-squares regression ---------------------------------------
@register(
    "q170_grouped_regression",
    oracle="""
    SELECT event_type,
           regr_count(value, hr) AS n,
           ROUND(regr_slope(value, hr), 6) AS slope,
           ROUND(regr_intercept(value, hr), 6) AS intercept,
           ROUND(regr_r2(value, hr), 6) AS r2
    FROM (
      SELECT event_type, EXTRACT(hour FROM ts) AS hr, value
      FROM events WHERE value IS NOT NULL
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
    notes="per-group ordinary-least-squares regression (§2.4 stats "
    "surface extension): regr_slope / regr_intercept / regr_r2 / "
    "regr_count of value against hour-of-day per event type — the "
    "trend-per-segment analytics shape. Spark's regr_* are Tungsten "
    "codegen'd single-pass moment aggregates with map-side partials "
    "(never a per-group sort or UDF), identical definitionally to "
    "DuckDB's; results rounded 6dp because moment accumulation order "
    "differs across partitions (SURVEY §7.4 canonicalization, same "
    "discipline as q15's stddev/corr)",
)
def q170_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    from ..operators.aggregate import rounded

    src = ev.select(
        "event_type", F.hour("ts").alias("hr"), "value"
    )
    return (
        src.groupBy("event_type")
        .agg(
            F.regr_count("value", "hr").alias("n"),
            rounded(F.regr_slope("value", "hr")).alias("slope"),
            rounded(F.regr_intercept("value", "hr")).alias("intercept"),
            rounded(F.regr_r2("value", "hr")).alias("r2"),
        )
        .orderBy("event_type")
    )


# --- winsorized robust mean --------------------------------------------------
@register(
    "q171_winsorized_stats",
    oracle="""
    WITH fences AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(LEAST(GREATEST(e.value, f.p05), f.p95)
                         AS DECIMAL(25,6))) AS DOUBLE)
             / COUNT(*) AS winsorized_mean,
           COUNT(CASE WHEN e.value < f.p05 OR e.value > f.p95 THEN 1 END)
             AS n_clipped
    FROM events e JOIN fences f ON e.event_type = f.event_type
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    notes="winsorized (percentile-clipped) robust mean per group (§2.4 "
    "robust-stats family next to q116's MAD/IQR and q157's Tukey "
    "fences): exact interpolated p05/p95 per event type (Spark "
    "percentile == DuckDB quantile_cont, pinned by q21), the tiny "
    "fence table broadcast back onto the stream, clipping via "
    "LEAST/GREATEST map-side, then a decimal-stabilized mean so the "
    "clipped sum is order-independent. Two shuffles total (quantile "
    "agg + final agg) — the same join-back-aggregate idiom as q157, "
    "which at 100 TB beats any sort-based winsorization because the "
    "fences are O(groups) and the data never globally sorts",
)
def q171_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    fences = ev.groupBy(F.col("event_type").alias("f_type")).agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile("value", 0.95).alias("p95"),
    )
    clipped = ev.join(
        F.broadcast(fences), ev["event_type"] == F.col("f_type")
    ).withColumn("w", F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")))
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(dec("w", 6)).cast("double") / F.count("*")).alias(
                "winsorized_mean"
            ),
            F.count(
                F.when(
                    (F.col("value") < F.col("p05"))
                    | (F.col("value") > F.col("p95")),
                    1,
                )
            ).alias("n_clipped"),
        )
        .orderBy("event_type")
    )


# --- document chunking -------------------------------------------------------
@register(
    "q172_document_chunking",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    base AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0)
    SELECT b.doc_id,
           u.k AS chunk_id,
           len(b.t[u.k*24+1 : u.k*24+32]) AS n_tok,
           array_to_string(b.t[u.k*24+1 : u.k*24+32], ' ') AS chunk_text
    FROM base b,
         UNNEST(generate_series(0,
           CAST(ceil(greatest(b.n - 32, 0) / 24.0) AS BIGINT))) AS u(k)
    ORDER BY doc_id, chunk_id
    """,
    notes="document CHUNKING into overlapping token windows (llm/"
    "chunking.chunk_documents — the pre-tokenization step before "
    "packing, so no training sequence exceeds the context): window 32, "
    "stride 24, so consecutive chunks share 8 tokens and the last chunk "
    "alone may run short. Map-only tokenize→sequence→explode→slice — "
    "no shuffle anywhere, a pure scan-side transform that scales with "
    "input bytes; the oracle reproduces the chunk rule with "
    "generate_series + 1-based list slicing",
)
def q172_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.chunking import chunk_documents

    docs = read_table(spark, sf_dir, "documents")
    return chunk_documents(docs, window=32, stride=24).orderBy(
        "doc_id", "chunk_id"
    )


# --- TF-IDF characteristic terms ---------------------------------------------
@register(
    "q173_tfidf_topk_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                    t -> t <> '')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
    dfx AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok AS token, tf.tf, dfx.df,
             ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfx.df), 6) AS score
      FROM tf JOIN dfx ON tf.tok = dfx.tok CROSS JOIN n
    )
    SELECT doc_id, token, tf, df, score FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rk
      FROM scored
    ) WHERE rk <= 5
    ORDER BY doc_id, score DESC, token
    """,
    notes="TF-IDF top-5 characteristic terms per document (llm/"
    "retrieval.tfidf_topk_terms, the per-document twin of q109's "
    "corpus-level BM25): score = tf x ln(N/df), natural log so the "
    "oracle is exact. One (id, tok) explode feeds BOTH aggregations "
    "(per-doc tf and vocabulary-sized corpus df); df joins back by "
    "token, the 1-row corpus size broadcasts (intentional scalar "
    "crossJoin, q109's documented pattern), final per-doc top-5 is a "
    "window row_number — keyed shuffles only, nothing all-pairs, no "
    "global sort at any stage",
)
def q173_tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.retrieval import tfidf_topk_terms

    docs = read_table(spark, sf_dir, "documents")
    return tfidf_topk_terms(docs, "text", "doc_id", k=5).orderBy(
        "doc_id", F.col("score").desc(), "token"
    )


# --- domain quota sampling ---------------------------------------------------
@register(
    "q174_domain_quota_sample",
    oracle="""
    SELECT source, doc_id FROM (
      SELECT source, doc_id, ROW_NUMBER() OVER (
        PARTITION BY source
        ORDER BY md5(concat(CAST(doc_id AS VARCHAR), ':quota')) ASC,
                 doc_id ASC) AS rk
      FROM documents
    ) WHERE rk <= 10
    ORDER BY source, doc_id
    """,
    notes="per-domain QUOTA sampling (llm/sampling.quota_sample — the "
    "domain-cap step of corpus curation: at most N docs per source so "
    "no crawl host dominates the training mix): deterministic md5 hash "
    "rank per source with doc_id tiebreak, so the kept set is a "
    "uniform per-group sample reproducible across engines, reruns, and "
    "repartitioning — seeded sample() can't promise that (selection "
    "depends on partition layout). One window shuffle on source; at "
    "100 TB no global sort and no collect",
)
def q174_domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.sampling import quota_sample

    docs = read_table(spark, sf_dir, "documents").select("source", "doc_id")
    return quota_sample(docs, "source", "doc_id", quota=10).orderBy(
        "source", "doc_id"
    )


# --- bucketed table reconciliation -------------------------------------------
_RECON_FP_SQL = (
    "list_sum(list_transform(generate_series(1, 12), i -> "
    "CAST((strpos('0123456789abcdef', substr(h, i, 1)) - 1) AS BIGINT)"
    " * CAST(power(16, 12 - i) AS BIGINT)))"
)


@register(
    "q175_table_reconciliation",
    oracle=f"""
    WITH canon AS (
      SELECT event_id,
             md5(concat_ws('|',
               COALESCE(CAST(event_id AS VARCHAR), '␀'),
               COALESCE(CAST(user_id AS VARCHAR), '␀'),
               COALESCE(event_type, '␀'),
               COALESCE(CAST(COALESCE(CAST(ROUND(value * 1000000) AS BIGINT),
                                      -1) AS VARCHAR), '␀'))) AS h
      FROM events
    ),
    fp AS (
      SELECT event_id, {_RECON_FP_SQL} AS f FROM canon
    ),
    left_sum AS (
      SELECT event_id % 256 AS bucket, COUNT(*) AS cnt,
             SUM(CAST(f AS DECIMAL(38,0))) AS checksum
      FROM fp GROUP BY bucket
    ),
    rcanon AS (
      SELECT event_id,
             md5(concat_ws('|',
               COALESCE(CAST(event_id AS VARCHAR), '␀'),
               COALESCE(CAST(user_id AS VARCHAR), '␀'),
               COALESCE(event_type, '␀'),
               COALESCE(CAST(COALESCE(CAST(ROUND(
                 (CASE WHEN event_id % 997 = 0 THEN value + 1.0 ELSE value END)
                 * 1000000) AS BIGINT), -1) AS VARCHAR), '␀'))) AS h
      FROM events WHERE event_id % 1009 <> 0
    ),
    rfp AS (
      SELECT event_id, {_RECON_FP_SQL} AS f FROM rcanon
    ),
    right_sum AS (
      SELECT event_id % 256 AS bucket, COUNT(*) AS cnt,
             SUM(CAST(f AS DECIMAL(38,0))) AS checksum
      FROM rfp GROUP BY bucket
    )
    SELECT COALESCE(l.bucket, r.bucket) AS bucket,
           COALESCE(l.cnt, 0) AS left_cnt,
           COALESCE(r.cnt, 0) AS right_cnt,
           COALESCE(l.cnt, 0) = COALESCE(r.cnt, 0) AS counts_match,
           COALESCE(l.checksum, CAST(0 AS DECIMAL(38,0)))
             = COALESCE(r.checksum, CAST(0 AS DECIMAL(38,0))) AS sums_match
    FROM left_sum l FULL OUTER JOIN right_sum r ON l.bucket = r.bucket
    WHERE COALESCE(l.cnt, 0) <> COALESCE(r.cnt, 0)
       OR COALESCE(l.checksum, CAST(0 AS DECIMAL(38,0)))
          <> COALESCE(r.checksum, CAST(0 AS DECIMAL(38,0)))
    ORDER BY bucket
    """,
    notes="bucketed TABLE RECONCILIATION (operators/reconcile — the "
    "anti-entropy/Merkle-bucket primitive for validating a backfill, "
    "CDC re-sync, or engine migration WITHOUT a row-level join): each "
    "row md5-fingerprints to a 48-bit integer, rows hash into 256 "
    "buckets by key, each side reduces to (count, DECIMAL(38,0) sum of "
    "fingerprints) — decimal because 2^48 x 10^12 rows overflows "
    "BIGINT and Spark wraps where other engines widen — and the two "
    "metadata-sized summaries full-outer join to emit only damaged "
    "buckets. The 'replica' here is events with a deterministic fault "
    "injection (value perturbed on event_id%997=0, rows dropped on "
    "event_id%1009=0) so exactly those buckets surface. At 100 TB: one "
    "scan + map-side-combined agg per side, commutative order-"
    "independent checksums, join cost O(buckets)",
)
def q175_table_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.reconcile import (
        bucket_summary,
        reconcile_buckets,
        row_fingerprint,
    )

    ev = read_table(spark, sf_dir, "events")

    def canon_value(value_col):
        return F.coalesce(
            F.round(value_col * 1000000, 0).cast("long"), F.lit(-1)
        )

    left_fp = row_fingerprint(
        [
            F.col("event_id"),
            F.col("user_id"),
            F.col("event_type"),
            canon_value(F.col("value")),
        ]
    )
    left = bucket_summary(ev, F.col("event_id"), left_fp, 256)

    replica = ev.filter(F.col("event_id") % 1009 != 0).withColumn(
        "value",
        F.when(F.col("event_id") % 997 == 0, F.col("value") + 1.0).otherwise(
            F.col("value")
        ),
    )
    right_fp = row_fingerprint(
        [
            F.col("event_id"),
            F.col("user_id"),
            F.col("event_type"),
            canon_value(F.col("value")),
        ]
    )
    right = bucket_summary(replica, F.col("event_id"), right_fp, 256)
    return reconcile_buckets(left, right).orderBy("bucket")


# --- mergeable HLL sketch rollup ---------------------------------------------
@register(
    "q176_hll_sketch_rollup",
    oracle=None,
    notes="rows-only (Datasketches HLL binary sketches have no DuckDB "
    "twin): MERGEABLE distinct-count rollup — hll_sketch_agg(user_id) "
    "per (event_type, day) produces one binary sketch per cell, then "
    "hll_union_agg merges day sketches into per-event-type totals "
    "WITHOUT rescanning the data — the 100 TB pattern for serving "
    "distinct counts at multiple granularities from one pass (daily "
    "sketches persist; any rollup is a metadata-sized union). Accuracy "
    "pinned by tests/test_llm.py::test_hll_rollup_error_bound: the "
    "merged estimate is within 5% of exact count_distinct at lgk=12 "
    "(expected relative error ~1.6%); exactness itself is q16/q20's "
    "territory",
)
def q176_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count("*").alias("n_days"),
        )
        .orderBy("event_type")
    )


# --- PageRank (fixed-iteration numeric recursion) ----------------------------
def _pagerank_oracle(n_iter: int = 10) -> str:
    """Unrolled-CTE PageRank oracle: one CTE per iteration, every
    floating-point op written token-identically to the Spark side so
    ranks match bit-for-bit (contributions decimal-summed; see q177
    notes)."""
    head = """
    WITH edges AS (
      SELECT DISTINCT user_id AS src, (user_id * 7 + 3) % 150 AS dst
      FROM events
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
      )
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (
      SELECT node, CAST(1.0 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS rank
      FROM nodes CROSS JOIN nn
    )"""
    steps = []
    for i in range(1, n_iter + 1):
        steps.append(f""",
    r{i} AS (
      SELECT nd.node,
             CAST(0.15 AS DOUBLE) / CAST(nn.n AS DOUBLE)
               + CAST(0.85 AS DOUBLE)
                 * CAST(COALESCE(s.csum, CAST(0 AS DECIMAL(25,18)))
                        AS DOUBLE) AS rank
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node,
               SUM(CAST(r.rank / d.deg AS DECIMAL(25,18))) AS csum
        FROM r{i - 1} r
        JOIN edges e ON r.node = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
      ) s ON s.node = nd.node
    )""")
    return (
        head
        + "".join(steps)
        + f"""
    SELECT node, ROUND(rank, 12) AS rank FROM r{n_iter} ORDER BY node
    """
    )


@register(
    "q177_pagerank",
    oracle=_pagerank_oracle(10),
    notes="PAGERANK, 10 fixed iterations (operators/iterate.iterate_fixed "
    "— the numeric-recursion sibling of q158's fixpoint closure; bounded "
    "iteration count IS the spec for power-iteration algorithms, and "
    "the per-round checkpoint barrier keeps the plan tree linear where "
    "naive loop composition grows it geometrically): damping 0.85 over "
    "the deterministic functional graph from events. Cross-engine "
    "bit-parity engineering: per-edge contributions rank/out_deg are "
    "rounded to DECIMAL(25,18) BEFORE the per-node sum, so the one "
    "order-sensitive reduction becomes exact decimal addition; every "
    "other op (divisions, 0.85 multiply, base add) is a deterministic "
    "double op written token-identically in the unrolled-CTE oracle. "
    "Per round: one ranks⋈edges shuffle + one dst-keyed agg + a "
    "broadcast left join back onto the node set — O(edges) per round, "
    "the exact cost profile of a production 100 TB PageRank; the "
    "node-count scalar is computed once, never per round",
)
def q177_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.iterate import iterate_fixed

    ev = read_table(spark, sf_dir, "events")
    edges = (
        ev.select(
            F.col("user_id").alias("src"),
            ((F.col("user_id") * 7 + 3) % 150).alias("dst"),
        )
        .distinct()
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    edges_deg = edges.join(deg, "src").persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    base = F.lit(0.15).cast("double") / F.lit(n).cast("double")
    init = nodes.withColumn(
        "rank", F.lit(1.0).cast("double") / F.lit(n).cast("double")
    )

    def step(ranks: DataFrame) -> DataFrame:
        contribs = (
            ranks.join(edges_deg, ranks["node"] == edges_deg["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).cast("decimal(25,18)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        zero = F.lit(0).cast("decimal(25,18)")
        return nodes.join(contribs, "node", "left").select(
            "node",
            (
                base
                + F.lit(0.85).cast("double")
                * F.coalesce("csum", zero).cast("double")
            ).alias("rank"),
        )

    out = iterate_fixed(init, step, 10)
    for df in (edges, edges_deg, nodes):
        df.unpersist()
    return out.select("node", F.round("rank", 12).alias("rank")).orderBy("node")


# --- native SQL recursive CTE ------------------------------------------------
@register(
    "q178_sql_recursive_cte",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT user_id AS src, (user_id * 7 + 3) % 150 AS dst
      FROM events
    ),
    reach(start, node, depth) AS (
      SELECT src AS start, dst AS node, 1 AS depth FROM edges WHERE src < 5
      UNION ALL
      SELECT r.start, e.dst AS node, r.depth + 1
      FROM reach r JOIN edges e ON r.node = e.src
      WHERE r.depth < 20
    )
    SELECT DISTINCT start, node FROM reach
    ORDER BY start, node
    """,
    notes="NATIVE SQL recursion (Spark 4 WITH RECURSIVE — the "
    "declarative twin of q158's iterate_until_fixpoint loop, closing "
    "the reference's relational-calculus intent, README.md:14, at the "
    "SQL surface): depth-bounded reachability from seed nodes over the "
    "cyclic functional graph, UNION ALL + depth guard + outer DISTINCT "
    "(the out-degree-1 graph keeps path count linear, and depth 20 "
    "strictly covers the <=10-hop closure, so the bounded recursion "
    "EQUALS the fixpoint (asserted against the iterate_until_fixpoint closure on the same graph in tests/test_operators.py). The SQL text is executed verbatim by "
    "BOTH engines: Catalyst plans each recursive step as the same "
    "frontier⋈edges equi-join the operator loop builds by hand",
)
def q178_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("q178_events")
    return spark.sql("""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT user_id AS src, (user_id * 7 + 3) % 150 AS dst
      FROM q178_events
    ),
    reach(start, node, depth) AS (
      SELECT src AS start, dst AS node, 1 AS depth FROM edges WHERE src < 5
      UNION ALL
      SELECT r.start, e.dst AS node, r.depth + 1
      FROM reach r JOIN edges e ON r.node = e.src
      WHERE r.depth < 20
    )
    SELECT DISTINCT start, node FROM reach
    ORDER BY start, node
    """)


# --- VARIANT semi-structured extraction --------------------------------------
@register(
    "q179_variant_extraction",
    oracle="""
    WITH payload AS (
      SELECT event_id,
             concat('{"user":{"id":', CAST(user_id AS VARCHAR),
                    ',"type":"', event_type,
                    '"},"k":', CAST(props->>'k' AS VARCHAR),
                    ',"vals":[', CAST(event_id % 7 AS VARCHAR),
                    ',', CAST(event_id % 11 AS VARCHAR), ']}') AS doc
      FROM events
    )
    SELECT CAST(doc->'user'->>'type' AS VARCHAR) AS etype,
           COUNT(*) AS n,
           CAST(SUM(CAST(doc->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(doc->'vals'->>1 AS BIGINT)) AS BIGINT) AS sum_val1
    FROM payload
    WHERE CAST(doc->'user'->>'id' AS BIGINT) % 2 = 0
    GROUP BY etype
    ORDER BY etype
    """,
    notes="VARIANT semi-structured extraction (Spark 4's binary "
    "semi-structured type — parse ONCE into a shredded variant, then "
    "N typed variant_get path extractions, vs q30's "
    "get_json_object which re-parses the string per call): a nested "
    "payload (object-in-object + array) is built deterministically "
    "from events columns, parsed to VARIANT, and filtered/aggregated "
    "through typed path extraction including an array index "
    "($.vals[1]). The DuckDB oracle runs the same paths with JSON "
    "operators on the identical document string — engine-independent "
    "semantics for the training-metadata blobs every corpus pipeline "
    "carries. Map-only until the one grouped agg; at 100 TB the "
    "variant parse is the scan-side cost and each extra path is ~free, "
    "which is exactly why the parse-once type exists",
)
def q179_variant_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"user":{"id":'),
        F.col("user_id").cast("string"),
        F.lit(',"type":"'),
        F.col("event_type"),
        F.lit('"},"k":'),
        F.get_json_object("props", "$.k"),
        F.lit(',"vals":['),
        (F.col("event_id") % 7).cast("string"),
        F.lit(","),
        (F.col("event_id") % 11).cast("string"),
        F.lit("]}"),
    )
    v = ev.select(F.parse_json(doc).alias("v"))
    return (
        v.filter(
            F.variant_get("v", "$.user.id", "bigint") % 2 == 0
        )
        .groupBy(F.variant_get("v", "$.user.type", "string").alias("etype"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.variant_get("v", "$.k", "bigint")).alias("sum_k"),
            F.sum(F.variant_get("v", "$.vals[1]", "bigint")).alias("sum_val1"),
        )
        .orderBy("etype")
    )


# --- bitwise surface ---------------------------------------------------------
@register(
    "q180_bitwise_surface",
    oracle="""
    SELECT event_type,
           bit_and(user_id) AS and_ids,
           bit_or(user_id) AS or_ids,
           bit_xor(user_id) AS xor_ids,
           CAST(bit_count(CAST(bit_or(user_id) AS BIGINT)) AS BIGINT)
             AS popcount_or,
           CAST(SUM(CAST(xor(user_id << 2, event_id >> 3) & 1023
                         AS BIGINT)) AS BIGINT) AS mixed_sum
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    notes="bitwise surface (§2.8 + §2.4: scalar shifts/xor/and/popcount "
    "AND the bit_and/bit_or/bit_xor aggregates — the flag-mask rollup "
    "idiom for permission/feature-bit columns): all JVM codegen'd "
    "integer ops with map-side-combinable aggregates (bitwise aggs are "
    "commutative+associative, so partial aggregation applies exactly "
    "like sum). Spark ^ == DuckDB xor(); both popcounts cast to BIGINT "
    "(Spark bit_count returns INT, DuckDB BIGINT)",
)
def q180_bitwise_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    mixed = F.shiftleft(F.col("user_id"), 2).bitwiseXOR(
        F.shiftright(F.col("event_id"), 3)
    ).bitwiseAND(F.lit(1023).cast("long"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.bit_and("user_id").alias("and_ids"),
            F.bit_or("user_id").alias("or_ids"),
            F.bit_xor("user_id").alias("xor_ids"),
            F.bit_count(F.bit_or("user_id")).cast("long").alias("popcount_or"),
            F.sum(mixed.cast("long")).cast("long").alias("mixed_sum"),
        )
        .orderBy("event_type")
    )


# --- dynamic-gap session windows ---------------------------------------------
@register(
    "q181_dynamic_session_gap",
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             CASE event_type WHEN 'click' THEN 300000000
                             WHEN 'view' THEN 600000000
                             ELSE 900000000 END AS gap_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts_us, gap_us,
             CASE WHEN ts_us >= MAX(ts_us + gap_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(ts_us + gap_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
    ),
    sessions AS (
      SELECT user_id, ts_us, gap_us,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us + gap_us) AS session_end_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    ORDER BY user_id, session_start_us
    """,
    notes="DYNAMIC-GAP session windows (§2.9: session_window with a "
    "per-event gap expression — engagement-dependent timeouts, e.g. "
    "clicks close fast, passive views linger; the generalization of "
    "q36/q95/q115's fixed-gap sessions): Spark merges each event's "
    "[ts, ts+gap) half-open window per user. The oracle derives the "
    "IDENTICAL partition from first principles: an event opens a new "
    "session iff its start >= the running max of all previous events' "
    "window ends (a cumulative-max window, not just lag — an early "
    "long-gap event can bridge past several short-gap ones), then a "
    "cumulative boundary sum labels sessions. Everything in integer "
    "microseconds, so the comparison is exact. One user-keyed shuffle "
    "on each engine; Spark's session merge is the same state machine "
    "a streaming run uses, so batch==stream semantics carry over",
)
def q181_dynamic_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type") == "click", F.lit("300 seconds"))
        .when(F.col("event_type") == "view", F.lit("600 seconds"))
        .otherwise(F.lit("900 seconds"))
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
        .orderBy("user_id", "session_start_us")
    )


# --- URL parsing surface -----------------------------------------------------
@register(
    "q182_url_parsing",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             concat('https://', source, '.example.com/docs/',
                    CAST(doc_id AS VARCHAR), '?lang=', lang,
                    '&n=', CAST(n_chars AS VARCHAR), '#sec',
                    CAST(doc_id % 3 AS VARCHAR)) AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '^[a-z]+://[^/?#]+[^?#]*\\?([^#]*)', 1)
             AS query,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
           regexp_extract(url, '#(.*)$', 1) AS fragment
    FROM urls
    ORDER BY doc_id
    """,
    notes="URL parsing surface (§2.8; the domain-extraction step of "
    "crawl curation — source filtering, per-host caps, robots "
    "bookkeeping all start at HOST): Spark's native parse_url "
    "(HOST/PATH/QUERY/REF and keyed QUERY extraction, one java.net.URI "
    "parse reused across parts) validated against ground truth — the "
    "oracle re-derives every component with regexes over the SAME "
    "deterministically-constructed URL string, so a parse_url quirk "
    "(encoding, fragment handling) would break the hash. Map-only "
    "projection, no shuffle",
)
def q182_url_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
        F.lit("#sec"),
        (F.col("doc_id") % 3).cast("string"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return (
        u.select(
            "doc_id",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY")).alias("query"),
            F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
            F.parse_url("url", F.lit("REF")).alias("fragment"),
        )
        .orderBy("doc_id")
    )


# --- time-weighted average ---------------------------------------------------
@register(
    "q183_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id, value, epoch_us(ts) AS ts_us,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_us
      FROM events WHERE value IS NOT NULL
    ),
    seg AS (
      SELECT user_id, value, (next_us - ts_us) AS dur_us
      FROM seq WHERE next_us IS NOT NULL
    )
    SELECT user_id,
           ROUND(CAST(SUM(CAST(value * dur_us AS DECIMAL(30,6))) AS DOUBLE)
                 / CAST(SUM(dur_us) AS DOUBLE), 6) AS twap,
           CAST(SUM(dur_us) AS BIGINT) AS span_us,
           COUNT(*) AS n_segments
    FROM seg
    GROUP BY user_id
    ORDER BY user_id
    """,
    notes="TIME-WEIGHTED average (§2.12 time-series: TWAP — the correct "
    "mean for irregularly sampled state, where each observation holds "
    "until the next one; an unweighted mean over-counts bursts): each "
    "event's weight is its holding duration (lead(ts) - ts per user, "
    "integer microseconds), the value x duration products are "
    "decimal-carried so the weighted sum is order-independent, and the "
    "final ratio is rounded 6dp (the q15 stats discipline: the summed "
    "unscaled decimal exceeds 2^53, and DuckDB's decimal->double goes "
    "through two roundings where Spark's BigDecimal rounds once). The last event per "
    "user has no duration and is excluded on both engines. One "
    "user-keyed window shuffle reused by the grouped agg — the "
    "sort-once-aggregate-once shape that scales",
)
def q183_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("ts_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    )
    seg = seq.filter(F.col("next_us").isNotNull()).withColumn(
        "dur_us", F.col("next_us") - F.col("ts_us")
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.round(
                F.sum(
                    (F.col("value") * F.col("dur_us")).cast("decimal(30,6)")
                ).cast("double")
                / F.sum("dur_us").cast("double"),
                6,
            ).alias("twap"),
            F.sum("dur_us").cast("long").alias("span_us"),
            F.count("*").alias("n_segments"),
        )
        .orderBy("user_id")
    )


# --- quantile binning (feature discretization) -------------------------------
@register(
    "q184_quantile_binning",
    oracle="""
    WITH binned AS (
      SELECT event_type, value,
             ntile(8) OVER (ORDER BY value, event_id) AS bin
      FROM events WHERE value IS NOT NULL
    )
    SELECT bin,
           COUNT(*) AS n,
           CAST(MIN(value) AS DOUBLE) AS lo,
           CAST(MAX(value) AS DOUBLE) AS hi,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
    notes="QUANTILE BINNING / equi-depth feature discretization (§2.4, "
    "the ML-preprocessing twin of q111's equi-width histogram and the "
    "exact small-N form of QuantileDiscretizer): ntile(8) over "
    "(value, event_id) — the unique tiebreak makes the bin assignment "
    "total-order deterministic, so bin populations match across engines "
    "exactly, not just approximately. This query is the opt-in "
    "EXACT-NTILE BASELINE (operators/histogram.quantile_bin "
    "exact=True — a single-partition sort, fixture-scale only); the "
    "operator DEFAULT is the 100 TB path: approxQuantile boundaries "
    "broadcast as literals + map-side comparison assignment, no "
    "single-partition window (plan-gated + sampled-vs-exact agreement "
    "pinned in tests/test_histogram.py) — same trade Spark's own "
    "QuantileDiscretizer makes",
)
def q184_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.histogram import quantile_bin

    ev = read_table(spark, sf_dir, "events")
    binned = quantile_bin(
        ev, "value", 8, exact=True, tiebreak_col="event_id"
    ).select("event_type", "value", "bin")
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.min("value").cast("double").alias("lo"),
            F.max("value").cast("double").alias("hi"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        )
        .orderBy("bin")
    )


# --- binary encodings / digests ----------------------------------------------
@register(
    "q185_binary_encodings",
    oracle="""
    SELECT doc_id,
           to_base64(encode(source)) AS b64,
           decode(from_base64(to_base64(encode(source))))
             AS b64_roundtrip,
           lower(hex(encode(source))) AS hexed,
           md5(source) AS md5_hex,
           sha256(source) AS sha256_hex,
           octet_length(encode(source)) AS n_bytes
    FROM documents
    ORDER BY doc_id
    """,
    notes="binary encodings & digests (§2.8: the content-addressing "
    "surface every artifact store / cache key / shard router uses): "
    "base64 encode + round-trip back through decode, hex, md5, sha-256, "
    "byte length — all JVM codegen'd, map-only, validated to the RFC by "
    "the DuckDB twins (Spark base64 vs to_base64, hex lowercased to "
    "match, unbase64 round-trip proving decode inverts encode "
    "byte-exactly). Digest parity here also underwrites every md5-based "
    "hash construction in the dedup/LSH family — if these rows hash "
    "equal, the engines' md5s agree byte-for-byte",
)
def q185_binary_encodings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    src_bin = F.encode("source", "UTF-8")
    return (
        docs.select(
            "doc_id",
            F.base64(src_bin).alias("b64"),
            F.decode(F.unbase64(F.base64(src_bin)), "UTF-8").alias(
                "b64_roundtrip"
            ),
            F.lower(F.hex(src_bin)).alias("hexed"),
            F.md5(src_bin).alias("md5_hex"),
            F.sha2(src_bin, 256).alias("sha256_hex"),
            F.length(src_bin).cast("long").alias("n_bytes"),
        )
        .orderBy("doc_id")
    )


# --- directed containment dedup ----------------------------------------------
@register(
    "q186_containment_pairs",
    oracle="""
    WITH toksq AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t)-2),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
      FROM toksq WHERE len(t) >= 3
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    capped AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle,
               COUNT(*) OVER (PARTITION BY shingle) AS df
        FROM inv
      ) WHERE df <= 50
    ),
    ov AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ov
      FROM capped a JOIN capped b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    ),
    sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
    both_dirs AS (
      SELECT o.doc_a AS contained, o.doc_b AS container,
             CAST(o.ov AS DOUBLE) / sa.n AS containment
      FROM ov o JOIN sz sa ON sa.doc_id = o.doc_a
      UNION ALL
      SELECT o.doc_b AS contained, o.doc_a AS container,
             CAST(o.ov AS DOUBLE) / sb.n AS containment
      FROM ov o JOIN sz sb ON sb.doc_id = o.doc_b
    )
    SELECT contained, container, ROUND(containment, 6) AS containment
    FROM both_dirs WHERE containment >= 0.6
    ORDER BY contained, container
    """,
    notes="DIRECTED containment dedup (llm/dedup.containment_pairs — "
    "the doc-in-doc detector symmetric Jaccard structurally misses: a "
    "short doc fully quoted inside a long one has tiny Jaccard because "
    "the union is container-dominated, but containment |A∩B|/|A| is "
    "~1.0 regardless of size ratio — the boilerplate/quotation leak in "
    "training corpora). One inverted-index self-join with a df<=50 "
    "stop-shingle cap (bounds per-shingle pair fanout to df², the q112 "
    "one-exchange COUNT window); overlap is conservative under the cap "
    "while the denominator stays the full shingle-set size; both "
    "directions of each undirected overlap evaluated independently",
)
def q186_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import containment_pairs

    docs = read_table(spark, sf_dir, "documents")
    out = containment_pairs(docs, threshold=0.6, max_df=50)
    return out.select(
        "contained", "container", F.round("containment", 6).alias("containment")
    ).orderBy("contained", "container")


# --- chained stateful streaming: join then windowed agg ----------------------
@register(
    "q187_stream_join_then_window",
    oracle="""
    WITH c AS (SELECT * FROM events WHERE event_type='click'),
         v AS (SELECT * FROM events WHERE event_type='view'),
         wm AS (SELECT make_timestamp(
                  least((SELECT CAST(floor(epoch_ms(max(ts))) AS BIGINT) FROM c),
                        (SELECT CAST(floor(epoch_ms(max(ts))) AS BIGINT) FROM v)) * 1000
                  - 600000000) AS w),
         matches AS (
           SELECT c.ts AS c_ts
           FROM c JOIN v ON c.user_id = v.user_id
            AND v.ts BETWEEN c.ts - INTERVAL 5 MINUTE AND c.ts
         ),
         agg AS (
           SELECT make_timestamp(
                    CAST(floor(epoch(c_ts) / 3600) AS BIGINT) * 3600000000)
                    AS window_start,
                  COUNT(*) AS n_matches
           FROM matches GROUP BY window_start
         )
    SELECT window_start, n_matches
    FROM agg, wm
    WHERE window_start + INTERVAL 1 HOUR <= wm.w
    ORDER BY window_start
    """,
    notes="CHAINED STATEFUL streaming (the Spark-4 multiple-stateful-"
    "operator capability, §2.9: stream-stream interval join FEEDING a "
    "downstream tumbling window aggregate in ONE streaming query, "
    "append mode — historically this required two jobs with an "
    "intermediate sink): q66's click⋈view 5-minute-lookback join flows "
    "into an hourly match-count window; the join's event-time column "
    "carries its watermark through, and the window agg emits exactly "
    "the windows whose end the min-of-sides watermark has passed. The "
    "oracle replays both state machines: the interval join (matches "
    "emit eagerly) and the append-mode emission rule window_end <= "
    "final watermark (= min(max c_ts, max v_ts) - 10 min delay)",
)
def q187_stream_join_then_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.runner import read_events_stream, run_available_now

    df = read_events_stream(spark, sf_dir)
    clicks = df.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    views = df.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_id"),
    )
    cond = (
        (F.col("c_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("c_ts") - F.expr("interval 5 minutes"))
        & (F.col("v_ts") <= F.col("c_ts"))
    )
    joined = (
        clicks.withWatermark("c_ts", "10 minutes")
        .join(views.withWatermark("v_ts", "10 minutes"), cond)
        .select("c_ts")
    )
    agg = (
        joined.groupBy(F.window("c_ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_matches"))
        .select(F.col("w.start").alias("window_start"), "n_matches")
    )
    return run_available_now(agg, output_mode="append").orderBy("window_start")


# --- array set operations ----------------------------------------------------
@register(
    "q188_array_set_ops",
    oracle="""
    WITH a AS (
      SELECT event_id,
             list_transform(generate_series(0, CAST(event_id % 4 AS BIGINT) + 2),
                            i -> (event_id + i * 3) % 10) AS xs,
             list_transform(generate_series(0, CAST(event_id % 3 AS BIGINT) + 2),
                            i -> (event_id + i * 2) % 10) AS ys
      FROM events
    )
    SELECT event_id,
           array_to_string(list_sort(list_distinct(list_concat(xs, ys))), ',')
             AS union_csv,
           array_to_string(list_sort(list_intersect(xs, ys)), ',')
             AS intersect_csv,
           array_to_string(list_sort(list_filter(list_distinct(xs),
                                                 x -> NOT list_contains(ys, x))), ',')
             AS except_csv,
           len(list_distinct(list_concat(xs, ys))) AS n_union
    FROM a
    ORDER BY event_id
    """,
    notes="array SET operations (§2.8 surface III: array_union / "
    "array_intersect / array_except — per-row set algebra, the tag/"
    "label-column idiom): derived integer arrays so contents are "
    "deterministic; outputs canonicalized via sort_array + joined "
    "strings (the q57/q114 lesson — the driver's pandas hash cannot "
    "sort list-valued cells, and Spark's array_* preserve first-seen "
    "order while DuckDB's sort, so ONLY the sorted-string projection "
    "is engine-portable). Map-only, the single exchange is the "
    "presentation orderBy",
)
def q188_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    xs = F.transform(
        F.sequence(F.lit(0), (F.col("event_id") % 4 + 2)),
        lambda i: (F.col("event_id") + i * 3) % 10,
    )
    ys = F.transform(
        F.sequence(F.lit(0), (F.col("event_id") % 3 + 2)),
        lambda i: (F.col("event_id") + i * 2) % 10,
    )
    a = ev.select("event_id", xs.alias("xs"), ys.alias("ys"))
    return (
        a.select(
            "event_id",
            F.array_join(
                F.sort_array(F.array_union("xs", "ys")).cast("array<string>"), ","
            ).alias("union_csv"),
            F.array_join(
                F.sort_array(F.array_intersect("xs", "ys")).cast("array<string>"),
                ",",
            ).alias("intersect_csv"),
            F.array_join(
                F.sort_array(F.array_except("xs", "ys")).cast("array<string>"), ","
            ).alias("except_csv"),
            F.size(F.array_union("xs", "ys")).cast("long").alias("n_union"),
        )
        .orderBy("event_id")
    )


# --- last-touch attribution --------------------------------------------------
@register(
    "q189_last_touch_attribution",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_id,
             last_value(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_ts
      FROM events
    )
    SELECT user_id, event_id AS purchase_id,
           CASE WHEN last_click_ts IS NOT NULL
                 AND ts - last_click_ts <= INTERVAL 1 HOUR
                THEN last_click_id END AS attributed_click,
           last_click_ts IS NOT NULL
             AND ts - last_click_ts <= INTERVAL 1 HOUR AS attributed
    FROM ordered
    WHERE event_type = 'purchase'
    ORDER BY user_id, purchase_id
    """,
    notes="LAST-TOUCH ATTRIBUTION (the conversion-credit idiom: each "
    "purchase credits the most recent click by the same user within a "
    "1-hour lookback): last_value(... IGNORE NULLS) over a "
    "1-PRECEDING-bounded frame carries the latest click forward "
    "without a self-join — the window-carry formulation is one "
    "user-keyed shuffle where the naive as-of self-join is two inputs "
    "shuffled plus join state (the same rewrite argument as q12's "
    "as-of union+window). The attribution window (<= 1 h) applies "
    "map-side after the carry; unattributed purchases surface with "
    "NULL credit rather than vanishing",
)
def q189_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    carried = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
        F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts"),
    )
    in_window = F.col("last_click_ts").isNotNull() & (
        F.col("ts") - F.col("last_click_ts") <= F.expr("INTERVAL 1 HOUR")
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.when(in_window, F.col("last_click_id")).alias("attributed_click"),
            in_window.alias("attributed"),
        )
        .orderBy("user_id", "purchase_id")
    )


# --- point-in-time feature-store join ----------------------------------------
@register(
    "q190_feature_store_join",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, ts, MAX(value) AS feat_click
      FROM events WHERE event_type = 'click' AND value IS NOT NULL
      GROUP BY user_id, ts
    ),
    v AS (
      SELECT user_id, ts, MAX(event_id) AS last_view
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    )
    SELECT p.user_id AS user_id, p.event_id AS purchase_id,
           ROUND(c.feat_click, 6) AS feat_click,
           v.last_view
    FROM p
    ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.user_id, purchase_id
    """,
    notes="POINT-IN-TIME feature-store join (the training-data "
    "correctness primitive: every label row joins each feature table "
    "AS OF the label timestamp — any later feature value is leakage): "
    "purchases are the entity spine, two independent feature tables "
    "(latest click value, latest view id) attach via CHAINED as-of "
    "joins — operators/joins.asof_join twice, each one union+window "
    "carry = one key shuffle, so N feature tables cost N keyed "
    "shuffles and never a range explosion. Feature snapshots are "
    "deduped to one row per (user, ts) first (max payload) so "
    "equal-time ties are defined identically on both engines; the "
    "oracle is DuckDB's NATIVE ASOF LEFT JOIN — an independent "
    "implementation of the same semantics, the strongest cross-check "
    "the as-of family has",
)
def q190_feature_store_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import asof_join

    ev = read_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    c = (
        ev.filter((F.col("event_type") == "click") & F.col("value").isNotNull())
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("feat_click"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("last_view"))
    )
    step1 = asof_join(p, c, on_key="user_id", on_time="ts")
    step2 = asof_join(
        step1.select("user_id", "ts", "purchase_id", "feat_click"),
        v,
        on_key="user_id",
        on_time="ts",
    )
    return (
        step2.select(
            "user_id",
            "purchase_id",
            F.round("feat_click", 6).alias("feat_click"),
            "last_view",
        )
        .orderBy("user_id", "purchase_id")
    )


# --- distribution entropy / concentration ------------------------------------
@register(
    "q191_mix_entropy",
    oracle="""
    WITH counts AS (
      SELECT source, lang, COUNT(*) AS n
      FROM documents GROUP BY source, lang
    ),
    tot AS (
      SELECT source, SUM(n) AS tot FROM counts GROUP BY source
    )
    SELECT c.source,
           CAST(t.tot AS BIGINT) AS n_docs,
           COUNT(*) AS n_langs,
           ROUND(SUM(-(CAST(c.n AS DOUBLE) / t.tot)
                     * ln(CAST(c.n AS DOUBLE) / t.tot)), 6) AS entropy,
           ROUND(SUM((CAST(c.n AS DOUBLE) / t.tot)
                     * (CAST(c.n AS DOUBLE) / t.tot)), 6) AS hhi
    FROM counts c JOIN tot t ON c.source = t.source
    GROUP BY c.source, t.tot
    ORDER BY c.source
    """,
    notes="corpus MIX health metrics (the §2.11 curation dashboard: "
    "per-source Shannon entropy and Herfindahl concentration of the "
    "language distribution — a source with entropy ~0 / HHI ~1 is "
    "monolingual, and sudden shifts flag crawl drift): two-level "
    "aggregation (cell counts, then per-group totals joined back — "
    "the counts table is O(groups x categories), so the join-back is "
    "metadata-sized) with the -p·ln(p) fold written token-identically "
    "on both engines, 6dp-rounded (q27 rule: libm ln differs in the "
    "last bit across implementations). Everything after the first "
    "count agg is vocabulary-sized — scales as a pure post-aggregate",
)
def q191_mix_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    tot = counts.groupBy("source").agg(F.sum("n").alias("tot"))
    p = F.col("n").cast("double") / F.col("tot")
    return (
        counts.join(tot, "source")
        .groupBy("source", "tot")
        .agg(
            F.count("*").alias("n_langs"),
            F.round(F.sum(-p * F.log(p)), 6).alias("entropy"),
            F.round(F.sum(p * p), 6).alias("hhi"),
        )
        .select(
            "source",
            F.col("tot").cast("long").alias("n_docs"),
            "n_langs",
            "entropy",
            "hhi",
        )
        .orderBy("source")
    )


# --- balanced class downsampling ---------------------------------------------
@register(
    "q192_balanced_downsample",
    oracle="""
    WITH target AS (
      SELECT MIN(n) AS floor_n FROM (
        SELECT COUNT(*) AS n FROM events GROUP BY event_type
      )
    ),
    ranked AS (
      SELECT event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY md5(concat(CAST(event_id AS VARCHAR), ':balance')),
                        event_id) AS rk
      FROM events
    )
    SELECT r.event_type, COUNT(*) AS n_kept,
           CAST(SUM(r.event_id) AS BIGINT) AS id_checksum
    FROM ranked r, target t
    WHERE r.rk <= t.floor_n
    GROUP BY r.event_type
    ORDER BY r.event_type
    """,
    notes="BALANCED class downsampling (the class-rebalance step of "
    "training-set construction: every class cut to the minority-class "
    "count, selection by deterministic md5 rank so the kept set is a "
    "uniform per-class sample reproducible across engines and "
    "layouts): the target count is a 1-row scalar from the per-class "
    "counts (broadcast), then one class-keyed window rank — the same "
    "machinery as q174's quota cap but with a DATA-DERIVED quota. "
    "Verified here by per-class counts + an id checksum so the exact "
    "kept SET is pinned, not just its size",
)
def q192_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    floor_n = (
        ev.groupBy("event_type")
        .count()
        .agg(F.min("count").alias("floor_n"))
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":balance"))),
            F.col("event_id"),
        )
    )
    return (
        ev.select("event_id", "event_type")
        .withColumn("rk", rk)
        .crossJoin(F.broadcast(floor_n))
        .filter(F.col("rk") <= F.col("floor_n"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("event_id").cast("long").alias("id_checksum"),
        )
        .orderBy("event_type")
    )


# --- group-wise min-max normalization ----------------------------------------
@register(
    "q193_minmax_normalize",
    oracle="""
    WITH bounds AS (
      SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    )
    SELECT e.event_id,
           e.event_type,
           ROUND(CASE WHEN b.hi = b.lo THEN 0.5
                      ELSE (e.value - b.lo) / (b.hi - b.lo) END, 6) AS scaled
    FROM events e JOIN bounds b ON e.event_type = b.event_type
    WHERE e.value IS NOT NULL
    ORDER BY e.event_id
    """,
    notes="group-wise MIN-MAX feature normalization (the classic "
    "per-segment feature-scaling op; degenerate constant groups pin to "
    "0.5 rather than dividing by zero): per-group bounds are O(groups) "
    "rows broadcast back onto the stream, scaling is map-side — the "
    "q157/q171 join-back-aggregate idiom again, one agg shuffle total. "
    "The scaling expression is written token-identically on both "
    "engines; 6dp rounding because (x-lo)/(hi-lo) hits the one "
    "division whose double result is engine-identical but whose "
    "pandas float64 repr the driver hashes",
)
def q193_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bounds = ev.groupBy(F.col("event_type").alias("b_type")).agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    scaled = F.when(F.col("hi") == F.col("lo"), F.lit(0.5)).otherwise(
        (F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    )
    return (
        ev.join(F.broadcast(bounds), ev["event_type"] == F.col("b_type"))
        .select(
            "event_id", "event_type", F.round(scaled, 6).alias("scaled")
        )
        .orderBy("event_id")
    )


# --- weighted median ---------------------------------------------------------
@register(
    "q194_weighted_median",
    oracle="""
    WITH w AS (
      SELECT event_type, value, CAST(1 + event_id % 5 AS BIGINT) AS wt
      FROM events WHERE value IS NOT NULL
    ),
    cum AS (
      SELECT event_type, value, wt,
             SUM(wt) OVER (PARTITION BY event_type
                           ORDER BY value, wt
                           ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(wt) OVER (PARTITION BY event_type) AS tw
      FROM w
    )
    SELECT event_type,
           ROUND(MIN(value), 6) AS weighted_median,
           CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM cum
    WHERE cw * 2 >= tw
    GROUP BY event_type
    ORDER BY event_type
    """,
    notes="WEIGHTED MEDIAN per group (lower weighted median: the "
    "smallest value whose cumulative weight reaches half the total — "
    "duplicate-aware corpus stats where each row carries a "
    "multiplicity, e.g. dedup-cluster sizes): one group-keyed window "
    "computes the running weight and the group total in the same "
    "shuffle, the crossing point is a filter + MIN — no second scan, "
    "no sort beyond the one per-group window order. Integer weights "
    "and the *2 comparison keep the crossing test exact (no 0.5*tw "
    "float). Deterministic (value, wt) tiebreak",
)
def q194_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = ev.select(
        "event_type",
        "value",
        (F.lit(1) + F.col("event_id") % 5).cast("long").alias("wt"),
    )
    cum = w.select(
        "event_type",
        "value",
        "wt",
        F.sum("wt")
        .over(
            Window.partitionBy("event_type")
            .orderBy("value", "wt")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cw"),
        F.sum("wt").over(Window.partitionBy("event_type")).alias("tw"),
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("event_type")
        .agg(
            F.round(F.min("value"), 6).alias("weighted_median"),
            F.max("tw").cast("long").alias("total_weight"),
        )
        .orderBy("event_type")
    )


# --- interval union / coverage -----------------------------------------------
@register(
    "q195_interval_union",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + (300 + (event_id % 10) * 60) * 1000000 AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me, COUNT(*) AS n_iv
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           COUNT(*) AS n_islands,
           CAST(SUM(me - ms) AS BIGINT) AS covered_us,
           CAST(SUM(n_iv) AS BIGINT) AS n_intervals
    FROM merged
    GROUP BY user_id
    ORDER BY user_id
    """,
    notes="INTERVAL UNION / coverage (merge overlapping per-key "
    "intervals, total covered time — billing/uptime/active-time "
    "arithmetic where raw durations double-count overlaps): each event "
    "opens a variable-length interval, islands form where an interval "
    "starts after the running MAX of previous ends (cumulative max, "
    "not lag — an early long interval can swallow several later ones: "
    "the q181 merge discipline applied to explicit intervals), then "
    "per-island min/max collapse. Strict inequality = touching "
    "intervals merge. ONE user-keyed window shuffle reused by both "
    "aggregations; integer microseconds end-to-end so coverage sums "
    "are exact",
)
def q195_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + (F.lit(300) + (F.col("event_id") % 10) * 60) * 1000000
        ).alias("e"),
    )
    prev_max_e = F.max("e").over(
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            Window.partitionBy("user_id")
            .orderBy("s", "e")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me"), F.count("*").alias("n_iv")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count("*").alias("n_islands"),
            F.sum(F.col("me") - F.col("ms")).cast("long").alias("covered_us"),
            F.sum("n_iv").cast("long").alias("n_intervals"),
        )
        .orderBy("user_id")
    )


# --- domain vocabulary overlap -----------------------------------------------
@register(
    "q196_domain_vocab_overlap",
    oracle="""
    WITH vocab AS (
      SELECT DISTINCT source, tok FROM (
        SELECT source,
               unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                      t -> t <> '')) AS tok
        FROM documents
      )
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM vocab GROUP BY source),
    ov AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
      FROM vocab a JOIN vocab b
        ON a.tok = b.tok AND a.source < b.source
      GROUP BY src_a, src_b
    )
    SELECT o.src_a, o.src_b,
           ROUND(CAST(o.inter AS DOUBLE)
                 / (sa.n + sb.n - o.inter), 6) AS vocab_jaccard
    FROM ov o
    JOIN sizes sa ON sa.source = o.src_a
    JOIN sizes sb ON sb.source = o.src_b
    WHERE CAST(o.inter AS DOUBLE) / (sa.n + sb.n - o.inter) >= 0.3
    ORDER BY src_a, src_b
    """,
    notes="DOMAIN-level vocabulary overlap (which crawl sources speak "
    "the same language — mirror detection and dedup PRIORITIZATION one "
    "level above documents: near-identical vocab Jaccard between two "
    "sources says to run the expensive doc-level dedup across that "
    "pair first): per-source distinct-token vocabularies via one "
    "explode+distinct, pairwise intersection through the token-keyed "
    "inverted self-join (pairs bounded by sources-per-token², with "
    "source count orders of magnitude below doc count — the group-"
    "level problem is structurally smaller than q42's doc-level one), "
    "Jaccard from the size table joined back twice",
)
def q196_domain_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    from ..llm.retrieval import tokenize

    vocab = (
        tokenize(docs.select("source", "text"), "text", "source")
        .select(F.col("source"), F.col("tok"))
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count("*").alias("n"))
    a = vocab.select(F.col("source").alias("src_a"), "tok")
    b = vocab.select(F.col("source").alias("src_b"), "tok")
    ov = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("inter"))
    )
    sized = (
        ov.join(
            F.broadcast(
                sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
            ),
            "src_b",
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return (
        sized.filter(jac >= 0.3)
        .select(
            "src_a", "src_b", F.round(jac, 6).alias("vocab_jaccard")
        )
        .orderBy("src_a", "src_b")
    )


# --- k-anonymity audit -------------------------------------------------------
@register(
    "q197_k_anonymity",
    oracle="""
    WITH cells AS (
      SELECT lang, source,
             CAST(floor(n_chars / 500.0) AS BIGINT) AS size_bucket,
             COUNT(*) AS n
      FROM documents
      GROUP BY lang, source, size_bucket
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_cells,
      CAST(COUNT(CASE WHEN n < 5 THEN 1 END) AS BIGINT) AS cells_below_k,
      CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS BIGINT)
        AS rows_at_risk,
      CAST(MIN(n) AS BIGINT) AS min_cell
    FROM cells
    """,
    notes="K-ANONYMITY audit (the privacy gate before releasing or "
    "training on quasi-identifier combinations: any (lang, source, "
    "size-bucket) cell with fewer than k=5 members re-identifies its "
    "rows): one grouped count over the quasi-identifier tuple, then an "
    "O(cells) summary — cells below k, total rows at risk, the "
    "minimum cell size (the dataset's actual k). Bucketing goes "
    "through an explicit floor() on both engines: DuckDB CASTs double "
    "to BIGINT by ROUNDING where Spark truncates, so a bare cast "
    "silently shifts every odd half-bucket. Map-side-combinable count, summary is "
    "metadata-sized — the audit costs one scan at any corpus size",
)
def q197_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    cells = docs.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / 500.0).cast("long").alias("size_bucket"),
    ).agg(F.count("*").alias("n"))
    return cells.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.count(F.when(F.col("n") < 5, 1)).cast("long").alias("cells_below_k"),
        F.coalesce(F.sum(F.when(F.col("n") < 5, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("n").cast("long").alias("min_cell"),
    )


# --- top-k WITH TIES ---------------------------------------------------------
@register(
    "q199_topk_with_ties",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             RANK() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC) AS rk
      FROM orders
    ) WHERE rk <= 3
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
    notes="per-group top-k WITH TIES (§2.6, the FETCH FIRST k WITH TIES "
    "semantics q22's row_number cut cannot express: rank() keeps every "
    "row tied with the k-th, so equal-value rows never drop "
    "arbitrarily — result size is data-dependent, correctness is "
    "order-independent): same single group-keyed window shuffle as "
    "q22; the two queries together pin the rank/row_number cut "
    "distinction on both engines",
)
def q199_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        orders.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", F.col("o_totalprice").desc(), "o_orderkey")
    )


# --- per-key volatility ------------------------------------------------------
@register(
    "q200_value_volatility",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             lag(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
      FROM events WHERE value IS NOT NULL
    ),
    diffs AS (
      SELECT user_id,
             CAST(abs(value - prev) AS DECIMAL(25,6)) AS d
      FROM seq WHERE prev IS NOT NULL
    )
    SELECT user_id,
           COUNT(*) AS n_steps,
           CAST(SUM(d) AS DOUBLE) / COUNT(*) AS mean_abs_step,
           CAST(MAX(d) AS DOUBLE) AS max_abs_step
    FROM diffs
    GROUP BY user_id
    ORDER BY user_id
    """,
    notes="per-key VOLATILITY (mean/max absolute consecutive change — "
    "the signal-stability stat for irregularly sampled series, the "
    "lag-based sibling of q118's EWMA and q183's TWAP): one user-keyed "
    "window order shared by lag and the grouped agg, consecutive "
    "diffs decimal-carried so the mean is order-independent, first "
    "observation per key excluded identically on both engines (lag "
    "IS NULL)",
)
def q200_value_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "value", F.lag("value").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    d = F.abs(F.col("value") - F.col("prev")).cast("decimal(25,6)")
    return (
        seq.select("user_id", d.alias("d"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_steps"),
            (F.sum("d").cast("double") / F.count("*")).alias("mean_abs_step"),
            F.max("d").cast("double").alias("max_abs_step"),
        )
        .orderBy("user_id")
    )
