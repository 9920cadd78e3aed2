"""Round-2 extension queries III: time-series gap-fill / SCD2 dimension
history (operators/timeseries.py), deeper TPC-H decision-support shapes
(Q13/Q18/Q22 — left-outer distribution, having-subquery join, scalar-avg
anti-join), and the regexp function surface (§2.8).

Reference parity: dbkit's domain is OLAP over event streams (SURVEY §1,
§2.11); its pre-alpha operator set (scan/project, operation/scan_view.rs,
operation/project.rs) implies but never reaches these read-side patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.aggregate import dec, stable_sum, stable_sum_sql
from ..operators.timeseries import gapfill_locf, scd2_history
from ..sources import read_table

_EPOCH = "TIMESTAMP '1970-01-01 00:00:00'"


# --- time-series gap-fill + LOCF ------------------------------------------
@register(
    "q101_gapfill_locf",
    oracle=f"""
    WITH agg AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS be,
             COUNT(*) AS n_events,
             {stable_sum_sql("value", 6)} AS total_value
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT event_type, MIN(be) AS mn, MAX(be) AS mx FROM agg GROUP BY 1
    ), spine AS (
      SELECT b.event_type, gs.be
      FROM bounds b, UNNEST(generate_series(b.mn, b.mx, 3600)) AS gs(be)
    )
    SELECT s.event_type,
           {_EPOCH} + to_seconds(s.be) AS bucket_ts,
           COALESCE(a.n_events, 0) AS n_events,
           a.n_events IS NULL AS is_gap,
           last_value(a.total_value IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.be
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS total_value_locf
    FROM spine s LEFT JOIN agg a USING (event_type, be)
    """,
    notes="time_bucket_gapfill + LOCF (operators/timeseries.gapfill_locf): "
    "hourly buckets per event_type densified to a per-key spine "
    "(integer sequence explode from a min/max agg — no calendar cross "
    "join), gaps filled by last-observation-carried-forward window; "
    "raw events aggregated exactly once",
)
def q101_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return gapfill_locf(
        events,
        "ts",
        ["event_type"],
        {"total_value": stable_sum("value", 6)},
        bucket="1 hour",
    )


# --- SCD2 dimension history -----------------------------------------------
@register(
    "q102_scd2_user_state",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ), changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev IS NULL OR event_type <> prev
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           row_number() OVER w AS version,
           lead(ts) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    notes="SCD type-2 builder (operators/timeseries.scd2_history): the "
    "per-user event_type feed collapses into versioned validity "
    "intervals (valid_from/valid_to/version/is_current); change "
    "detection and interval assignment share one (user_id, ts) "
    "shuffle+sort; event_id tiebreaks same-ts rows (ADVICE r1 asof "
    "lesson)",
)
def q102_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return scd2_history(
        events, "user_id", ["event_type"], "ts", tiebreak="event_id"
    )


# --- TPC-H Q13: customer order-count distribution --------------------------
@register(
    "q103_tpch_q13_custdist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority NOT LIKE '%URGENT%'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    notes="TPC-H Q13 shape: left outer join with a filtered JOIN CONDITION "
    "(not a WHERE — zero-order customers must survive), then a second "
    "aggregation over the first's output; the histogram agg input is "
    "|customer| rows, so the second shuffle is tiny",
)
def q103_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (~orders.o_orderpriority.like("%URGENT%")),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- TPC-H Q18: large-volume customers --------------------------------------
@register(
    "q104_tpch_q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, CAST(SUM(l.l_quantity) AS DOUBLE) AS sum_qty
    FROM customer c, orders o, lineitem l
    WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
          )
      AND c.c_custkey = o.o_custkey
      AND o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    """,
    notes="TPC-H Q18 shape: HAVING-subquery membership rewritten as a "
    "semi-join against the pre-aggregated keys — lineitem is scanned "
    "for the agg and for the detail join, but the IN-list never "
    "materializes driver-side; quantity sums are integral doubles "
    "(exact in FP) so no decimal carry is needed",
)
def q104_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 150)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )


# --- TPC-H Q22: dormant high-balance customers ------------------------------
@register(
    "q105_tpch_q22_dormant",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = 'URGENT'
          )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    notes="TPC-H Q22 shape: scalar-subquery threshold (computed once, "
    "broadcast into the filter) + NOT EXISTS as a left anti join; "
    "AVG threshold comparison is engine-exact because both engines "
    "compute the same double and compare with > (no accumulation in "
    "the output); output sums decimal-carried",
)
def q105_tpch_q22_dormant(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    # Scalar subquery: one tiny agg, cross-joined (broadcast, 1 row) as a
    # threshold column — never collected to the driver.
    thresh = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    return (
        customer.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(
            orders.filter(F.col("o_orderpriority") == "URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            stable_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --- regexp surface (§2.8) ---------------------------------------------------
@register(
    "q106_regexp_funcs",
    oracle="""
    SELECT event_id,
           regexp_extract(props, '"k": ([0-9]+)', 1) AS k_str,
           regexp_replace(props, '[0-9]', '#', 'g') AS masked,
           CAST(length(regexp_extract_all(props, '[0-9]')) AS BIGINT)
             AS n_digits,
           regexp_matches(props, '"k": [0-9][0-9]}') AS is_2digit
    FROM events
    """,
    notes="regexp surface (§2.8): extract with capture group, global "
    "replace (DuckDB needs the 'g' flag to match Spark's "
    "replace-all), match counting via extract_all length, boolean "
    "rlike; patterns restricted to the RE2/Java-regex common subset",
)
def q106_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.regexp_extract("props", '"k": ([0-9]+)', 1).alias("k_str"),
        F.regexp_replace("props", "[0-9]", "#").alias("masked"),
        F.size(F.expr(r"regexp_extract_all(props, '[0-9]', 0)"))
        .cast("long")
        .alias("n_digits"),
        F.col("props").rlike('"k": [0-9][0-9]\\}').alias("is_2digit"),
    )


# --- foreachBatch incremental upsert (§2.9 output surface) -------------------
@register(
    "q107_stream_incremental_upsert",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
           MAX(ts) AS last_ts,
           arg_max(event_type,
                   lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
                   lpad(CAST(event_id AS VARCHAR), 12, '0')) AS last_type
    FROM events GROUP BY user_id
    """,
    notes="foreachBatch incremental upsert "
    "(streaming/foreach_batch.run_incremental_upsert): events split into "
    "4 parquet files streamed one-file-per-trigger, each micro-batch "
    "merged into a versioned parquet state table (union + re-agg, no "
    "join); decimal-carried sums + key-carrying max_by make the final "
    "state bit-equal to the batch aggregate of the whole history "
    "regardless of batch boundaries; the 'latest' tiebreak is a "
    "zero-padded (epoch_us, event_id) string key, total-ordered and "
    "portable to the DuckDB oracle",
)
def q107_stream_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..streaming.foreach_batch import run_incremental_upsert

    events = read_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="dbkit_q107_")
    in_dir = f"{work}/input"
    events.repartition(4).write.mode("overwrite").parquet(in_dir)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )

    def sort_key(ts, event_id):
        return F.concat(
            F.lpad(F.unix_micros(ts).cast("string"), 20, "0"),
            F.lpad(event_id.cast("string"), 12, "0"),
        )

    def partial(df: DataFrame) -> DataFrame:
        k = sort_key(F.col("ts"), F.col("event_id"))
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 6)).cast("decimal(38,6)").alias("__total_dec"),
            F.max("ts").alias("last_ts"),
            F.max(k).alias("__last_key"),
            F.max_by("event_type", k).alias("last_type"),
        )

    def merge(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.sum("n_events").alias("n_events"),
            F.sum("__total_dec").cast("decimal(38,6)").alias("__total_dec"),
            F.max("last_ts").alias("last_ts"),
            F.max("__last_key").alias("__last_key"),
            F.max_by("last_type", "__last_key").alias("last_type"),
        )

    state = run_incremental_upsert(stream, partial, merge, f"{work}/state")
    return state.select(
        "user_id",
        "n_events",
        F.col("__total_dec").cast("double").alias("total_value"),
        "last_ts",
        "last_type",
    )


# --- declarative data-quality audit ------------------------------------------
@register(
    "q108_quality_audit",
    oracle="""
    SELECT 'not_null:customer.c_name' AS constraint, 'not_null' AS kind,
           COUNT(*) AS n_checked,
           CAST(COUNT(*) FILTER (WHERE c_name IS NULL) AS BIGINT) AS n_violations,
           COUNT(*) FILTER (WHERE c_name IS NULL) = 0 AS ok
    FROM customer
    UNION ALL
    SELECT 'unique:orders.o_orderkey', 'unique',
           COUNT(*), CAST(COUNT(*) FILTER (WHERE n > 1) AS BIGINT),
           COUNT(*) FILTER (WHERE n > 1) = 0
    FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY 1) g
    UNION ALL
    SELECT 'foreign_key:lineitem.l_orderkey->orders.o_orderkey', 'foreign_key',
           COUNT(*),
           CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT),
           COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) = 0
    FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'foreign_key:orders.o_custkey->customer.c_custkey', 'foreign_key',
           COUNT(*),
           CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT),
           COUNT(*) FILTER (WHERE c.c_custkey IS NULL) = 0
    FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'in_range:lineitem.l_discount[0.0,0.1]', 'in_range',
           COUNT(l_discount),
           CAST(COUNT(*) FILTER (WHERE l_discount IS NOT NULL
                                   AND (l_discount < 0.0 OR l_discount > 0.1))
                AS BIGINT),
           COUNT(*) FILTER (WHERE l_discount IS NOT NULL
                              AND (l_discount < 0.0 OR l_discount > 0.1)) = 0
    FROM lineitem
    """,
    notes="declarative data-quality audit (operators/quality_audit): "
    "not-null / key-uniqueness / referential-integrity / range "
    "constraints reported as one O(constraints)-sized violations table "
    "— each check is a single-pass aggregate (FK = left join with hit "
    "marker, counted in the same pass), never a per-row failure dump",
)
def q108_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality_audit import (
        audit,
        foreign_key,
        in_range,
        not_null,
        unique,
    )

    tables = {
        t: read_table(spark, sf_dir, t)
        for t in ["customer", "orders", "lineitem"]
    }
    return audit(
        tables,
        [
            not_null("customer", "c_name"),
            unique("orders", "o_orderkey"),
            foreign_key("lineitem", "l_orderkey", "orders", "o_orderkey"),
            foreign_key("orders", "o_custkey", "customer", "c_custkey"),
            in_range("lineitem", "l_discount", 0.0, 0.1),
        ],
    )


# --- BM25 lexical retrieval ---------------------------------------------------
@register(
    "q109_bm25_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t.tok
      FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t(tok)
      WHERE t.tok <> ''
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
    ), corpus AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      WHERE tok IN ('spark', 'join', 'window') GROUP BY 1, 2
    ), df AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
    )
    SELECT tf.doc_id,
           ROUND(SUM(
             ln((c.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
             * tf.tf * (1.2 + 1)
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / c.avgdl))
           ), 6) AS score
    FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), corpus c
    GROUP BY tf.doc_id
    ORDER BY score DESC, tf.doc_id
    LIMIT 10
    """,
    notes="BM25 top-k lexical retrieval (llm/retrieval.bm25_topk): "
    "query-term filter lands before the tf shuffle so scoring touches "
    "only matching docs; df and corpus stats broadcast (|Q|-row and "
    "1-row); TakeOrderedAndProject final ranking; scores rounded 6dp "
    "(sum over <=|Q| doubles is order-sensitive) with doc_id tiebreak",
)
def q109_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.retrieval import bm25_topk

    docs = read_table(spark, sf_dir, "documents")
    return bm25_topk(docs, "text", "doc_id", ["spark", "join", "window"], k=10)


# --- deterministic weighted sampling (A-ES) ----------------------------------
@register(
    "q110_weighted_sample",
    oracle="""
    WITH u AS (
      SELECT doc_id, lang, n_chars,
             (CAST(list_sum(list_transform(generate_series(1, 6),
                i -> CAST((strpos('0123456789abcdef',
                           substr(md5(concat(CAST(doc_id AS VARCHAR), ':wsample')),
                                  i, 1)) - 1) AS BIGINT)
                     * CAST(pow(16, 6 - i) AS BIGINT))) AS BIGINT) + 0.5)
             / 16777216.0 AS u
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, lang, n_chars,
           ROUND(-ln(u) / CAST(n_chars AS DOUBLE), 9) AS wkey
    FROM u
    ORDER BY wkey, doc_id
    LIMIT 100
    """,
    notes="deterministic weighted sample without replacement "
    "(llm/sampling.weighted_sample_topk, Efraimidis-Spirakis A-ES "
    "exponential-key form): md5-uniform u, wkey=-ln(u)/weight, k "
    "smallest win via TakeOrderedAndProject — inclusion mass "
    "proportional to n_chars; 9dp rounding + doc_id tiebreak makes the "
    "selected SET engine-exact, and membership is stable under "
    "repartitioning and appends (unlike seeded sample())",
)
def q110_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.sampling import weighted_sample_topk

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return weighted_sample_topk(docs, "doc_id", "n_chars", k=100)


# --- equi-width histogram ----------------------------------------------------
@register(
    "q111_histogram",
    oracle="""
    WITH binned AS (
      SELECT o_orderstatus,
             CAST(CASE WHEN o_totalprice < 0 THEN -1
                       WHEN o_totalprice >= 500000 THEN 20
                       ELSE floor(o_totalprice / 25000.0)
                  END AS BIGINT) AS bin
      FROM orders
      WHERE o_totalprice IS NOT NULL
    )
    SELECT o_orderstatus, bin,
           bin * 2.5e4 AS bin_lo,
           (bin + 1) * 2.5e4 AS bin_hi,
           COUNT(*) AS n
    FROM binned
    GROUP BY o_orderstatus, bin
    """,
    notes="equi-width histogram (operators/histogram.equi_width_histogram): "
    "one map-side bucket expression + one hash agg; explicit "
    "underflow/overflow sentinel bins (-1/nbins) instead of silent "
    "clamping; 20 bins of 25k over o_totalprice per order status",
)
def q111_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.histogram import equi_width_histogram

    orders = read_table(spark, sf_dir, "orders")
    return equi_width_histogram(
        orders, "o_totalprice", 0.0, 500_000.0, 20, keys=["o_orderstatus"]
    )


# --- TPC-H Q21: suppliers who kept orders waiting ----------------------------
@register(
    "q113_tpch_q21_waiting",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s, lineitem l1, orders o
    WHERE s.s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 20
    """,
    notes="TPC-H Q21 shape (lateness = shipped >60d after order date — "
    "the fixture has no commit/receipt dates): correlated EXISTS + "
    "NOT EXISTS decorrelated into two per-order aggregates — "
    "distinct-supplier count >= 2 replaces EXISTS(other supplier), "
    "distinct-LATE-supplier count == 1 replaces NOT EXISTS(other late "
    "supplier) given l1 itself is late; both aggs are order-keyed "
    "single shuffles instead of per-row subquery probes",
)
def q113_tpch_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")

    late = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    nsupp = lineitem.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("__nsupp")
    )
    nlate = late.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("__nlate")
    )
    return (
        late.join(nsupp, "l_orderkey")
        .join(nlate, "l_orderkey")
        .filter((F.col("__nsupp") >= 2) & (F.col("__nlate") == 1))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


# --- streaming replay of q36's session windows (batch/stream parity) --------
@register(
    "q115_stream_session_replay",
    oracle="""
    WITH d AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM d
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id, COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    notes="session_window in STREAMING mode (§2.9): q36's gaps-and-islands "
    "oracle replayed via readStream + availableNow + complete-mode "
    "memory sink — streaming session merging must produce the identical "
    "session set as the batch operator",
)
def q115_stream_session_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.runner import read_events_stream, run_available_now
    from ..streaming.windows import session_agg

    stream = read_events_stream(spark, sf_dir)
    agg = session_agg(
        stream, "ts", "30 minutes", ["user_id"], {"n_events": F.count("*")}
    )
    return run_available_now(agg, output_mode="complete")


# --- higher-order array functions II (§2.8: filter/exists/forall) -----------
@register(
    "q114_hof_array_surface",
    oracle="""
    WITH a AS (
      SELECT event_id, generate_series(1, CAST(event_id % 5 AS INTEGER) + 2) AS arr
      FROM events
    )
    SELECT event_id,
           array_to_string(list_filter(arr, x -> x % 2 = 0), ',') AS evens,
           CAST(length(list_filter(arr, x -> x % 2 = 0)) AS BIGINT) AS n_even,
           length(list_filter(arr, x -> x > 3)) > 0 AS has_gt3,
           length(list_filter(arr, x -> NOT (x > 0))) = 0 AS all_pos,
           CAST(list_sum(list_transform(arr, x -> x * 2)) AS BIGINT) AS doubled_sum
    FROM a
    """,
    notes="higher-order array functions, part II of q31 (§2.8): "
    "filter / exists / forall / transform-then-fold lambdas, all "
    "JVM-side codegen; array outputs projected to joined strings (q57 "
    "lesson: the driver's pandas canonicalization cannot sort "
    "list-valued columns); integer folds so sums are exact",
)
def q114_hof_array_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    arr = F.sequence(F.lit(1), (F.col("event_id") % 5 + 2).cast("int"))
    evens = F.filter(arr, lambda x: x % 2 == 0)
    return events.select(
        "event_id",
        F.array_join(evens.cast("array<string>"), ",").alias("evens"),
        F.size(evens).cast("long").alias("n_even"),
        F.exists(arr, lambda x: x > 3).alias("has_gt3"),
        F.forall(arr, lambda x: x > 0).alias("all_pos"),
        F.aggregate(
            F.transform(arr, lambda x: x * 2),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("doubled_sum"),
    )


# --- robust statistics (MAD / IQR / trimmed mean) ----------------------------
@register(
    "q116_robust_stats",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med,
             quantile_cont(value, 0.25) AS p25,
             quantile_cont(value, 0.75) AS p75
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(ANY_VALUE(m.med), 6) AS median_value,
           ROUND(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad,
           ROUND(ANY_VALUE(m.p75) - ANY_VALUE(m.p25), 6) AS iqr,
           ROUND(CAST(SUM(CASE WHEN e.value BETWEEN m.p25 AND m.p75
                               THEN CAST(e.value AS DECIMAL(25,6)) END)
                      AS DOUBLE)
                 / COUNT(CASE WHEN e.value BETWEEN m.p25 AND m.p75
                              THEN 1 END), 6) AS trimmed_mean
    FROM events e JOIN med m USING (event_type)
    GROUP BY e.event_type
    """,
    notes="robust statistics: median absolute deviation, interquartile "
    "range, IQR-trimmed mean — the outlier-resistant profile a data "
    "pipeline wants before z-scores; two passes (per-group quantiles, "
    "then deviation/trim agg over a broadcast-joined quantile row), "
    "decimal-carried trimmed sum, 6dp rounding (interpolated "
    "percentiles are order-sensitive in the last bits)",
)
def q116_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregate import dec, rounded

    events = read_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("__med"),
        F.percentile("value", 0.25).alias("__p25"),
        F.percentile("value", 0.75).alias("__p75"),
    )
    in_iqr = F.col("value").between(F.col("__p25"), F.col("__p75"))
    return (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            rounded(F.any_value("__med")).alias("median_value"),
            rounded(
                F.percentile(F.abs(F.col("value") - F.col("__med")), 0.5)
            ).alias("mad"),
            rounded(F.any_value("__p75") - F.any_value("__p25")).alias("iqr"),
            rounded(
                F.sum(F.when(in_iqr, dec("value", 6))).cast("double")
                / F.count(F.when(in_iqr, F.lit(1)))
            ).alias("trimmed_mean"),
        )
    )


# --- TPC-H Q2: min-cost supplier per part ------------------------------------
@register(
    "q117_tpch_q2_min_cost",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY 1, 2
    ), best AS (
      SELECT l_partkey, MIN(cost) AS mincost FROM ps GROUP BY 1
    )
    SELECT p.p_partkey, p.p_brand, s.s_name, ROUND(ps.cost, 6) AS cost
    FROM ps
    JOIN best ON ps.l_partkey = best.l_partkey AND ps.cost = best.mincost
    JOIN part p ON p.p_partkey = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE p.p_size <= 10
    ORDER BY cost, p.p_partkey, s.s_name
    LIMIT 100
    """,
    notes="TPC-H Q2 shape (lineitem unit price stands in for partsupp "
    "supplycost): correlated MIN subquery decorrelated into a per-part "
    "min agg joined back on (part, cost) equality — ALL tied best "
    "suppliers survive, matching Q2 semantics; the min-cost compare is "
    "on raw doubles (MIN selects an element, no accumulation) with "
    "rounding only at output; part/supplier dims broadcast",
)
def q117_tpch_q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    supplier = read_table(spark, sf_dir, "supplier")
    lineitem = read_table(spark, sf_dir, "lineitem")
    ps = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("__cost")
    )
    # rename the agg's key: a self-derived join on same-named columns can
    # resolve both sides to one attribute (trivially-true predicate)
    best = ps.groupBy("l_partkey").agg(F.min("__cost").alias("__mincost")) \
        .withColumnRenamed("l_partkey", "__bk")
    return (
        ps.join(
            best,
            (F.col("l_partkey") == F.col("__bk"))
            & (F.col("__cost") == F.col("__mincost")),
        )
        .drop("__bk")
        .join(
            F.broadcast(part.filter(F.col("p_size") <= 10)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.round("__cost", 6).alias("cost"),
        )
        .orderBy("cost", "p_partkey", "s_name")
        .limit(100)
    )


# --- EWMA smoothing (grouped-map) ---------------------------------------------
@register(
    "q118_ewma",
    oracle="""
    WITH RECURSIVE s AS (
      SELECT user_id, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ),
    r AS (
      SELECT user_id, ts, value, rn, CAST(value AS DOUBLE) AS e
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.ts, s.value, s.rn, 0.2 * s.value + 0.8 * r.e
      FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, ts, value, round(e, 6) AS ewma FROM r
    """,
    notes="per-user EWMA smoothing (operators/timeseries.ewma, "
    "alpha=0.2): the y_t = a*x_t + (1-a)*y_(t-1) recursion is "
    "sequential within a key and not window-expressible without "
    "unstable pow() rescaling -> grouped-map applyInPandas (the "
    "declared Arrow boundary). Converted from rows-only in round 11 "
    "(VERDICT r10 item 4): a recursive CTE replays the recurrence in "
    "the identical (ts, event_id) order, one step per iteration across "
    "all users at once — iteration depth = the deepest per-user "
    "series, fixture-bounded; 6dp canonicalization on both legs "
    "absorbs the pandas-vs-sequential float summation ulp (verified "
    "hash-identical at all three fixture scales). Exact parity with a "
    "pure-Python reference recursion stays asserted in "
    "tests/test_timeseries.py",
)
def q118_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import ewma

    events = read_table(spark, sf_dir, "events")
    return ewma(
        events, "ts", ["user_id"], "value", 0.2, tiebreak=["event_id"]
    ).withColumn("ewma", F.round("ewma", 6))


# --- three-valued logic semantics (§2.2/§2.8 correctness showcase) -----------
@register(
    "q119_three_valued_logic",
    oracle="""
    WITH t AS (SELECT NULLIF(o_orderstatus, 'O') AS s FROM orders)
    SELECT
      COUNT(*) AS n_rows,
      CAST(COUNT(s) AS BIGINT) AS n_non_null,
      CAST(COUNT(CASE WHEN s IN ('F', 'P') THEN 1 END) AS BIGINT) AS n_in,
      CAST(COUNT(CASE WHEN s NOT IN ('F', NULL) THEN 1 END) AS BIGINT)
        AS n_not_in_null_list,
      CAST(COUNT(CASE WHEN (s = 'F') IS NULL THEN 1 END) AS BIGINT)
        AS n_unknown_cmp,
      CAST(COUNT(CASE WHEN (s = 'F' OR TRUE) THEN 1 END) AS BIGINT)
        AS n_or_true,
      CAST(COUNT(CASE WHEN NOT (s = 'F' AND FALSE) THEN 1 END) AS BIGINT)
        AS n_and_false,
      CAST(COUNT(CASE WHEN s IS DISTINCT FROM 'F' THEN 1 END) AS BIGINT)
        AS n_distinct_from
    FROM t
    """,
    notes="three-valued-logic semantics over data-manufactured NULLs "
    "(NULLIF): COUNT skips NULL, x IN list is UNKNOWN for NULL x, "
    "NOT IN against a list containing NULL matches NOTHING (the classic "
    "silent-wrong-results trap), UNKNOWN OR TRUE = TRUE, UNKNOWN AND "
    "FALSE = FALSE, IS DISTINCT FROM treats NULL as comparable — "
    "engines that cut corners on 3VL diverge on every one of these "
    "counts",
)
def q119_three_valued_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    s = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    t = orders.select(s.alias("s"))

    def cnt(cond):
        return F.count(F.when(cond, F.lit(1))).cast("long")

    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("s").cast("long").alias("n_non_null"),
        cnt(F.col("s").isin("F", "P")).alias("n_in"),
        cnt(F.expr("s NOT IN ('F', NULL)")).alias("n_not_in_null_list"),
        cnt((F.col("s") == "F").isNull()).alias("n_unknown_cmp"),
        cnt((F.col("s") == "F") | F.lit(True)).alias("n_or_true"),
        cnt(~((F.col("s") == "F") & F.lit(False))).alias("n_and_false"),
        cnt(~F.col("s").eqNullSafe("F")).alias("n_distinct_from"),
    )


# --- generated date dimension + activity calendar ---------------------------
@register(
    "q120_date_dim_activity",
    oracle="""
    WITH b AS (
      SELECT MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mx FROM orders
    ), spine AS (
      SELECT UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS dt FROM b
    ), act AS (
      SELECT o_orderdate AS dt, COUNT(*) AS n_orders FROM orders GROUP BY 1
    )
    SELECT s.dt,
           CAST(year(s.dt) AS BIGINT) AS y,
           CAST(quarter(s.dt) AS BIGINT) AS q,
           CAST(month(s.dt) AS BIGINT) AS m,
           CAST(dayofweek(s.dt) + 1 AS BIGINT) AS dow,
           dayofweek(s.dt) IN (0, 6) AS is_weekend,
           COALESCE(a.n_orders, 0) AS n_orders
    FROM spine s LEFT JOIN act a USING (dt)
    """,
    notes="generated date dimension (warehouse dim_date): daily spine from "
    "the fact table's own min/max (agg + sequence explode — NO 1-row "
    "cross join, no static calendar table), calendar attributes "
    "(year/quarter/month/day-of-week/weekend), zero-filled activity "
    "counts; dow normalized to Spark's 1=Sunday convention (DuckDB "
    "dayofweek is 0=Sunday)",
)
def q120_date_dim_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    spine = orders.agg(
        F.min("o_orderdate").alias("__mn"), F.max("o_orderdate").alias("__mx")
    ).select(
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), F.expr("INTERVAL 1 DAY"))
        ).alias("dt")
    )
    act = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    return spine.join(act, "dt", "left").select(
        "dt",
        F.year("dt").cast("long").alias("y"),
        F.quarter("dt").cast("long").alias("q"),
        F.month("dt").cast("long").alias("m"),
        F.dayofweek("dt").cast("long").alias("dow"),
        F.dayofweek("dt").isin(1, 7).alias("is_weekend"),
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_orders"),
    )


# --- union by name with missing columns (§2.7) -------------------------------
@register(
    "q121_union_by_name",
    oracle="""
    SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority, 'price' AS src
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL BY NAME
    SELECT o_orderkey, o_orderpriority, 'prio' AS src
    FROM orders WHERE o_orderkey % 3 = 1
    """,
    notes="unionByName(allowMissingColumns=True) (§2.7): heterogeneous "
    "inputs align by COLUMN NAME, absent columns fill with typed NULL — "
    "positional UNION would silently zip mismatched columns; mirrored "
    "by DuckDB's UNION ALL BY NAME",
)
def q121_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    price = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice", F.lit("price").alias("src")
    )
    prio = orders.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_orderpriority", F.lit("prio").alias("src")
    )
    return price.unionByName(prio, allowMissingColumns=True)


# --- percent-of-total (ratio_to_report) window -------------------------------
@register(
    "q122_percent_of_total",
    oracle="""
    WITH n AS (
      SELECT n.n_regionkey, n.n_name,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,2))) AS DOUBLE)
               AS revenue
      FROM nation n
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY n.n_regionkey, n.n_name
    )
    SELECT n_regionkey, n_name, ROUND(revenue, 2) AS revenue,
           ROUND(revenue / SUM(revenue) OVER (PARTITION BY n_regionkey), 6)
             AS region_share
    FROM n
    """,
    notes="percent-of-total (ratio_to_report): per-nation revenue share "
    "within its region via value / SUM() OVER (PARTITION BY region) — "
    "the two-pass 'total then divide' anti-pattern collapsed into one "
    "windowed pass; numerators decimal-carried, the share rounded 6dp "
    "(window-sum order sensitivity)",
)
def q122_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    rev = (
        F.broadcast(nation)
        .join(customer, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_regionkey", "n_name")
        .agg(F.sum(dec("o_totalprice", 2)).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("n_regionkey")
    return rev.select(
        "n_regionkey",
        "n_name",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias(
            "region_share"
        ),
    )


# --- first-seen cohorts: new + cumulative users per day ----------------------
@register(
    "q123_first_seen_cumulative",
    oracle="""
    WITH f AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS first_day
      FROM events GROUP BY user_id
    ), d AS (
      SELECT first_day, COUNT(*) AS n_new FROM f GROUP BY first_day
    )
    SELECT first_day, n_new,
           CAST(SUM(n_new) OVER (ORDER BY first_day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_users
    FROM d
    """,
    notes="first-seen cohort curve: per-day NEW users (min event day per "
    "user) + cumulative running total — running COUNT DISTINCT over "
    "time collapsed to first-touch attribution + cumsum, turning an "
    "unbounded distinct-state window into two keyed aggs and a "
    "days-sized window; integer sums, exact",
)
def q123_first_seen_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    first = events.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("first_day")
    )
    days = first.groupBy("first_day").agg(F.count(F.lit(1)).alias("n_new"))
    w = (
        Window.orderBy("first_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return days.select(
        "first_day", "n_new", F.sum("n_new").over(w).alias("cum_users")
    )


# --- deterministic mode (most-frequent value, value-ordered ties) ------------
@register(
    "q124_mode_deterministic",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    ), r AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rk
      FROM c
    )
    SELECT user_id, event_type AS mode_type, n AS mode_count
    FROM r WHERE rk = 1
    """,
    notes="deterministic MODE per group: engines' built-in mode() breaks "
    "frequency ties arbitrarily (partition-order-dependent), so the "
    "engine's mode is count-then-rank with a value tiebreak — one "
    "(group, value) agg + one group-keyed window, both on the same "
    "shuffle key",
)
def q124_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("n").alias("mode_count"),
        )
    )


# --- ordered event funnel ----------------------------------------------------
@register(
    "q125_funnel",
    oracle="""
    WITH f AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      COUNT(*) AS n_users,
      CAST(COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS BIGINT)
        AS n_view,
      CAST(COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                      THEN 1 END) AS BIGINT) AS n_view_click,
      CAST(COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                       AND t_purchase > t_click
                      THEN 1 END) AS BIGINT) AS n_view_click_purchase
    FROM f
    """,
    notes="ordered funnel (view -> click -> purchase): first-touch "
    "timestamps per step via conditional MIN — ONE shuffle on user_id "
    "for the whole funnel, step ordering checked on the tiny per-user "
    "row (the sessionized-sequence alternative shuffles raw events per "
    "step); NULL comparisons make missing steps drop out via 3VL "
    "(q119's semantics, load-bearing here)",
)
def q125_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")

    def first_ts(step):
        return F.min(F.when(F.col("event_type") == step, F.col("ts")))

    f = events.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )

    def cnt(cond):
        return F.count(F.when(cond, F.lit(1))).cast("long")

    step1 = F.col("t_view").isNotNull()
    step2 = step1 & (F.col("t_click") > F.col("t_view"))
    step3 = step2 & (F.col("t_purchase") > F.col("t_click"))
    return f.agg(
        F.count(F.lit(1)).alias("n_users"),
        cnt(step1).alias("n_view"),
        cnt(step2).alias("n_view_click"),
        cnt(step3).alias("n_view_click_purchase"),
    )


# --- retention cohort matrix -------------------------------------------------
@register(
    "q126_retention_cohorts",
    oracle="""
    WITH d AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
      FROM events GROUP BY user_id, wk
    ), c AS (
      SELECT user_id, MIN(wk) AS cohort_wk FROM d GROUP BY user_id
    )
    SELECT c.cohort_wk, d.wk - c.cohort_wk AS offset_wk,
           COUNT(*) AS n_active
    FROM d JOIN c USING (user_id)
    GROUP BY c.cohort_wk, offset_wk
    """,
    notes="retention cohort matrix: users bucketed by first-active week "
    "(epoch-aligned integer weeks — portable, no engine week-start "
    "convention), counted per (cohort, offset); raw events collapse to "
    "distinct (user, week) FIRST so the cohort join and matrix agg "
    "touch user-week rows, not events",
)
def q126_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    wk = F.floor(F.unix_timestamp(F.col("ts")) / 604800).cast("long")
    d = events.select("user_id", wk.alias("wk")).distinct()
    c = d.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        d.join(c, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("offset_wk"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
