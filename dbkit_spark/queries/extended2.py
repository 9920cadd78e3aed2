"""Remaining §2 checklist rows: full/right outer joins (§2.3), LIKE/ILIKE
predicates (§2.2), null-ordering sorts (§2.6), typed JSON parsing (§2.8),
stream-static join (§2.9).

The stream-static join (q63) is the one §2.9 row that was still uncovered:
it replays the events fixture through a file-source stream, joins the
static customer dimension (broadcast — the exact "join with Tiny table"
case the reference anticipated in ``copy_value.rs:101-102``), and must
match the plain batch-join oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import register
from ..operators.aggregate import stable_sum, stable_sum_sql
from ..operators.joins import join
from ..sources import read_table
from ..streaming.runner import read_events_stream, run_available_now


@register(
    "q58_join_full_outer",
    oracle=f"""
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           c.n_rich_cust, s.n_rich_supp,
           COALESCE(c.cust_bal, 0.0) + COALESCE(s.supp_bal, 0.0) AS combined_bal
    FROM (
      SELECT c_nationkey AS nk, COUNT(*) AS n_rich_cust,
             {stable_sum_sql("c_acctbal")} AS cust_bal
      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    ) c
    FULL OUTER JOIN (
      SELECT s_nationkey AS nk, COUNT(*) AS n_rich_supp,
             {stable_sum_sql("s_acctbal")} AS supp_bal
      FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey
    ) s ON c.nk = s.nk
    """,
    notes="full outer join of two filtered aggregates; unmatched sides survive "
    "with NULL marker columns",
)
def q58_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    c = (
        customer.filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_rich_cust"), stable_sum("c_acctbal").alias("cust_bal"))
    )
    s = (
        supplier.filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_rich_supp"), stable_sum("s_acctbal").alias("supp_bal"))
    )
    out = join(c, s.withColumnRenamed("nk", "s_nk"), c["nk"] == F.col("s_nk"), "full")
    return out.select(
        F.coalesce("nk", "s_nk").alias("nationkey"),
        "n_rich_cust",
        "n_rich_supp",
        (
            F.coalesce("cust_bal", F.lit(0.0)) + F.coalesce("supp_bal", F.lit(0.0))
        ).alias("combined_bal"),
    )


@register(
    "q59_join_right_outer",
    oracle="""
    SELECT n.n_name AS nation, s.s_suppkey, s.s_name
    FROM (SELECT * FROM supplier WHERE s_acctbal > 9500) s
    RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    notes="right outer join: every nation survives even with no qualifying "
    "supplier",
)
def q59_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = read_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9500)
    nation = read_table(spark, sf_dir, "nation")
    out = join(
        supplier,
        nation.withColumnRenamed("n_nationkey", "s_nationkey"),
        "s_nationkey",
        "right",
    )
    return out.select(F.col("n_name").alias("nation"), "s_suppkey", "s_name")


@register(
    "q60_like_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_type, p_brand
    FROM part
    WHERE p_type LIKE 'ECO%'
      AND p_brand NOT LIKE 'Brand#1%'
      AND p_name ILIKE '%G_%'
    """,
    notes="LIKE / NOT LIKE / case-insensitive ILIKE (§2.2 predicate algebra)",
)
def q60_like_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").like("ECO%")
        & ~F.col("p_brand").like("Brand#1%")
        & F.col("p_name").ilike("%G_%")
    ).select("p_partkey", "p_name", "p_type", "p_brand")


@register(
    "q61_sort_nulls_ordering",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           NULLIF(o_orderpriority, '1-URGENT') AS prio_or_null
    FROM orders
    ORDER BY prio_or_null ASC NULLS FIRST, o_orderkey
    LIMIT 500
    """,
    notes="explicit NULLS FIRST ordering (§2.6); NULLIF manufactures nulls in "
    "the sort key; unique o_orderkey tiebreak makes the LIMIT deterministic",
)
def q61_sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            "o_orderstatus",
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio_or_null"),
        )
        .orderBy(F.col("prio_or_null").asc_nulls_first(), "o_orderkey")
        .limit(500)
    )


@register(
    "q62_from_json_typed",
    oracle="""
    SELECT event_id,
           CAST(props->>'k' AS INTEGER) AS k,
           CAST(props->>'missing' AS INTEGER) AS absent,
           (props->>'k') IS NOT NULL AS has_k
    FROM events
    """,
    notes="typed JSON parsing: from_json with an explicit struct schema "
    "(missing keys -> typed NULL), vs get_json_object string extraction in q30",
)
def q62_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("missing", T.IntegerType()),
        ]
    )
    parsed = events.withColumn("j", F.from_json("props", schema))
    return parsed.select(
        "event_id",
        F.col("j.k").alias("k"),
        F.col("j.missing").alias("absent"),
        F.col("j.k").isNotNull().alias("has_k"),
    )


@register(
    "q63_stream_static_join",
    oracle=f"""
    SELECT c.c_mktsegment AS segment, COUNT(*) AS n_events,
           {stable_sum_sql("e.value")} AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    notes="stream-static join (§2.9): file-source event stream joined to the "
    "static customer dim (broadcast), windowless global agg, complete mode; "
    "must equal the batch-join oracle",
)
def q63_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir)
    static_dim = F.broadcast(
        read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    joined = stream.join(static_dim, stream["user_id"] == static_dim["c_custkey"])
    agg = joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_events"),
        stable_sum("value").alias("total_value"),
    )
    return run_available_now(agg, output_mode="complete")


@register(
    "q64_salted_join_skew",
    oracle=f"""
    SELECT e.event_type, COUNT(*) AS n, {stable_sum_sql("e.value")} AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE c.c_acctbal > 0
    GROUP BY e.event_type
    """,
    notes="salted skew join (operators/joins.salted_join): deterministic "
    "left-side salt + bounded right replication; result identical to the "
    "plain equi-join oracle",
)
def q64_salted_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import salted_join

    events = read_table(spark, sf_dir, "events").withColumnRenamed(
        "user_id", "c_custkey"
    )
    customer = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey")
    )
    joined = salted_join(events, customer, "c_custkey", salt_buckets=8)
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"), stable_sum("value").alias("total_value")
    )


@register(
    "q65_ann_ivf",
    oracle=None,
    notes="IVF ANN (llm/similarity.ivf_index/ivf_topk): KMeans coarse "
    "quantizer fit on a bounded sample (the 100 TB path — the iterative "
    "fit scales with the sample; assignment is map-only over the corpus), "
    "nprobe-cluster search. Approximate + iterative (KMeans) -> "
    "rows-only for the driver; recall vs exact cosine_topk is "
    "pytest-asserted in tests/test_scale.py",
)
def q65_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import ivf_index, ivf_topk

    emb = read_table(spark, sf_dir, "embeddings")
    # min_fit_rows floor makes this fit on everything at tiny SF (results
    # unchanged) while capping the KMeans input at scale
    assigned, centroids = ivf_index(
        emb, n_clusters=16, fit_sample_fraction=0.25
    )
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(queries, assigned, centroids, k=5, nprobe=3)


@register(
    "q66_stream_stream_join",
    oracle="""
    SELECT c.event_id AS c_id, v.event_id AS v_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id
     AND v.ts BETWEEN c.ts - INTERVAL 5 MINUTE AND c.ts
    """,
    notes="stream-stream interval join (§2.9): both sides watermarked, "
    "5-minute lookback; inner matches emit eagerly so availableNow replay "
    "equals the batch interval-join oracle",
)
def q66_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .select("c_id", "v_id")
    )
    return run_available_now(joined, output_mode="append")


@register(
    "q128_stream_stream_left_outer",
    oracle="""
    WITH c AS (SELECT * FROM events WHERE event_type='click'),
         v AS (SELECT * FROM events WHERE event_type='view'),
         wm AS (SELECT make_timestamp(
                  least((SELECT CAST(floor(epoch_ms(max(ts))) AS BIGINT) FROM c),
                        (SELECT CAST(floor(epoch_ms(max(ts))) AS BIGINT) FROM v)) * 1000
                  - 600000000) AS w)
    SELECT c.event_id AS c_id, v.event_id AS v_id
    FROM c JOIN v ON c.user_id = v.user_id
     AND v.ts BETWEEN c.ts - INTERVAL 5 MINUTE AND c.ts
    UNION ALL
    SELECT c.event_id AS c_id, NULL AS v_id
    FROM c, wm WHERE NOT EXISTS (
        SELECT 1 FROM v WHERE v.user_id = c.user_id
          AND v.ts BETWEEN c.ts - INTERVAL 5 MINUTE AND c.ts)
      AND c.ts < wm.w
    """,
    notes="stream-stream LEFT OUTER interval join with watermark state "
    "eviction (§2.9, completing q66's inner case): matched pairs emit "
    "eagerly; an unmatched click emits null-extended only once the "
    "watermark passes its join window. The oracle encodes Spark's exact "
    "eviction rule: the global watermark is the MIN of the per-side "
    "watermarks (each side's max observed event time, millisecond-"
    "truncated as Spark's EventTimeStats tracks it, minus the 10-minute "
    "delay), and a click emits nulls iff c_ts < that watermark — clicks "
    "inside the final delay window are withheld forever in a bounded "
    "replay, exactly as a real deployment withholds them until more "
    "data arrives",
)
def q128_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .join(views.withWatermark("v_ts", "10 minutes"), cond, "left_outer")
        .select("c_id", "v_id")
    )
    return run_available_now(joined, output_mode="append")



@register(
    "q146_stream_stream_full_outer",
    oracle="""
    WITH c AS (SELECT * FROM events WHERE event_type='click'),
         v AS (SELECT * FROM events WHERE event_type='view'),
         wm AS (SELECT make_timestamp(
                  least((SELECT CAST(floor(epoch_ms(max(ts))) AS BIGINT) FROM c),
                        (SELECT CAST(floor(epoch_ms(max(ts))) AS BIGINT) FROM v)) * 1000
                  - 600000000) AS w)
    SELECT c.event_id AS c_id, v.event_id AS v_id
    FROM c JOIN v ON c.user_id = v.user_id
     AND v.ts BETWEEN c.ts - INTERVAL 5 MINUTE AND c.ts
    UNION ALL
    SELECT c.event_id AS c_id, NULL AS v_id
    FROM c, wm WHERE NOT EXISTS (
        SELECT 1 FROM v WHERE v.user_id = c.user_id
          AND v.ts BETWEEN c.ts - INTERVAL 5 MINUTE AND c.ts)
      AND c.ts < wm.w
    UNION ALL
    SELECT NULL AS c_id, v.event_id AS v_id
    FROM v, wm WHERE NOT EXISTS (
        SELECT 1 FROM c WHERE c.user_id = v.user_id
          AND v.ts BETWEEN c.ts - INTERVAL 5 MINUTE AND c.ts)
      AND v.ts < wm.w - INTERVAL 5 MINUTE
    """,
    notes="stream-stream FULL OUTER interval join (section 2.9, completing "
    "the q66/q128 family): matched pairs emit eagerly, and each side "
    "emits null-extended once the min-of-sides watermark passes its "
    "FULL join window — clicks at c_ts < wm (their view-time window "
    "ends at c_ts), but views only at v_ts < wm - 5 min, because a "
    "view at v_ts can still match future clicks up to c_ts = v_ts + "
    "5 min and Spark keeps it buffered until the watermark clears that "
    "upper bound (probe-verified in tests/test_streaming_extended.py::"
    "test_outer_eviction_rule_dense_fixture with unmatched views "
    "placed inside [wm-5m, wm)); rows inside the final delay window "
    "are withheld in a bounded replay, exactly as in production until "
    "more data arrives",
)
def q146_stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .join(views.withWatermark("v_ts", "10 minutes"), cond, "full_outer")
        .select("c_id", "v_id")
    )
    return run_available_now(joined, output_mode="append")


@register(
    "q152_stream_stream_right_outer",
    oracle="""
    WITH c AS (SELECT * FROM events WHERE event_type='click'),
         v AS (SELECT * FROM events WHERE event_type='view'),
         wm AS (SELECT make_timestamp(
                  least((SELECT CAST(floor(epoch_ms(max(ts))) AS BIGINT) FROM c),
                        (SELECT CAST(floor(epoch_ms(max(ts))) AS BIGINT) FROM v)) * 1000
                  - 600000000) AS w)
    SELECT c.event_id AS c_id, v.event_id AS v_id
    FROM c JOIN v ON c.user_id = v.user_id
     AND v.ts BETWEEN c.ts - INTERVAL 5 MINUTE AND c.ts
    UNION ALL
    SELECT NULL AS c_id, v.event_id AS v_id
    FROM v, wm WHERE NOT EXISTS (
        SELECT 1 FROM c WHERE c.user_id = v.user_id
          AND v.ts BETWEEN c.ts - INTERVAL 5 MINUTE AND c.ts)
      AND v.ts < wm.w - INTERVAL 5 MINUTE
    """,
    notes="stream-stream RIGHT OUTER interval join (completing the "
    "q66/q128/q146 outer family): matched pairs emit eagerly; unmatched "
    "views emit null-extended only at v_ts < watermark - 5 min — the "
    "buffered view side is held until the watermark clears its FULL "
    "click-time window (upper bound v_ts + 5 min), probe-verified "
    "against Spark with unmatched views inside [wm-5m, wm); clicks "
    "never null-extend",
)
def q152_stream_stream_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .join(views.withWatermark("v_ts", "10 minutes"), cond, "right_outer")
        .select("c_id", "v_id")
    )
    return run_available_now(joined, output_mode="append")

_TOKS_SQL = """
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS t
  FROM documents
"""

# 24-bit md5 token value, digit-by-digit (DuckDB has no conv())
_TOKHASH_SQL = (
    "CAST(list_sum(list_transform(generate_series(1, 6), "
    "i -> CAST((strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 1) AS BIGINT) "
    "* CAST(pow(16, 6 - i) AS BIGINT))) AS BIGINT)"
)


@register(
    "q67_rolling_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
                          list_transform(t, tok -> {_TOKHASH_SQL})),
             (acc, x) -> (acc * 257 + x) % 2147483647) AS fp
    FROM ({_TOKS_SQL})
    """,
    notes="order-sensitive Rabin-Karp rolling hash over token sequence "
    "(functions/text.rolling_fingerprint); complements q48's order-invariant "
    "set fingerprint; md5-portable fold, JVM-side",
)
def q67_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import rolling_fingerprint, tokens

    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "text").select(
        "doc_id", rolling_fingerprint(tokens("text")).alias("fp")
    )


@register(
    "q68_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe,
           len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS n_ws,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE round(CAST(length(text) AS DOUBLE)
                     / greatest(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')), 1), 6)
           END AS chars_per_tok
    FROM documents
    """,
    notes="token-counting estimators: BPE-ish regex (alpha runs / digit runs "
    "/ punct marks) vs whitespace tokens; chars-per-token ratio",
)
def q68_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import bpe_token_count, token_count

    docs = read_table(spark, sf_dir, "documents")
    n_bpe = bpe_token_count("text")
    return docs.select(
        "doc_id",
        n_bpe.alias("n_bpe"),
        token_count("text").cast("long").alias("n_ws"),
        F.when(F.length("text") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.length("text").cast("double") / F.greatest(n_bpe, F.lit(1)), 6
            )
        )
        .alias("chars_per_tok"),
    )


@register(
    "q69_set_split_fused",
    oracle="""
    WITH a AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'A'),
         r AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT 'both' AS tag, l_orderkey FROM (SELECT l_orderkey FROM a INTERSECT SELECT l_orderkey FROM r)
    UNION ALL
    SELECT 'only_a' AS tag, l_orderkey FROM (SELECT l_orderkey FROM a EXCEPT SELECT l_orderkey FROM r)
    UNION ALL
    SELECT 'only_r' AS tag, l_orderkey FROM (SELECT l_orderkey FROM r EXCEPT SELECT l_orderkey FROM a)
    """,
    notes="fused single-shuffle rewrite of q05's 3-way set split "
    "(operators/setops.set_split_tags): one scan + one groupBy replaces 2 "
    "distincts + 3 set-op shuffles; same oracle as q05",
)
def q69_set_split_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.setops import set_split_tags

    li = read_table(spark, sf_dir, "lineitem")
    return set_split_tags(
        li.select("l_orderkey", "l_returnflag"),
        ["l_orderkey"],
        F.col("l_returnflag") == "A",
        F.col("l_returnflag") == "R",
        tags=("both", "only_a", "only_r"),
    )


@register(
    "q70_argminmax",
    oracle="""
    SELECT o_custkey,
           arg_min(o_orderkey, o_orderdate ORDER BY o_orderkey) AS first_order_key,
           arg_max(o_orderkey, o_orderdate ORDER BY o_orderkey DESC) AS last_order_key,
           MIN(o_orderdate) AS first_date,
           MAX(o_orderdate) AS last_date
    FROM orders
    GROUP BY o_custkey
    """,
    notes="deterministic first/last per group (§2.4): min_by/max_by == "
    "DuckDB arg_min/arg_max; F.first/F.last are order-nondeterministic in a "
    "distributed agg, so the engine's 'first' is value-ordered, not "
    "arrival-ordered",
)
def q70_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    # tie-break on orderkey so min_by/max_by are total-order deterministic:
    # pack (date, key) into a struct and take min/max of the struct
    return orders.groupBy("o_custkey").agg(
        F.min(F.struct("o_orderdate", "o_orderkey"))["o_orderkey"].alias(
            "first_order_key"
        ),
        F.max(F.struct("o_orderdate", "o_orderkey"))["o_orderkey"].alias(
            "last_order_key"
        ),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


@register(
    "q71_python_udtf",
    oracle="""
    SELECT o.o_orderkey, s.part AS installment, round(o.o_totalprice / 4, 6) AS amount
    FROM orders o, (SELECT unnest(generate_series(1, 4)) AS part) s
    WHERE o.o_totalprice > 400000
    """,
    notes="Python UDTF (§2.10, table function): one input row -> 4 "
    "installment rows; lateral-join shape, mirrored by unnest in the oracle",
)
def q71_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="installment: long, amount: double")
    class Installments:
        """Arrow-evaluated table function: emits 4 equal installments per
        order — the UDTF analogue of the reference's batch expression
        cursor (one input batch -> many output rows)."""

        def eval(self, total: float):
            for i in range(1, 5):
                yield i, round(total / 4, 6)

    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    spark.udtf.register("installments", Installments)
    orders.select("o_orderkey", "o_totalprice").createOrReplaceTempView("big_orders")
    return spark.sql(
        """
        SELECT b.o_orderkey, t.installment, t.amount
        FROM big_orders b, LATERAL installments(b.o_totalprice) t
        """
    )


@register(
    "q72_frame_sample",
    # Oracle (r10, VERDICT item 6 — formerly rows-only): the query's
    # output is (doc_id, frame_idx, frame_len) — no bytes cross the
    # compare boundary, and the payload LENGTH is a closed-form function
    # of doc_id (BMP: 54-byte headers + 4-padded rows; PPM: "P6\n{w}
    # {h}\n255\n" header + 3wh pixels), so DuckDB derives every frame
    # length independently: step = L // 4, and since 4*step <= L every
    # one of the 4 contiguous slices has exactly step bytes. Byte-exact
    # frame CONTENT stays pytest-asserted in test_llm.py (DuckDB 1.0
    # lacks BLOB substring).
    oracle="""
    WITH dims AS (
      SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
      FROM documents
    ),
    lens AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
               THEN 54 + (3 * w + (4 - (3 * w) % 4) % 4) * h
               ELSE 9 + length(CAST(w AS VARCHAR))
                      + length(CAST(h AS VARCHAR)) + 3 * w * h
             END AS L
      FROM dims
    )
    SELECT doc_id, CAST(t.i AS INTEGER) AS frame_idx,
           CAST(L // 4 AS BIGINT) AS frame_len
    FROM lens, UNNEST(generate_series(0, 3)) AS t(i)
    """,
    notes="multimodal frame sampling (llm/multimodal.sample_frames): one "
    "binary payload row (REAL BMP/PPM bytes, see q85) fans out to 4 frame "
    "rows via mapInPandas, no shuffle; frame slicing is content-agnostic, "
    "plumbing real. Oracle replays the closed-form payload-length rule "
    "(BMP row padding / PPM header arithmetic) and the step slicing; "
    "byte-exact frame content is pytest-asserted in test_llm.py",
)
def q72_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.multimodal import sample_frames, with_image_payload

    docs = read_table(spark, sf_dir, "documents")
    return sample_frames(with_image_payload(docs), n_frames=4).select(
        "doc_id", "frame_idx", "frame_len"
    )


_EPOCH = "TIMESTAMP '1970-01-01 00:00:00'"


def _bin(sec: int) -> str:
    return (
        f"{_EPOCH} + to_seconds(CAST(floor(epoch(ts) / {sec}) * {sec} AS BIGINT))"
    )


def _rollup_level_sql(sec: int, label: str) -> str:
    return f"""
    SELECT {_bin(sec)} AS bucket, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total,
           MIN(value) AS vmin, MAX(value) AS vmax,
           '{label}' AS resolution
    FROM events GROUP BY bucket, event_type
    """


@register(
    "q73_rollup_hierarchy",
    oracle=" UNION ALL ".join(
        [
            _rollup_level_sql(300, "5 minutes"),
            _rollup_level_sql(3600, "1 hour"),
            _rollup_level_sql(86400, "1 day"),
        ]
    ),
    notes="multi-resolution rollup (operators/rollup_hierarchy): 1h level "
    "aggregates the 5m partials, 1d aggregates 1h — each coarser level "
    "reads the previous level's output, not raw data (the continuous-"
    "aggregate trick; at 100 TB raw is scanned once, not once per level). "
    "Decimal-carried sums make hierarchical == direct, bit-exactly; the "
    "oracle computes each level directly from raw",
)
def q73_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregate import dec
    from ..operators.rollup_hierarchy import rollup_hierarchy

    events = read_table(spark, sf_dir, "events").withColumn(
        "value", dec("value", 6)
    )
    out = rollup_hierarchy(
        events, "ts", ["event_type"], "value",
        resolutions=("5 minutes", "1 hour", "1 day"),
    )
    # min/max of the decimal-cast input stays decimal(25,6) in Spark while
    # the oracle's MIN/MAX(value) is DOUBLE — cast all three value columns.
    return (
        out.withColumn("total", F.col("total").cast("double"))
        .withColumn("vmin", F.col("vmin").cast("double"))
        .withColumn("vmax", F.col("vmax").cast("double"))
    )


@register(
    "q74_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_name, c_acctbal + 1000.0 AS c_acctbal
      FROM customer WHERE c_custkey < 50
      UNION ALL
      SELECT s_suppkey + 1000000 AS c_custkey, s_name AS c_name,
             s_acctbal AS c_acctbal
      FROM supplier
    )
    SELECT t.c_custkey, t.c_name, t.c_acctbal
    FROM customer t
    WHERE t.c_custkey NOT IN (SELECT c_custkey FROM updates)
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal FROM updates
    """,
    notes="MERGE/upsert as a DataFrame transform (operators/rollup_hierarchy"
    ".merge_upsert): updated keys replaced, new keys inserted, others pass "
    "through; key-uniqueness of updates enforced eagerly (multi-match MERGE "
    "is nondeterministic)",
)
def q74_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rollup_hierarchy import merge_upsert

    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    supplier = read_table(spark, sf_dir, "supplier")
    updates = (
        customer.filter(F.col("c_custkey") < 50)
        .withColumn("c_acctbal", F.col("c_acctbal") + 1000.0)
        .unionByName(
            supplier.select(
                (F.col("s_suppkey") + 1000000).alias("c_custkey"),
                F.col("s_name").alias("c_name"),
                F.col("s_acctbal").alias("c_acctbal"),
            )
        )
    )
    return merge_upsert(customer, updates, keys=["c_custkey"])


def _profile_col_sql(c: str) -> str:
    return f"""
    SELECT '{c}' AS "column", COUNT(*) AS n,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_str,
           CAST(MAX({c}) AS VARCHAR) AS max_str
    FROM orders
    """


@register(
    "q75_profile_table",
    oracle=" UNION ALL ".join(
        _profile_col_sql(c)
        for c in ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    ),
    notes="one-pass per-column data-quality profile (operators/profile): "
    "all columns' n/null/distinct/min/max in a single aggregation + "
    "explode-unpivot (a union-of-projections would re-run the agg per "
    "column); ingest-gating tool for training pipelines",
)
def q75_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_table

    orders = read_table(spark, sf_dir, "orders")
    # exact_distinct opt-in: the API default is approx (the 100 TB path);
    # the oracle computes exact COUNT(DISTINCT), so this query pins exact.
    return profile_table(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
        exact_distinct=True,
    )


# md5-derived split bucket in [0, 10000): same formula as
# llm/sampling._hash_bucket, rebuilt digit-by-digit for DuckDB
def _bucket_sql(salt: str) -> str:
    """Salted md5 bucket in [0, 10000): mirrors llm/sampling._hash_bucket
    (the salt decorrelates the sample bucket from the split bucket)."""
    keyed = f"concat(CAST(doc_id AS VARCHAR), ':{salt}')"
    return (
        "(CAST(list_sum(list_transform(generate_series(1, 6), "
        f"i -> CAST((strpos('0123456789abcdef', substr(md5({keyed}), i, 1)) - 1) AS BIGINT) "
        "* CAST(pow(16, 6 - i) AS BIGINT))) AS BIGINT) % 10000)"
    )


@register(
    "q76_split_and_sample",
    oracle=f"""
    WITH b AS (SELECT doc_id, lang,
                      {_bucket_sql("sample")} AS sample_bucket,
                      {_bucket_sql("split")} AS split_bucket
               FROM documents)
    SELECT doc_id, lang,
           CASE WHEN split_bucket < 8000 THEN 'train'
                WHEN split_bucket < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    WHERE (lang = 'en' AND sample_bucket < 5000)
       OR (lang = 'de' AND sample_bucket < 10000)
    """,
    notes="deterministic train/val/test split + stratified sampling "
    "(llm/sampling): md5-bucket assignment is stable under reruns, "
    "repartitioning, and appends — unlike randomSplit/sampleBy, whose "
    "seeded sampling shifts with input partitioning",
)
def q76_split_and_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.sampling import split_assign, stratified_sample

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    sampled = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "de": 1.0}
    )
    return split_assign(
        sampled, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )


@register(
    "q91_domain_mix",
    oracle=f"""
    WITH w(lang, wt) AS (VALUES ('en', 2), ('de', 1), ('es', 1),
                                ('fr', 1), ('zh', 1)),
    counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    cw AS (SELECT c.lang, c.n, w.wt FROM counts c JOIN w USING (lang)),
    thresh AS (SELECT a.lang, min((10000 * a.wt * b.n) // (b.wt * a.n)) AS th
               FROM cw a CROSS JOIN cw b GROUP BY a.lang)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN thresh t ON t.lang = d.lang
    WHERE {_bucket_sql("mix")} < t.th
    """,
    notes="target domain-mix rebalancing (llm/sampling.weighted_domain_mix): "
    "keeps the scarcest-relative-to-weight domain at 100% and "
    "hash-down-samples the rest to a 2:1:1:1:1 lang mix; thresholds are "
    "exact integer arithmetic (min_e (B*w_d*n_e) // (w_e*n_d)) so both "
    "engines reproduce the row set bit-for-bit; map-only filter after a "
    "metadata-sized count agg (the tiny cross join is domains x domains)",
)
def q91_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.sampling import weighted_domain_mix

    docs = read_table(spark, sf_dir, "documents")
    mixed = weighted_domain_mix(
        docs, "doc_id", "lang", {"en": 2, "de": 1, "es": 1, "fr": 1, "zh": 1}
    )
    return mixed.select("doc_id", "lang", "source")


@register(
    "q77_token_packing",
    oracle="""
    SELECT doc_id, n_chars,
           CAST(floor((SUM(n_chars) OVER (ORDER BY doc_id) - n_chars)
                      / 50000.0) AS BIGINT) AS batch_id
    FROM documents
    """,
    notes="sequence packing (llm/sampling.pack_by_token_budget): "
    "concat-then-chunk by running-total start offset — each doc joins the "
    "50k-char batch where its stream offset falls; window cumsum, "
    "deterministic. This is the EXACTNESS BASELINE (explicit "
    "shard_by=None, single total order); the operator DEFAULT is the "
    "auto hash shard — q84's distributed plan — so the 100 TB form is "
    "what callers get by accident",
)
def q77_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.sampling import pack_by_token_budget

    docs = read_table(spark, sf_dir, "documents")
    return pack_by_token_budget(
        docs, "doc_id", "n_chars", budget=50000, shard_by=None
    )


@register(
    "q84_token_packing_sharded",
    oracle="""
    SELECT lang, doc_id, n_chars,
           CAST(floor((SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id)
                       - n_chars) / 20000.0) AS BIGINT) AS batch_id
    FROM documents
    """,
    notes="sharded sequence packing (llm/sampling.pack_by_token_budget "
    "shard_by): the cumsum window partitions on the shard key, so packing "
    "distributes across reducers — no single-partition Exchange (plan-"
    "asserted in tests/test_plans.py); the 100 TB form of q77",
)
def q84_token_packing_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.sampling import pack_by_token_budget

    docs = read_table(spark, sf_dir, "documents")
    return pack_by_token_budget(
        docs, "doc_id", "n_chars", budget=20000, shard_by="lang"
    )


@register(
    "q78_dedup_incremental",
    oracle="""
    WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t)-2),
         i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
  FROM (
  SELECT doc_id, text, lang, source, n_chars,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS t
  FROM documents
) WHERE len(t) >= 3
),
    shx AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    hx AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(generate_series(1, 12),
                  i -> CAST((strpos('0123456789abcdef', substr(md5(shingle), i, 1)) - 1) AS BIGINT)
                       * CAST(pow(16, 12 - i) AS BIGINT))) AS BIGINT) AS x
      FROM shx
    ),
    sig AS (
      SELECT doc_id, list_value(min((3*x + 12345) % 281474976710597), min((5*x + 1012348) % 281474976710597), min((7*x + 2012351) % 281474976710597), min((11*x + 3012354) % 281474976710597), min((13*x + 4012357) % 281474976710597), min((17*x + 5012360) % 281474976710597), min((19*x + 6012363) % 281474976710597), min((23*x + 7012366) % 281474976710597), min((29*x + 8012369) % 281474976710597), min((31*x + 9012372) % 281474976710597), min((37*x + 10012375) % 281474976710597), min((41*x + 11012378) % 281474976710597), min((43*x + 12012381) % 281474976710597), min((47*x + 13012384) % 281474976710597), min((53*x + 14012387) % 281474976710597), min((59*x + 15012390) % 281474976710597)) AS sig
      FROM hx GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, unnest(list_transform(generate_series(0, 7),
             b -> md5(concat_ws('#', CAST(b AS VARCHAR), CAST(sig[2*b+1] AS VARCHAR), CAST(sig[2*b+2] AS VARCHAR)))))
             AS band_key
      FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band_key = b.band_key
      WHERE a.doc_id % 5 = 0
        AND (b.doc_id % 5 <> 0 OR (b.doc_id % 5 = 0 AND a.doc_id < b.doc_id))
        AND a.doc_id <> b.doc_id
    )
    SELECT c.doc_a, c.doc_b, round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
    FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))) >= 0.5
    """,
    notes="incremental append-batch dedup (llm/dedup.minhash_incremental_"
    "pairs): new docs (doc_id % 5 == 0) band-join against the corpus index "
    "+ in-batch pairs; corpus x corpus never computed — work scales with "
    "the batch, not the 100 TB corpus",
)
def q78_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import minhash_incremental_pairs

    docs = read_table(spark, sf_dir, "documents")
    new_docs = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    out = minhash_incremental_pairs(corpus, new_docs, threshold=0.5)
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


@register(
    "q79_zorder_clustering",
    # Oracle (r10, VERDICT item 6 — formerly rows-only): the replayable
    # z-order variant derives boundaries from an md5-deterministic
    # sample (u32(md5(key ':zorder')) < floor(0.3*2^32) = 1288490188)
    # and type-1 quantile ORDER STATISTICS (rank ceil(i*n/256) — exact:
    # i*n fits a double and /256 is a power-of-two division), so DuckDB
    # replays sample, boundaries, bisect count, and Morton interleave
    # bit-for-bit. The default zorder_value (random bounded sample)
    # stays the rewrite throughput path; its pruning win is
    # pytest-measured in tests/test_scale.py.
    oracle="""
    WITH samp AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS v1,
             CAST(o_custkey AS DOUBLE) AS v2
      FROM orders
      WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                                     || ':zorder'), 1, 8)) AS BIGINT)
            < 1288490188
    ),
    nn AS (SELECT COUNT(*) AS n FROM samp),
    idx AS (SELECT UNNEST(generate_series(1, 255)) AS i),
    r1 AS (SELECT v1 AS v, row_number() OVER (ORDER BY v1) AS rn FROM samp),
    r2 AS (SELECT v2 AS v, row_number() OVER (ORDER BY v2) AS rn FROM samp),
    b1 AS (
      SELECT i, (SELECT MIN(v) FROM r1
                 WHERE rn = CAST(ceil(i * nn.n / 256.0) AS BIGINT)) AS b
      FROM idx, nn
    ),
    b2 AS (
      SELECT i, (SELECT MIN(v) FROM r2
                 WHERE rn = CAST(ceil(i * nn.n / 256.0) AS BIGINT)) AS b
      FROM idx, nn
    ),
    bk AS (
      SELECT o.o_orderkey,
             LEAST((SELECT COUNT(*) FROM b1
                    WHERE b1.b <= CAST(o.o_totalprice AS DOUBLE)),
                   255) AS k1,
             LEAST((SELECT COUNT(*) FROM b2
                    WHERE b2.b <= CAST(o.o_custkey AS DOUBLE)),
                   255) AS k2
      FROM orders o
    )
    SELECT o_orderkey,
           CAST((
             (((k1 >> 0) & 1) << 0)  + (((k2 >> 0) & 1) << 1)  +
             (((k1 >> 1) & 1) << 2)  + (((k2 >> 1) & 1) << 3)  +
             (((k1 >> 2) & 1) << 4)  + (((k2 >> 2) & 1) << 5)  +
             (((k1 >> 3) & 1) << 6)  + (((k2 >> 3) & 1) << 7)  +
             (((k1 >> 4) & 1) << 8)  + (((k2 >> 4) & 1) << 9)  +
             (((k1 >> 5) & 1) << 10) + (((k2 >> 5) & 1) << 11) +
             (((k1 >> 6) & 1) << 12) + (((k2 >> 6) & 1) << 13) +
             (((k1 >> 7) & 1) << 14) + (((k2 >> 7) & 1) << 15)
           ) AS BIGINT) AS __z
    FROM bk
    """,
    notes="z-order/Morton clustering (operators/zorder."
    "zorder_value_replayable): equi-depth rank buckets from "
    "md5-deterministic-sample ORDER-STATISTIC boundaries (type-1 "
    "quantiles at rank ceil(i*n/256) — element picks, never "
    "interpolation, so every boundary is bit-exact cross-engine) + "
    "map-side 8-bit bisect + Morton interleave -> multi-dimensional "
    "data skipping; the oracle replays sample, boundaries, bucket "
    "counts and the interleave exactly. The random-sample "
    "zorder_value stays the table-rewrite throughput path "
    "(tests/test_scale.py measures its pruning win)",
)
def q79_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.zorder import zorder_value_replayable

    orders = read_table(spark, sf_dir, "orders")
    return zorder_value_replayable(
        orders, ["o_totalprice", "o_custkey"], key_col="o_orderkey"
    ).select("o_orderkey", "__z")


@register(
    "q80_tpch_q3_shipping",
    oracle=f"""
    SELECT l.l_orderkey, {stable_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    notes="TPC-H Q3-shaped (shipping priority): 3-way join, filtered both "
    "sides before the join (pushdown), top-10 by revenue via "
    "TakeOrderedAndProject; o_orderpriority stands in for the fixture's "
    "missing o_shippriority",
)
def q80_tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    joined = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q81_tpch_q5_local_supplier",
    oracle=f"""
    SELECT n.n_name AS nation,
           {stable_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1995-01-01'
      AND o.o_orderdate < DATE '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
    notes="TPC-H Q5-shaped (local supplier volume): 6-table join; "
    "nation+region broadcast, customer-supplier co-nationality predicate; "
    "fact joins shuffle on keys with AQE",
)
def q81_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .join(
            supplier,
            (li["l_suppkey"] == supplier["s_suppkey"])
            & (customer["c_nationkey"] == supplier["s_nationkey"]),
        )
        .join(F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc())
    )


@register(
    "q82_map_advanced",
    oracle="""
    SELECT event_id,
           cardinality(map_concat(MAP {'type': event_type},
                                  MAP {'uid': CAST(user_id AS VARCHAR)})) AS n_keys,
           (map_concat(MAP {'type': event_type},
                       MAP {'uid': CAST(user_id AS VARCHAR)})['uid'])[1] AS uid_val,
           len(list_filter(map_entries(map_concat(MAP {'type': event_type},
                                                  MAP {'uid': CAST(user_id AS VARCHAR)})),
               e -> e.key = 'type')) AS n_type_keys
    FROM events
    """,
    notes="advanced map surface (§2.8): map_concat + size + element_at + "
    "map_filter, scalar-projected for cross-engine compare (map VALUES "
    "render differently per engine; scalars don't)",
)
def q82_map_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    m1 = F.create_map(F.lit("type"), F.col("event_type"))
    m2 = F.create_map(F.lit("uid"), F.col("user_id").cast("string"))
    merged = F.map_concat(m1, m2)
    return events.select(
        "event_id",
        F.size(merged).alias("n_keys"),
        F.element_at(merged, "uid").alias("uid_val"),
        F.size(F.map_filter(merged, lambda k, v: k == "type")).alias("n_type_keys"),
    )


@register(
    "q93_tpch_q17_small_qty",
    oracle="""
    SELECT round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0, 6) AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND 5 * CAST(l.l_quantity AS DECIMAL(18,2))
            * (SELECT COUNT(*) FROM lineitem l2
               WHERE l2.l_partkey = p.p_partkey)
          < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) FROM lineitem l2
             WHERE l2.l_partkey = p.p_partkey)
    """,
    notes="TPC-H Q17-shaped (small-quantity revenue): correlated scalar "
    "subqueries over the probe side — exercises Catalyst decorrelation "
    "(RewriteCorrelatedScalarSubquery -> aggregate + join, no per-row "
    "re-execution). The quantity threshold l_quantity < 0.2*avg is "
    "rewritten as 5*qty*cnt < sum in DECIMAL so the cutoff is exact "
    "integer-ish arithmetic in both engines (a double avg could flip a "
    "boundary row); revenue decimal-stabilized",
)
def q93_tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # via spark.sql on temp views: the correlated-subquery surface is the
    # point — the DataFrame rewrite (join against a groupBy) is what
    # Catalyst decorrelates this into anyway
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q93_lineitem")
    read_table(spark, sf_dir, "part").createOrReplaceTempView("q93_part")
    return spark.sql("""
        SELECT round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     / 7.0, 6) AS avg_yearly,
               COUNT(*) AS n_small
        FROM q93_lineitem l JOIN q93_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#11'
          AND 5 * CAST(l.l_quantity AS DECIMAL(18,2))
                * (SELECT COUNT(*) FROM q93_lineitem l2
                   WHERE l2.l_partkey = p.p_partkey)
              < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                 FROM q93_lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """)
