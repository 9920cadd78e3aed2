"""Scalar expression & function queries (SURVEY.md §2.8): strings, math,
date/time, conditional, JSON, arrays — resolving the reference's stubbed
``CastExpr``/``ToStr`` surface (``convert.rs:13-34``) with ANSI casts.

Cross-engine discipline: transcendentals (ln/exp) rounded to 9dp;
array-fold results rounded to 6dp; everything else exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.vectors import cosine, dot, norm
from ..operators.aggregate import rounded, stable_sum, stable_sum_sql
from ..sources import read_table


@register(
    "q26_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           lower(p_type) AS type_l,
           substr(p_name, 1, 8) AS name8,
           length(p_name) AS name_len,
           trim(concat('  ', p_name, '  ')) AS name_trim,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_pad,
           string_split(p_type, ' ')[1] AS type_head,
           regexp_extract(p_type, '([a-z]+)$', 1) AS type_tail,
           replace(p_brand, 'Brand', 'B') AS brand_short,
           concat(p_brand, '#', p_type) AS brand_type,
           CAST(p_partkey AS VARCHAR) AS key_str
    FROM part
    """,
    notes="string surface + the reference's working ToStr (cast-to-string, "
    "convert.rs:45-136) as key_str",
)
def q26_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_pad"),
        F.split(F.col("p_type"), " ")[0].alias("type_head"),
        F.regexp_extract("p_type", "([a-z]+)$", 1).alias("type_tail"),
        F.regexp_replace("p_brand", "Brand", "B").alias("brand_short"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.col("p_partkey").cast("string").alias("key_str"),
    )


@register(
    "q27_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           round(l_extendedprice, 1) AS price_r1,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           l_quantity * l_quantity AS qty_sq,
           sqrt(l_extendedprice) AS price_sqrt,
           round(ln(l_extendedprice), 9) AS price_ln,
           round(exp(l_discount), 9) AS disc_exp,
           l_orderkey % 7 AS key_mod,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
    notes="math surface; ln/exp rounded 9dp (libm last-bit variance), "
    "sqrt exact (IEEE), x*x instead of pow for exactness",
)
def q27_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 9).alias("price_ln"),
        F.round(F.exp("l_discount"), 9).alias("disc_exp"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@register(
    "q28_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mo,
           EXTRACT(day FROM o_orderdate) AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 5 DAY AS plus5,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate
    FROM orders
    """,
    notes="temporal surface (a full gap in the reference: no temporal types "
    "in types.rs:19-29)",
)
def q28_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 5 DAYS")).alias("plus5"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        # ISO string, not DATE: pandas renders Spark DATE as object-of-date
        # but DuckDB DATE as datetime64 — scalar strings compare cleanly.
        F.col("o_orderdate").cast("date").cast("string").alias("odate"),
    )


@register(
    "q29_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS size_tier,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_x,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
    notes="CASE WHEN / coalesce / nullif / if",
)
def q29_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_tier"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_x"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    )


@register(
    "q30_json_extract",
    oracle=f"""
    SELECT CAST(props->>'k' AS INTEGER) AS k,
           COUNT(*) AS n,
           {stable_sum_sql("value")} AS total_value
    FROM events
    GROUP BY k
    """,
    notes="JSON extraction from the events.props string column",
)
def q30_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("int").alias("k"), "value"
        )
        .groupBy("k")
        .agg(F.count("*").alias("n"), stable_sum("value").alias("total_value"))
    )


@register(
    "q31_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           round(CAST(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE), 6) AS sq_norm,
           round(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), list_reverse(list_transform(embedding, x -> CAST(x AS DOUBLE)))), 6) AS self_rev_dot,
           CAST(list_contains(embedding, CAST(0.0 AS FLOAT)) AS BOOLEAN) AS has_zero
    FROM embeddings
    """,
    notes="array lambdas: size/element_at/aggregate/zip_with+reverse/contains; "
    "folds rounded 6dp",
)
def q31_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    sq = F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    rev_dot = F.aggregate(
        F.zip_with(e, F.reverse(e), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return emb.select(
        "vec_id",
        F.size(e).cast("long").alias("dim"),
        F.element_at(e, 1).cast("double").alias("first_val"),
        F.round(sq, 6).alias("sq_norm"),
        F.round(rev_dot, 6).alias("self_rev_dot"),
        F.array_contains(e, F.lit(0.0).cast("float")).alias("has_zero"),
    )


@register(
    "q32_explode_words",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (
      SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
      FROM documents
    ) t
    WHERE length(token) > 3
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
    notes="explode (flatMap) + word-count over documents; top-20 tiebroken",
)
def q32_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token")
        )
        .filter(F.length("token") > 3)
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "q33_vector_cosine_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)), list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    """,
    notes="pairwise cosine via zip_with/aggregate (JVM-side, no UDF)",
)
def q33_vector_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select((F.col("vec_id") - 1).alias("id_a"), F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("eb"))
    return (
        a.join(b, "id_a")
        .select("id_a", "id_b", F.round(cosine("ea", "eb"), 6).alias("cos_sim"))
    )


@register(
    "q86_cast_matrix",
    oracle="""
    SELECT o_orderkey,
           CAST(trunc(o_totalprice) AS INT) AS d2i,
           CAST(trunc(-o_totalprice) AS INT) AS d2i_neg,
           CAST(trunc(o_totalprice) AS BIGINT) AS d2l,
           CAST(o_orderkey AS VARCHAR) AS i2s,
           TRY_CAST(CAST(o_orderkey AS VARCHAR) AS INT) AS s2i_ok,
           TRY_CAST('x' || CAST(o_orderkey AS VARCHAR) AS INT) AS s2i_bad,
           TRY_CAST(o_orderkey * 3000000000 AS INT) AS l2i_over,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS d2dec_s,
           CAST(trunc(o_totalprice) AS INT) AS dec2i,
           CAST('1.5e' || CAST(o_orderkey % 3 AS VARCHAR) AS DOUBLE) AS s2d_sci,
           TRY_CAST(CAST(o_totalprice AS VARCHAR) || 'junk' AS DOUBLE) AS s2d_bad,
           CAST(CAST(o_orderkey % 2 AS INT) AS BOOLEAN) AS i2b,
           CAST(CAST(o_orderkey % 256 AS FLOAT) AS DOUBLE) AS i2f2d
    FROM orders
    """,
    notes="cast-matrix (reference CastExpr stub, expression/convert.rs:13-34): "
    "int/long/float/double/decimal/string/bool casts incl. overflow (try_cast "
    "-> NULL, both engines), bad-string parses, scientific notation, and the "
    "documented semantic divergence: Spark ANSI truncates double/decimal->int "
    "toward zero while DuckDB rounds — the oracle encodes Spark's semantics "
    "via trunc(), making the intended behavior explicit and testable",
)
def q86_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    okey = F.col("o_orderkey")
    price = F.col("o_totalprice")
    dec = price.cast("decimal(18,2)")
    return orders.select(
        "o_orderkey",
        price.cast("int").alias("d2i"),
        (-price).cast("int").alias("d2i_neg"),
        price.cast("long").alias("d2l"),
        okey.cast("string").alias("i2s"),
        okey.cast("string").try_cast("int").alias("s2i_ok"),
        F.concat(F.lit("x"), okey.cast("string")).try_cast("int").alias("s2i_bad"),
        (okey * F.lit(3000000000).cast("long")).try_cast("int").alias("l2i_over"),
        dec.cast("string").alias("d2dec_s"),
        dec.cast("int").alias("dec2i"),
        F.concat(F.lit("1.5e"), (okey % 3).cast("string"))
        .cast("double")
        .alias("s2d_sci"),
        F.concat(price.cast("string"), F.lit("junk"))
        .try_cast("double")
        .alias("s2d_bad"),
        (okey % 2).cast("int").cast("boolean").alias("i2b"),
        (okey % 256).cast("float").cast("double").alias("i2f2d"),
    )
