"""Degenerate-input robustness: empty frames, single rows, empty text,
and empty join sides through the operator surface. At 100 TB some
partition, some day, WILL be empty — operators must return empty/identity
results, not throw."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbkit_spark.llm.dedup import minhash_near_dup_pairs
from dbkit_spark.llm.sampling import pack_by_token_budget, split_assign
from dbkit_spark.llm.similarity import cosine_topk
from dbkit_spark.operators.joins import asof_join, range_join, salted_join
from dbkit_spark.operators.profile import profile_table
from dbkit_spark.operators.rollup_hierarchy import merge_upsert
from dbkit_spark.operators.setops import set_split_tags


def _empty(spark, ddl):
    return spark.createDataFrame([], ddl)


def test_empty_aggregation_and_windows(spark):
    e = _empty(spark, "k long, v double")
    assert e.groupBy("k").agg(F.sum("v")).count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("v")
    assert e.withColumn("rn", F.row_number().over(w)).count() == 0


def test_empty_join_sides(spark):
    e = _empty(spark, "k long, v double")
    full = spark.createDataFrame([(1, 1.0)], "k long, v double")
    assert full.join(e.withColumnRenamed("v", "w"), "k").count() == 0
    assert full.join(e.withColumnRenamed("v", "w"), "k", "left").count() == 1
    assert salted_join(full, e.select("k"), "k").count() == 0
    assert salted_join(e, full.select("k"), "k").count() == 0


def test_asof_and_range_join_empty_right(spark):
    left = spark.createDataFrame([(1, "2024-01-01 10:00:00")], "k long, t string").select(
        "k", F.col("t").cast("timestamp").alias("t")
    )
    empty_right = _empty(spark, "k long, t timestamp, v double")
    out = asof_join(left, empty_right, on_key="k", on_time="t")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].v is None  # left preserved, no match
    l2 = spark.createDataFrame([(5.0,)], "x double")
    r2 = _empty(spark, "lo double, hi double, tag string")
    assert range_join(l2, r2, "x", "lo", "hi", bin_size=1.0).count() == 0


def test_dedup_and_similarity_on_empty_and_tiny(spark):
    empty_docs = _empty(spark, "doc_id long, text string")
    assert minhash_near_dup_pairs(empty_docs).count() == 0
    # doc shorter than the shingle width: no shingles, no pairs, no throw
    tiny = spark.createDataFrame([(1, "hi"), (2, "hi")], "doc_id long, text string")
    assert minhash_near_dup_pairs(tiny).count() == 0
    empty_emb = _empty(spark, "vec_id long, embedding array<float>")
    assert cosine_topk(empty_emb, empty_emb, k=3).count() == 0


def test_setops_profile_merge_on_empty(spark):
    e = _empty(spark, "k long, flag string")
    out = set_split_tags(e, ["k"], F.col("flag") == "a", F.col("flag") == "b")
    assert out.count() == 0
    prof = profile_table(e, ["k"]).collect()
    assert len(prof) == 1 and prof[0].n == 0 and prof[0].min_str is None
    target = spark.createDataFrame([(1, "x")], "k long, v string")
    assert merge_upsert(target, _empty(spark, "k long, v string"), ["k"]).count() == 1
    merged = merge_upsert(_empty(spark, "k long, v string"), target, ["k"])
    assert [tuple(r) for r in merged.collect()] == [(1, "x")]


def test_sampling_on_empty_and_empty_text(spark):
    e = _empty(spark, "doc_id long, n_chars long")
    assert split_assign(e, "doc_id", {"train": 0.8, "val": 0.2}).count() == 0
    assert pack_by_token_budget(e, "doc_id", "n_chars", 1000).count() == 0
    # empty text through the text-analysis surface
    from dbkit_spark.functions.text import bpe_token_count, rolling_fingerprint, tokens

    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    row = df.select(
        F.size(tokens("text")).alias("nt"),
        bpe_token_count("text").alias("nb"),
        rolling_fingerprint(tokens("text")).alias("fp"),
    ).collect()[0]
    assert row.nt == 0 and row.nb == 0 and row.fp == 0


def test_harness_catches_decimal_vs_double_drift(spark, sf_dir):
    """The local harness must fail when Spark emits decimal where the
    oracle emits DOUBLE (round-1 q73 escaped because Decimal was coerced
    to float before comparing). Both value- and dtype-level checks must
    reject it."""
    import pytest

    from tests.oracle_utils import check_dtype_parity, compare_query

    def bad_query(spark_, sf):
        df = spark_.read.parquet(f"{sf}/region.parquet")
        return df.select(
            "r_regionkey",
            F.lit("1.5").cast("decimal(10,6)").alias("x"),
        )

    oracle = "SELECT r_regionkey, CAST(1.5 AS DOUBLE) AS x FROM region"
    with pytest.raises(AssertionError):
        compare_query(spark, "drift_probe", bad_query, oracle, sf_dir)
    with pytest.raises(AssertionError):
        check_dtype_parity(spark, "drift_probe", bad_query, oracle, sf_dir)


def test_harness_catches_int_vs_float_dtype_drift(spark, sf_dir):
    """Round-1 q75 class: value-identical results whose pandas dtypes
    diverge (int64 vs float64) must fail the dtype check."""
    import pytest

    from tests.oracle_utils import check_dtype_parity

    def int_query(spark_, sf):
        df = spark_.read.parquet(f"{sf}/region.parquet")
        return df.select("r_regionkey", F.lit(0).cast("long").alias("z"))

    oracle = "SELECT r_regionkey, CAST(0.0 AS DOUBLE) AS z FROM region"
    with pytest.raises(AssertionError):
        check_dtype_parity(spark, "drift_probe2", int_query, oracle, sf_dir)


def test_round5_operator_guards(spark):
    """Input-validation rails on the round-5 operators raise before any
    job is launched."""
    import pytest

    from dbkit_spark.llm.chunking import chunk_documents
    from dbkit_spark.llm.dedup import containment_pairs
    from dbkit_spark.llm.sampling import quota_sample
    from dbkit_spark.operators.iterate import iterate_fixed
    from dbkit_spark.sources import read_table
    from dbkit_spark.sources.writers import compact_parquet

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(ValueError, match="stride must not exceed"):
        chunk_documents(docs, window=8, stride=9)
    with pytest.raises(ValueError, match="positive"):
        chunk_documents(docs, window=0, stride=1)
    with pytest.raises(ValueError, match="quota must be positive"):
        quota_sample(docs, "source", "doc_id", quota=0)
    with pytest.raises(ValueError, match="threshold"):
        containment_pairs(docs, threshold=0.0)
    with pytest.raises(ValueError, match="n_rounds"):
        iterate_fixed(docs, lambda df: df, n_rounds=-1)
    with pytest.raises(ValueError, match="target_rows_per_file"):
        compact_parquet(spark, "/tmp/nonexistent", target_rows_per_file=0)
    with pytest.raises(ValueError, match="local filesystem"):
        compact_parquet(spark, "s3://bucket/t", target_rows_per_file=10)
    with pytest.raises(ValueError, match="not a directory"):
        compact_parquet(spark, "/tmp/__no_such_dir__", target_rows_per_file=10)

    from dbkit_spark.operators.quality_audit import observe_metrics

    with pytest.raises(ValueError, match="at least one aggregate"):
        observe_metrics(docs, "m", {})


def test_round6_operator_guards(spark):
    """Input-validation rails on the round-6 operators raise before any
    job is launched."""
    import pytest

    from dbkit_spark.llm.dedup import containment_pairs
    from dbkit_spark.llm.similarity import ann_incremental_pairs
    from dbkit_spark.operators.histogram import quantile_bin
    from dbkit_spark.sources import read_table
    from dbkit_spark.streaming.heavy_hitters import (
        heavy_hitters_batch,
        heavy_hitters_stream,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError, match="non-empty"):
        ann_incremental_pairs(emb, [], threshold=0.5)
    with pytest.raises(ValueError, match="k must be positive"):
        quantile_bin(ev, "value", 0)
    with pytest.raises(ValueError, match="positive"):
        heavy_hitters_batch(ev, "user_id", capacity=0)
    with pytest.raises(ValueError, match="positive"):
        heavy_hitters_stream(ev, "user_id", n_shards=0)
    with pytest.raises(ValueError, match="max_df_frac"):
        containment_pairs(docs, max_df_frac=0.0)
