"""Source/sink round-trips (SURVEY.md §2.1) and the as-of forward
direction."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbkit_spark.engine import Engine
from dbkit_spark.operators.joins import asof_join
from dbkit_spark.sources import read_csv, read_json, read_parquet, read_table
from dbkit_spark.sources.writers import write_csv, write_json, write_parquet


def test_parquet_roundtrip_partitioned(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_out")
    write_parquet(
        orders.withColumn("yr", F.year("o_orderdate")), out, partition_by=["yr"]
    )
    back = read_parquet(spark, out)
    assert back.count() == orders.count()
    # partition pruning: a yr filter must prune directories, not scan all
    pruned = back.filter(F.col("yr") == 1995)
    expected = orders.filter(F.year("o_orderdate") == 1995).count()
    assert pruned.count() == expected


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    nation = read_table(spark, sf_dir, "nation")
    csv_out, json_out = str(tmp_path / "n_csv"), str(tmp_path / "n_json")
    write_csv(nation, csv_out)
    write_json(nation, json_out)
    csv_back = read_csv(spark, csv_out, nation.schema)
    json_back = read_json(spark, json_out, nation.schema)
    rows = {tuple(r) for r in nation.collect()}
    assert {tuple(r) for r in csv_back.collect()} == rows
    assert {tuple(r) for r in json_back.collect()} == rows


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, t string"
    ).select("k", F.col("t").cast("timestamp").alias("t"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 1.0), (1, "2024-01-01 11:00:00", 2.0)],
        "k long, t string, v double",
    ).select("k", F.col("t").cast("timestamp").alias("t"), "v")
    out = asof_join(left, right, on_key="k", on_time="t", direction="forward")
    assert [r.v for r in out.collect()] == [2.0]  # earliest at-or-after


def test_engine_facade(spark, sf_dir):
    eng = Engine(spark)
    eng.register_tables(sf_dir)
    n = eng.sql("SELECT count(*) AS n FROM lineitem").collect()[0].n
    assert n == eng.table(sf_dir, "lineitem").count()
    df = eng.run("q01_pricing_summary", sf_dir)
    assert df.count() > 0
    assert eng.oracle("q01_pricing_summary") is not None
    assert eng.oracle("q38_stateful_user_stats") is None
