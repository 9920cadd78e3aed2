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
    # and the SCAN must prove it: the yr predicate appears as a partition
    # filter (directory pruning), not a post-scan data filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(yr" in plan or "PartitionFilters: [(yr" in plan, plan


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
    # a permanently rows-only entry (HLL++ sketch values have no DuckDB
    # twin — q38/q118/q267/q310 all graduated to oracles in round 11)
    assert eng.oracle("q20_approx_distinct") is None


def test_text_source_line_and_whole(spark, tmp_path):
    from dbkit_spark.sources import read_text

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("solo\n")
    lines = sorted(r.value for r in read_text(spark, str(d)).collect())
    assert lines == ["line one", "line two", "solo"]
    whole = sorted(r.value for r in read_text(spark, str(d), whole=True).collect())
    assert whole == ["line one\nline two\n", "solo\n"]


def test_binary_file_source_to_real_decode(spark, tmp_path):
    """End-to-end media ingest: BMP/PPM files on disk -> binaryFile source
    -> real header decode, with a glob pruning non-media files."""
    from pyspark.sql import functions as F

    from dbkit_spark.llm.multimodal import decode_image_meta, encode_bmp, encode_ppm
    from dbkit_spark.sources import read_binary_files

    d = tmp_path / "media"
    d.mkdir()
    (d / "img1.bmp").write_bytes(encode_bmp(7, 5, seed=1))
    (d / "img2.ppm").write_bytes(encode_ppm(3, 9, seed=2))
    (d / "notes.txt").write_text("not an image")

    files = read_binary_files(spark, str(d), glob="*.{bmp,ppm}")
    assert files.count() == 2
    payloads = files.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("payload"),
        F.lit("image").alias("media_type"),
        F.col("length").alias("payload_len"),
    )
    metas = {
        (r.img_format): (r.width, r.height, r.bpp)
        for r in decode_image_meta(payloads).collect()
    }
    assert metas == {"bmp": (7, 5, 24), "ppm": (3, 9, 24)}


def test_appender_uint64_decimal_fidelity(spark):
    """UINT64 path (SURVEY §1.2): a DecimalType(20,0) column accepts
    Python ints beyond 2^63-1 (incl. 2^64-1) and round-trips them
    exactly; bool is still rejected as a type error like the other
    integer columns."""
    from decimal import Decimal

    from dbkit_spark import errors
    from dbkit_spark.schema import attribute, make_schema
    from dbkit_spark.sources import table_appender

    schema = make_schema([attribute("u", "UINT64", nullable=False)])
    app = table_appender(schema)
    big = 2**64 - 1
    for v in (0, 2**63, big, Decimal(123)):
        app.add_row().set(v if not isinstance(v, Decimal) else v)
    df = app.done(spark)
    assert df.schema.simpleString() == "struct<u:decimal(20,0)>"
    got = sorted(r.u for r in df.collect())
    assert got == [Decimal(0), Decimal(123), Decimal(2**63), Decimal(big)]

    bad = table_appender(schema)
    bad.add_row().set(True)
    import pytest

    with pytest.raises(errors.AttributeType):
        bad.done(spark)


def test_compact_parquet_small_files(spark, tmp_path):
    """A fragmented directory (64 tiny files) compacts to the row-target
    file count with identical content; a second compaction is a no-op
    at the same target."""
    from dbkit_spark.sources import read_table
    from dbkit_spark.sources.writers import compact_parquet

    sf = "/root/testdata/sf0.001"
    ev = read_table(spark, sf, "events").select(
        "event_id", "user_id", "event_type"
    )
    path = str(tmp_path / "frag")
    ev.repartition(64).write.parquet(path)
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())

    stats = compact_parquet(spark, path, target_rows_per_file=1000)
    assert stats["files_before"] == 64
    import math

    assert stats["files_after"] == max(1, math.ceil(stats["rows"] / 1000))
    assert stats["files_after"] < 64
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before

    again = compact_parquet(spark, path, target_rows_per_file=1000)
    assert again["files_before"] == stats["files_after"]
    assert again["files_after"] == stats["files_after"]


def test_schema_evolution_merge_read(spark, tmp_path):
    """Files appended under an evolving schema read back as the union
    schema with NULLs for missing columns; the default first-footer read
    would drop the late-added column — the trap read_parquet_evolved
    exists to close."""
    from dbkit_spark.sources import read_parquet_evolved

    path = str(tmp_path / "evolving")
    spark.range(3).selectExpr("id", "id * 2 AS a").write.parquet(path)
    spark.range(3, 6).selectExpr(
        "id", "id * 2 AS a", "CAST(id AS STRING) AS b"
    ).write.mode("append").parquet(path)

    df = read_parquet_evolved(spark, path)
    assert set(df.columns) == {"id", "a", "b"}
    rows = {(r.id, r.a, r.b) for r in df.collect()}
    assert rows == {
        (0, 0, None), (1, 2, None), (2, 4, None),
        (3, 6, "3"), (4, 8, "4"), (5, 10, "5"),
    }
