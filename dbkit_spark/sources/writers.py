"""File sinks (SURVEY.md §2.1 Tier C, reference ``README.md:13-15``).

Scale notes: always partition large outputs (``partition_by``) so downstream
scans can prune; parquet is the default sink. ``bucket_by`` writes a
bucketed table so later equi-joins on the bucket key skip the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    buckets: int,
    bucket_cols: list[str],
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed table: later joins/aggs on ``bucket_cols`` are shuffle-free
    (both sides pre-partitioned). The 100 TB path for repeated joins on the
    same key. ``path`` makes it an external table (data at ``path``,
    metadata in the session catalog) — the warehouse dir is a static conf
    and can't be retargeted per-write."""
    w = (
        df.write.mode(mode)
        .bucketBy(buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)
