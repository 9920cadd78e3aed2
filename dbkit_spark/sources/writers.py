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


def compact_parquet(
    spark,
    path: str,
    target_rows_per_file: int,
    tmp_suffix: str = "__compact_tmp",
) -> dict:
    """Small-file compaction: rewrite a parquet directory so each file
    holds ~``target_rows_per_file`` rows.

    The table-maintenance primitive every streaming/incremental sink
    needs: micro-batches and per-executor writers leave thousands of
    KB-sized files, and at 100 TB the resulting scan pays file-open +
    footer-read + scheduler overhead per file (plus object-store
    request costs) that dwarfs the data read. Compaction = one read →
    repartition to ceil(rows/target) → write to a temp dir → atomic-ish
    swap. Returns {"files_before", "files_after", "rows"}.

    Scale notes: the repartition is a round-robin shuffle sized by row
    count (cheap relative to the scan it saves downstream); partitioned
    layouts should compact per-partition directory so pruning metadata
    survives. Row-count sizing stands in for byte sizing here —
    production would target bytes via an avg-row-size estimate, same
    plan shape.
    """
    import math
    import os
    import shutil

    if target_rows_per_file <= 0:
        raise ValueError("target_rows_per_file must be positive")
    # Local-filesystem contract: the swap uses os.rename, so the path must
    # be a plain directory (no s3://, hdfs:// — object stores need a
    # manifest-commit protocol, which is a table format's job, not this
    # helper's). Validated up front so a bad URI fails BEFORE the rewrite.
    if "://" in path:
        raise ValueError(
            f"compact_parquet requires a local filesystem path, got {path!r}"
        )
    if not os.path.isdir(path):
        raise ValueError(f"compact_parquet: {path!r} is not a directory")
    tmp = path.rstrip("/") + tmp_suffix
    old = path.rstrip("/") + "__compact_old"
    # Fail fast on debris from a previously crashed run BEFORE doing any
    # work: a leftover __compact_old would make os.rename(path, old) fail
    # with ENOTEMPTY after the full rewrite, and a stale tmp would be
    # silently clobbered. Recovery is a human decision (the leftover dir
    # may hold the only good copy), so refuse rather than guess.
    for leftover in (tmp, old):
        if os.path.exists(leftover):
            raise RuntimeError(
                f"compact_parquet: leftover {leftover!r} from a previous "
                "run exists; inspect and remove it before compacting"
            )
    df = spark.read.parquet(path)
    rows = df.count()
    files_before = sum(
        1
        for root, _, names in os.walk(path)
        for f in names
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(rows / target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    # rename-aside swap: the DATA always survives (as __compact_old
    # and/or the tmp dir), but a crash in the instant between the two
    # renames leaves nothing at `path` until the suffixed dir is
    # manually renamed back — rename-pairs aren't atomic. True
    # atomicity needs a table format's manifest commit; this helper's
    # guarantee is no-data-loss + fail-fast on leftover debris above.
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after = sum(
        1
        for root, _, names in os.walk(path)
        for f in names
        if f.endswith(".parquet")
    )
    return {"files_before": files_before, "files_after": files_after, "rows": rows}


def write_parquet_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: "list[str]",
    expected_ndv: int = 100_000,
    mode: str = "overwrite",
) -> None:
    """Parquet with SPLIT-BLOCK BLOOM FILTERS on ``bloom_cols`` — the
    footer-adjacent point-lookup index (parquet-format BloomFilter spec;
    the needle-in-haystack sibling of min/max stats and the footer
    index): min/max prunes RANGE predicates but is useless for sparse
    point lookups on high-cardinality unsorted keys (every row group
    spans nearly the full key range); a bloom filter answers "this row
    group definitely lacks key k" in a few hashes, so selective
    id-IN-list scans skip row groups that stats cannot. Written by the
    standard parquet-mr options (``parquet.bloom.filter.enabled#col``);
    any parquet reader that honors the spec (Spark, Trino, parquet-mr)
    prunes with them at read time — the 100 TB win is row-group skips
    on exactly the lookup workloads z-order cannot cover (single keys,
    not ranges). ``expected_ndv`` sizes the filter (~1.1 bytes/ndv at
    the default 1% FPP).
    """
    w = df.write.mode(mode)
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(int(expected_ndv))
        )
    w.parquet(path)
