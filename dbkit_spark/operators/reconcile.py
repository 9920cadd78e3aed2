"""Table reconciliation: compare two huge tables by bucketed checksums.

The data-migration / replica-validation primitive: after a backfill,
CDC re-sync, or engine migration, prove two 100 TB tables are identical
— or localize WHERE they differ — without ever joining them row-by-row.

Design (the classic anti-entropy / Merkle-bucket scheme):

1. Each row is fingerprinted: a canonical string of its columns is
   md5-hashed and the first 12 hex digits become an integer (< 2^48 —
   the md5→int rule every hash construction in this engine uses, so a
   SQL oracle reproduces it digit-for-digit).
2. Rows hash-partition into ``n_buckets`` by key.
3. Per bucket each side reduces to (row_count, SUM(fingerprint)) — the
   sum is carried in DECIMAL(38,0) because 2^48 × 10^12 rows overflows
   a BIGINT, and Spark wraps while other engines widen (a silent
   cross-engine divergence this engine never permits).
4. The two bucket summaries FULL OUTER join on bucket id; any bucket
   whose (count, checksum) disagrees — or that exists on one side only
   — is emitted.

Cost at scale: each side is one scan + one map-side-combined agg to
``n_buckets`` rows; the join is metadata-sized. Commutative sums make
the checksum partition-order independent. A mismatch report of K
buckets bounds the affected keyspace to K/n_buckets of the table, so
the expensive row-level diff (an anti-join restricted to those buckets)
touches only the damaged slice.

Reference: dbkit has no multi-table surface (SURVEY §0 — scan/project
only); this is part of the declared large-scale pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


NULL_SENTINEL = "␀"  # ␀ SYMBOL FOR NULL — vanishingly unlikely in data


def row_fingerprint(cols: list[Column]) -> Column:
    """48-bit integer fingerprint of a canonical '|'-joined row string.

    Every column is coalesced to ``NULL_SENTINEL`` INSIDE the
    fingerprint (concat_ws silently skips NULLs, which would collide
    ('a', NULL, 'b') with ('a', 'b', NULL)) — the NULL contract is
    enforced here rather than left to each call site. SQL oracles must
    mirror with COALESCE(CAST(col AS VARCHAR), '␀') per column."""
    canon = F.concat_ws(
        "|", *[F.coalesce(c.cast("string"), F.lit(NULL_SENTINEL)) for c in cols]
    )
    return F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("long")


def bucket_summary(
    df: DataFrame, key: Column, fingerprint: Column, n_buckets: int = 256
) -> DataFrame:
    """(bucket, cnt, checksum) — one map-side-combined agg, n_buckets rows."""
    return (
        df.select(
            F.pmod(key.cast("long"), F.lit(n_buckets)).alias("bucket"),
            fingerprint.alias("_fp"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("_fp").cast("decimal(38,0)")).alias("checksum"),
        )
    )


def reconcile_buckets(left: DataFrame, right: DataFrame) -> DataFrame:
    """FULL OUTER compare of two bucket summaries; emits disagreeing
    buckets as (bucket, left_cnt, right_cnt, counts_match, sums_match).

    Missing buckets surface with 0-count (COALESCE), so a side that
    dropped an entire bucket is reported, not skipped."""
    l = left.select(
        "bucket",
        F.col("cnt").alias("left_cnt"),
        F.col("checksum").alias("left_sum"),
    )
    r = right.select(
        "bucket",
        F.col("cnt").alias("right_cnt"),
        F.col("checksum").alias("right_sum"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    joined = l.join(r, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("left_cnt", F.lit(0)).alias("left_cnt"),
        F.coalesce("right_cnt", F.lit(0)).alias("right_cnt"),
        F.coalesce("left_sum", zero).alias("left_sum"),
        F.coalesce("right_sum", zero).alias("right_sum"),
    )
    return (
        joined.withColumn(
            "counts_match", F.col("left_cnt") == F.col("right_cnt")
        )
        .withColumn("sums_match", F.col("left_sum") == F.col("right_sum"))
        .filter(~F.col("counts_match") | ~F.col("sums_match"))
        .select("bucket", "left_cnt", "right_cnt", "counts_match", "sums_match")
    )

def reconcile_rows(
    left: DataFrame,
    right: DataFrame,
    key: Column,
    fingerprint: Column,
    damaged_buckets: DataFrame,
    n_buckets: int = 256,
) -> DataFrame:
    """Stage 2 of anti-entropy: the ROW-LEVEL diff, restricted to the
    damaged buckets stage 1 (``reconcile_buckets``) localized.

    Both sides filter to the damaged bucket set FIRST (a broadcast
    semi-join against the K-row bucket report — the filter rides the
    scan, so a K/n_buckets fraction of each table is read and the rest
    is pruned), then full-outer join on the key within that slice.
    Emits one row per differing key:

        (bucket, key, status) — status in
        'missing_right' (key only on the left),
        'missing_left'  (key only on the right),
        'changed'       (both sides, fingerprints differ).

    At 100 TB with K damaged buckets the expensive row join touches
    ~K/n_buckets of the data — the whole point of bucketing first; a
    direct full-table row diff is the O(table) plan this avoids. The
    same ``fingerprint`` expression must be passed to both stages (it
    is the row identity).
    """
    bset = F.broadcast(damaged_buckets.select("bucket").distinct())

    def side(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.select(
                F.pmod(key.cast("long"), F.lit(n_buckets)).alias("bucket"),
                key.cast("long").alias("key"),
                fingerprint.alias(f"fp_{tag}"),
            )
            .join(bset, "bucket", "left_semi")
        )

    l = side(left, "l")
    r = side(right, "r")
    joined = l.join(r, ["bucket", "key"], "full_outer")
    return joined.select(
        "bucket",
        "key",
        F.when(F.col("fp_r").isNull(), F.lit("missing_right"))
        .when(F.col("fp_l").isNull(), F.lit("missing_left"))
        .when(F.col("fp_l") != F.col("fp_r"), F.lit("changed"))
        .alias("status"),
    ).filter(F.col("status").isNotNull())


def column_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Column-level change attribution between two keyed snapshots:
    one row per compared column with the count of key-matched rows
    whose value changed, plus ``__added__`` / ``__removed__`` rows for
    key-level churn. The drill-down that follows a ``reconcile_buckets``
    mismatch: WHICH columns drifted, and how much.

    Plan: one full outer join on the key (the only shuffle — both
    sides hash-partition once) feeding a single aggregation whose
    per-column counters are null-safe-inequality sums folded map-side.
    n columns never means n jobs, n joins, or n scans (the
    profile_table discipline). Output is long-format and
    metadata-sized: |compare_cols| + 2 rows at any scale.

    Change predicate is IS DISTINCT FROM (null-safe): NULL -> value
    and value -> NULL count as changes; NULL -> NULL does not.
    """
    o = old.select(
        *[F.col(k) for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k) for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, key_cols, "full_outer")
    matched = F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull()
    aggs = [
        F.sum(
            F.when(
                matched & ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias(f"chg_{c}")
        for c in compare_cols
    ]
    aggs.append(
        F.sum(F.when(F.col("_in_old").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("_added")
    )
    aggs.append(
        F.sum(F.when(F.col("_in_new").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("_removed")
    )
    wide = j.agg(*aggs)
    stack_args = []
    for c in compare_cols:
        stack_args += [f"'{c}'", f"chg_{c}"]
    stack_args += ["'__added__'", "_added", "'__removed__'", "_removed"]
    n_rows = len(compare_cols) + 2
    return wide.select(
        F.expr(
            f"stack({n_rows}, {', '.join(stack_args)}) AS (column_name, n_rows)"
        )
    ).orderBy("column_name")
