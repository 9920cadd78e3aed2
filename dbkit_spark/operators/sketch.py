"""Count-Min sketch: fixed-size frequency estimation over unbounded
key domains.

The 100 TB problem this solves: "how often does each of these keys
occur?" when the key domain is too large to hold exact counts (URLs,
user ids, n-grams). A Count-Min sketch (Cormode & Muthukrishnan 2005)
is a depth × width counter table; each key increments one counter per
hash row, and a point estimate is the MIN over its depth counters —
an overestimate by at most εN with probability 1-δ for
width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.

Spark design: the per-row depth-way expansion is a map-side
``transform`` over a ``sequence`` literal (codegen, no Python), and a
single hash aggregation with map-side combine reduces to the
depth × width cells — the shuffle carries O(depth·width) rows per
task, never per input row, so the exchange stays metadata-sized at
any corpus size. Hashing is the engine-wide portable md5 rule (first
6 hex digits of md5(key:salt:row)), so a DuckDB oracle replays the
ENTIRE table and every estimate digit-for-digit — unusual for a
sketch, and exactly why the family is testable here.

Complements the rest of the sketch family: HLL / approx_count_distinct
(distinct counts), KMV (join sizing, `operators/cardinality.py`),
Misra–Gries (heavy hitters, `streaming/heavy_hitters.py`), GK
(quantiles). CM is the point-frequency member.

Reference trace: none — dbkit stops at ToStr (`expression/convert.rs`);
sketches are north-star roadmap surface (`README.md:31-38`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cm_bucket(key: Column, row_idx: Column, salt: str, width: int) -> Column:
    """Portable md5 bucket for hash row ``row_idx``: first 6 hex digits
    of md5(key:salt:row) mod width — digit-replayable in any engine."""
    keyed = F.concat(
        key.cast("string"),
        F.lit(":" + salt + ":"),
        row_idx.cast("string"),
    )
    return (
        F.conv(F.substring(F.md5(keyed), 1, 6), 16, 10).cast("long")
        % F.lit(width)
    )


def cm_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)`` — depth × width cells
    (absent cells are zero). One map-side expansion + one hash agg;
    never a per-key table."""
    rows = F.sequence(F.lit(0), F.lit(depth - 1))
    pairs = F.transform(
        rows,
        lambda i: F.struct(
            i.alias("r"),
            _cm_bucket(F.col(key_col), i, salt, width).alias("b"),
        ),
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.r").cast("int").alias("row"),
            F.col("p.b").cast("int").alias("bucket"),
        )
        .agg(F.count("*").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Point estimates for the probe keys: est = MIN over the key's
    depth cells. The sketch (≤ depth·width rows) broadcasts; the probe
    side computes its buckets map-side and joins on (row, bucket) —
    no corpus re-scan, no shuffle of the probe side beyond its own
    depth-way expansion + per-key agg.

    ``depth``/``width``/``salt`` must match the build call (they are
    part of the sketch identity, like an index's hash family).
    """
    rows = F.sequence(F.lit(0), F.lit(depth - 1))
    pairs = F.transform(
        rows,
        lambda i: F.struct(
            i.alias("r"),
            _cm_bucket(F.col(key_col), i, salt, width).alias("b"),
        ),
    )
    probe_cells = probes.select(
        F.col(key_col), F.explode(pairs).alias("p")
    ).select(
        key_col,
        F.col("p.r").cast("int").alias("row"),
        F.col("p.b").cast("int").alias("bucket"),
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est"))
    )


def cm_sketch_sql(
    table_expr: str,
    key_sql: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> str:
    """DuckDB twin of :func:`cm_sketch` — replays the md5 bucketing
    digit-for-digit (the oracle-portability contract)."""
    row_hash = (
        f"CAST(list_sum(list_transform(generate_series(1, 6), i -> "
        f"CAST((strpos('0123456789abcdef', substr(md5(concat("
        f"{key_sql}, ':{salt}:', CAST(r AS VARCHAR))), i, 1)) - 1) "
        f"AS BIGINT) * CAST(power(16, 6 - i) AS BIGINT))) AS BIGINT) "
        f"% {width}"
    )
    return f"""
    SELECT CAST(r AS INTEGER) AS row,
           CAST({row_hash} AS INTEGER) AS bucket,
           COUNT(*) AS cnt
    FROM {table_expr}
    CROSS JOIN (SELECT unnest(generate_series(0, {depth - 1})) AS r)
    GROUP BY 1, 2
    """
