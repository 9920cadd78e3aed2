"""IPv4 / CIDR network enrichment — pure ``pyspark.sql.functions``
expressions (JVM-side, codegen'd; no UDFs).

A web-scale corpus keys per-site quotas, bot filtering, and geo/ASN
enrichment on IP blocks; at 100 TB the enrichment is a JOIN problem:
routing tables are dim-sized (~1M routes) but a naive theta-join
``ip BETWEEN base AND base+size`` is a BroadcastNestedLoopJoin. The
scale answer here is the classic prefix-bucket trick: every CIDR block
expands to the fixed-width /``bucket_bits`` buckets it covers (bounded
fan-out), probes bucket by one shift, and the join is an EQUI-join on
the bucket with an integer range verify — AQE broadcasts the expanded
dim side. Longest-prefix wins via one window on the probe key.

North-star surface: the reference has no network functions
(`operation/mod.rs` roadmap stops at relational ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ipv4_to_long(col: Column) -> Column:
    """Dotted-quad string → unsigned 32-bit value in a long. No
    validation beyond the split (malformed quads become null via the
    int casts) — run :func:`~..operators.profile.infer_formats` first
    if the column is untrusted."""
    p = F.split(col, r"\.")
    return (
        p.getItem(0).cast("long") * 16777216
        + p.getItem(1).cast("long") * 65536
        + p.getItem(2).cast("long") * 256
        + p.getItem(3).cast("long")
    )


def long_to_ipv4(col: Column) -> Column:
    """Inverse of :func:`ipv4_to_long`."""
    return F.concat_ws(
        ".",
        (col / 16777216).cast("long") % 256,
        (col / 65536).cast("long") % 256,
        (col / 256).cast("long") % 256,
        col.cast("long") % 256,
    )


def cidr_enrich(
    probe: DataFrame,
    ip_col: str,
    id_col: str,
    blocks: DataFrame,
    net_col: str,
    plen_col: str,
    bucket_bits: int | None = None,
) -> DataFrame:
    """Left-enrich each probe row (integer IP in ``ip_col``, unique
    ``id_col``) with the LONGEST-PREFIX matching CIDR block. ``blocks``
    carries (net base as integer, prefix length, any attribute
    columns); bases are normalized to their block alignment, so
    ``10.1.2.3/16`` and ``10.1.0.0/16`` declare the same block.

    Plan: blocks expand to their covering /``bucket_bits`` buckets —
    fan-out is 2^(bucket_bits−plen), capped at 2^12 per block — then
    ONE equi-join on the bucket (the expanded dim is
    routing-table-sized: AQE broadcasts it; never a NestedLoopJoin)
    with the integer range verify in the join filter, and ONE window
    on the probe key picks the longest matching prefix (matched-first,
    plen desc, base tiebreak). Unmatched probes keep null attributes —
    left semantics without a second join.

    Bucket sizing is the asymmetry that makes this scale: too-wide
    buckets multiply PROBE candidates (2^(plen−bucket_bits) blocks per
    bucket → the fact-side window input explodes), too-narrow buckets
    multiply DIM rows (bounded, broadcastable). So the default sizes
    the bucket to the block table — max plen observed, capped at
    min_plen_observed+12 (the expansion bound, so a default route /0
    next to /24 routes buckets at /12 and expands 4096-wide on the DIM
    side rather than dropping) and /28 — via one metadata-sized 1-row
    aggregate probe (the join-advisor discipline). Blocks are NEVER
    silently dropped: an explicit ``bucket_bits`` that would need
    >2^12 buckets for some block raises instead (silent null
    enrichment for default-route-covered probes is a wrong answer).
    """
    if bucket_bits is None:
        stats = blocks.agg(
            F.min(plen_col).alias("lo"), F.max(plen_col).alias("hi")
        ).first()
        if stats["lo"] is None:
            bucket_bits = 16
        else:
            bucket_bits = max(
                1, min(int(stats["hi"]), int(stats["lo"]) + 12, 28)
            )
    if not 0 < bucket_bits <= 32:
        raise ValueError("bucket_bits must be in (0, 32]")
    floor = bucket_bits - 12
    if floor > 0:
        offender = blocks.filter(F.col(plen_col) < floor).first()
        if offender is not None:
            raise ValueError(
                f"block {offender[net_col]}/{offender[plen_col]} needs "
                f">4096 buckets per block at bucket_bits={bucket_bits}; "
                "lower bucket_bits (or leave it auto-sized)"
            )
    shift = 32 - bucket_bits
    size = F.pow(F.lit(2.0), 32 - F.col(plen_col)).cast("long")
    base = (F.col(net_col) - F.col(net_col) % size).alias("_base")
    norm = blocks.select(
        F.col(plen_col).alias("_plen"),
        base,
        size.alias("_size"),
        *[
            c
            for c in blocks.columns
            if c not in (net_col, plen_col)
        ],
    )
    expanded = norm.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.shiftright(F.col("_base"), shift),
                F.shiftright(F.col("_base") + F.col("_size") - 1, shift),
            )
        ),
    )
    attr_cols = [
        c for c in blocks.columns if c not in (net_col, plen_col)
    ]
    probed = probe.withColumn(
        "_bucket", F.shiftright(F.col(ip_col), shift)
    )
    joined = probed.join(expanded, "_bucket", "left")
    matched = (F.col(ip_col) >= F.col("_base")) & (
        F.col(ip_col) < F.col("_base") + F.col("_size")
    )
    staged = joined.select(
        *probe.columns,
        matched.alias("_m"),
        F.col("_plen"),
        F.col("_base"),
        *[
            F.when(matched, F.col(c)).otherwise(F.lit(None)).alias(c)
            for c in attr_cols
        ],
    )
    # Final tiebreak on the attribute columns themselves (ADVICE r9):
    # two blocks can normalize to the same (_base, _plen) but carry
    # different attribute values (duplicate/conflicting routes are
    # plausible in real feeds) — without this, row_number picks a
    # nondeterministic winner across runs. With it, the lexicographic-
    # smallest attribute tuple wins, deterministically on any engine.
    w = Window.partitionBy(id_col).orderBy(
        F.col("_m").desc_nulls_last(),
        F.col("_plen").desc_nulls_last(),
        F.col("_base").asc_nulls_last(),
        *[F.col(c).asc_nulls_last() for c in attr_cols],
    )
    ranked = staged.withColumn("_rn", F.row_number().over(w))
    return ranked.filter(F.col("_rn") == 1).select(
        *probe.columns,
        F.when(F.col("_m"), F.col("_plen")).alias("matched_plen"),
        *attr_cols,
    )
