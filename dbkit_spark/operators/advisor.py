"""Join-strategy advisor — the planning artifact that composes the
engine's own estimation primitives into the decision every big join
forces: broadcast, shuffle, or salt?

Catalyst already auto-broadcasts under ``autoBroadcastJoinThreshold``
from file sizes; what it cannot see before launching the shuffle is
(a) the JOIN OUTPUT size (a key-hash sample answers it unbiased —
`operators/cardinality.join_size_estimate`) and (b) KEY SKEW (one
count agg — `operators/profile.skew_profile`). This advisor runs all
three probes at metadata/sample cost and emits ONE advisory row a
pipeline can gate on before committing a 100 TB shuffle — the
capacity-planning step SCALE.md's "most expensive mistake" note is
about.

Everything here is derived, deterministic, and cheap relative to the
join it advises: footer bytes are metadata-only
(`sources/fileindex.build_storage_profile`), the pair estimate
touches a 1/16 key sample, the skew probe is one aggregation over the
probed side's key column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def advise_join(
    spark: SparkSession,
    left_path: str,
    right_path: str,
    left_key: str,
    right_key: str,
    broadcast_bytes: int = 100 * 1024 * 1024,
    skew_ratio_threshold: float = 8.0,
    hex_zeros: int = 1,
) -> DataFrame:
    """One advisory row for joining two parquet datasets on an equality
    key: compressed byte sizes (footer metadata only), estimated output
    pairs (deterministic key-hash sample), the bigger side's key-skew
    factor (heaviest key count ÷ mean key count), and a strategy:

    - ``broadcast_left`` / ``broadcast_right`` when a side's compressed
      bytes fit ``broadcast_bytes`` (favor the smaller side);
    - ``shuffle_salted`` when neither fits and the probe side's skew
      factor clears ``skew_ratio_threshold`` (pair with
      `operators/joins.salted_join`);
    - ``shuffle_hash_or_merge`` otherwise (leave the pick to AQE).

    The advisory also carries ``est_pairs`` so capacity planning can
    veto a join whose OUTPUT is the real problem — the failure mode
    size-based planners miss entirely.
    """
    from ..operators.cardinality import join_size_estimate
    from ..operators.profile import skew_profile
    from ..sources.fileindex import build_storage_profile

    if broadcast_bytes <= 0:
        raise ValueError("broadcast_bytes must be positive")

    def _bytes(path: str) -> int:
        return int(
            build_storage_profile(spark, path)
            .agg(F.sum("compressed_bytes").alias("b"))
            .collect()[0]["b"]
        )

    lbytes = _bytes(left_path)
    rbytes = _bytes(right_path)
    left = spark.read.parquet(left_path)
    right = spark.read.parquet(right_path)
    est = join_size_estimate(
        left, right, left_key, right_key, hex_zeros=hex_zeros
    ).collect()[0]
    probe_side, probe_key = (
        (left, left_key) if lbytes >= rbytes else (right, right_key)
    )
    skew = (
        skew_profile(probe_side, [probe_key], top=1)
        .agg(F.max("skew_factor").alias("s"))
        .collect()[0]["s"]
    )
    skew = float(skew) if skew is not None else 1.0

    if min(lbytes, rbytes) <= broadcast_bytes:
        strategy = "broadcast_left" if lbytes <= rbytes else "broadcast_right"
    elif skew >= skew_ratio_threshold:
        strategy = "shuffle_salted"
    else:
        strategy = "shuffle_hash_or_merge"
    return spark.createDataFrame(
        [
            (
                int(lbytes),
                int(rbytes),
                int(est["est_pairs"]),
                float(round(skew, 6)),
                strategy,
            )
        ],
        "left_bytes long, right_bytes long, est_pairs long, "
        "probe_skew_factor double, strategy string",
    )
