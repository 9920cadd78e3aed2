"""Runtime guards for declared quadratic verify-baselines.

``ngram_jaccard_pairs`` and ``embedding_near_dup`` exist as exact
brute-force oracles for their scalable twins (``jaccard_prefix_filter_
pairs``, ``ann_bucketed``). Nothing about their plans survives a large
corpus — candidate fanout (hot-shingle buckets) and crossJoin are both
O(n²) — so they refuse inputs past ``max_rows`` instead of silently
launching a job that can never finish at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_MAX_ROWS = 100_000


def require_small(
    df: DataFrame, max_rows: int | None, op: str, scale_alternative: str
) -> None:
    """Raise ``ValueError`` if ``df`` exceeds ``max_rows`` rows.

    The count is bounded: ``limit(max_rows + 1).count()`` stops scanning
    once the limit is proven exceeded, so the guard costs one truncated
    job, not a full-corpus count. ``max_rows=None`` disables the guard
    (explicit opt-in to the quadratic plan).
    """
    if max_rows is None:
        return
    seen = df.limit(max_rows + 1).count()
    if seen > max_rows:
        raise ValueError(
            f"{op} is a quadratic verify-baseline and refuses inputs over "
            f"{max_rows} rows (got > {max_rows}); use {scale_alternative} "
            "for large corpora, or pass max_rows=None to force"
        )
