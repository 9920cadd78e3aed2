"""Cross-table entity resolution (record linkage).

The dedup family (`llm/dedup.py`) finds near-duplicates WITHIN one
corpus; entity resolution links records ACROSS two tables that describe
the same real-world entity with textual noise (a vendor list vs a
scraped registry, a crawl's author strings vs a canonical list). The
classic shape — and the only one that scales — is BLOCK then VERIFY:
cheap deterministic blocking keys turn the |L|×|R| cross product into
per-block products, then an edit-distance verify runs only inside
blocks.

Scale design: a single blocking key misses pairs whose noise corrupts
that key, so the operator takes MULTIPLE blocking expressions and
unions their candidate sets (multi-pass blocking — the same
recall-vs-cost dial as multi-table LSH, `llm/similarity.py`): a pair is
a candidate if ANY pass agrees. Each pass is one equi-join on its key;
candidates are deduplicated on (left id, right id) before the O(len²)
Levenshtein verify, so the expensive step runs once per candidate.
Per-block skew (a degenerate key like a constant prefix) is visible in
advance via `operators/profile.skew_profile` on the block keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_link(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    block_exprs: list[tuple[Column, Column]],
    max_dist: int = 2,
) -> DataFrame:
    """Link records whose text fields are within ``max_dist`` edit
    distance, restricted to pairs sharing at least one blocking key.

    ``block_exprs``: list of (left key expr, right key expr) pairs —
    one blocking pass each; candidates are the UNION over passes.

    Output: (left id, right id, dist) — one row per verified link.
    The verify (JVM ``levenshtein``) runs once per distinct candidate.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if not block_exprs:
        raise ValueError("at least one blocking pass is required")
    cands = None
    for lb, rb in block_exprs:
        # blocking expressions are written against the ORIGINAL column
        # names, so evaluate them before the rename
        la = left.select(
            F.col(left_id).alias("_lid"),
            F.col(left_text).alias("_lt"),
            lb.cast("string").alias("_bk"),
        )
        ra = right.select(
            F.col(right_id).alias("_rid"),
            F.col(right_text).alias("_rt"),
            rb.cast("string").alias("_bk"),
        )
        c = la.join(ra, "_bk").select("_lid", "_lt", "_rid", "_rt")
        cands = c if cands is None else cands.unionAll(c)
    verified = (
        cands.distinct()
        .withColumn("_d", F.levenshtein("_lt", "_rt"))
        .filter(F.col("_d") <= max_dist)
    )
    return verified.select(
        F.col("_lid").alias(left_id),
        F.col("_rid").alias(right_id),
        F.col("_d").alias("dist"),
    )
