"""Change-data-capture log application (lakehouse MERGE semantics).

The missing third of the mutation story next to ``rollup_hierarchy.
merge_upsert`` (single-batch upsert, no deletes, q74) and ``scd2``
enrichment (history-preserving dimension, q221): a VERSIONED change log
with inserts, updates, AND deletes, possibly many ops per key, applied
latest-wins onto a base snapshot — what replaying a Debezium/binlog
extract onto yesterday's table means. The reference's append-only
``TableAppender`` (table.rs:124-191) has no mutation surface; this is
north-star lakehouse completeness, same category as the snapshot diff
(q253) and incremental aggregate maintenance (q299).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_apply(
    base: DataFrame,
    log: DataFrame,
    keys: list[str],
    op_col: str = "op",
    version_col: str = "version",
) -> DataFrame:
    """Apply a CDC log to a base snapshot, latest-wins per key.

    ``log`` carries the base's data columns plus ``op_col`` in
    {'I','U','D'} and a ``version_col`` that totally orders the ops of
    each key (binlog position / LSN; ties break on op descending —
    'U' over 'I' over 'D' is arbitrary but deterministic, so replays
    are stable even on malformed feeds). Result:

    - key never in the log       → base row passes through unchanged
    - latest op is 'I' or 'U'    → the log row's values (insert and
      update converge: CDC upsert)
    - latest op is 'D'           → row absent (including base keys
      deleted, and insert-then-delete churn keys never materialized)

    Earlier ops of a key are superseded entirely (no column-level
    merge — row-image logs, the common CDC shape).

    Scale: the row_number window and the latest-wins filter exchange
    ONLY the log (deltas — orders of magnitude smaller than the base);
    the base is touched by one left-anti join on the key, which AQE
    broadcasts when the distinct-key set is small. Nothing ever
    shuffles the base on a non-key column, and output is
    base ∪ log-sized. At 100 TB base + GB-sized deltas this is the
    plan a MERGE INTO compiles to.
    """
    data_cols = base.columns
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col(op_col).desc()
    )
    latest = (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    survivors = latest.filter(F.col(op_col) != "D").select(*data_cols)
    untouched = base.join(
        latest.select(*keys).distinct(), on=keys, how="left_anti"
    )
    return untouched.unionByName(survivors)
