"""Survival analysis: the Kaplan–Meier product-limit estimator.

Retention IS survival analysis: "what fraction of users are still
active after t hours" with the honest treatment of users who haven't
churned yet (right-censoring — a user still active at the end of the
observation window tells you their lifetime EXCEEDS their observed
span, not that it equals it; dropping or truncating them biases
retention curves down). The product-limit estimator handles exactly
this, and at 100 TB it reduces to cheap relational algebra: one
per-subject aggregation, one grouped count over DISTINCT durations
(a table of O(distinct durations) rows — metadata-sized next to the
corpus), and a cumulative product over that small table.

Cross-engine exactness: d_t and n_t are exact integers; each factor
(1 − d/n) is one IEEE division; the running product goes through
exp(Σ ln(factor)) — libm, so survival is rounded to 6dp (the q27
rule) — with an explicit zero-flag so a depleted risk set yields an
exact 0 instead of engine-specific ln(0) behavior (Spark's log(0) is
NULL where DuckDB's is -inf).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
) -> DataFrame:
    """Product-limit survival curve.

    Input: one row per subject — ``duration_col`` (numeric time under
    observation) and ``observed_col`` (1 = the event happened at that
    duration; 0 = right-censored: the subject left observation without
    the event). Output: one row per DISTINCT duration with at least one
    observed event — (duration, d, n_at_risk, survival) where
    survival = Π_{s ≤ t} (1 − d_s/n_s), rounded 6dp.

    Plan: one grouped count per distinct duration (events and total
    leavers), then cumulative windows over that duration-ordered table
    — the window runs on O(distinct durations) rows, which is
    metadata-sized relative to the subject table (documented: the
    single-partition sort is over the RISK TABLE, never the subjects).
    """
    base = df.select(
        F.col(duration_col).alias("_t"),
        F.col(observed_col).cast("int").alias("_e"),
    ).filter(F.col("_t").isNotNull())
    per_t = base.groupBy("_t").agg(
        F.sum("_e").cast("long").alias("d"),
        F.count("*").cast("long").alias("_leave"),
    )
    n_total = base.agg(F.count("*").cast("long").alias("_n"))
    w = Window.orderBy("_t")
    # at-risk at t: everyone whose duration >= t
    risk = per_t.crossJoin(F.broadcast(n_total)).withColumn(
        "n_at_risk",
        F.col("_n")
        - F.coalesce(
            F.sum("_leave").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    factor = 1 - F.col("d") / F.col("n_at_risk")
    with_f = risk.withColumn("_f", factor).withColumn(
        "_dead", F.max((F.col("_f") <= 0).cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    surv = F.when(F.col("_dead") == 1, F.lit(0.0)).otherwise(
        F.round(
            F.exp(
                F.sum(F.log("_f")).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                )
            ),
            6,
        )
    )
    return (
        with_f.withColumn("survival", surv)
        .filter(F.col("d") > 0)
        .select(
            F.col("_t").alias("duration"), "d", "n_at_risk", "survival"
        )
    )
