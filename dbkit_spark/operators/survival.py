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


def logrank_test(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966; Peto & Peto 1972 — THE
    companion to :func:`kaplan_meier`: two retention curves differ
    visually, is the difference real? Compares the whole curves, not
    one horizon, and handles right-censoring exactly like KM):
    at each distinct event time t, observed arm-A events d_A(t) vs
    the expectation d(t)·n_A(t)/n(t) under the pooled-hazard null;
    Z = Σ(O − E) / √ΣV with the hypergeometric variance
    V(t) = d(t)·(n_A/n)·(1 − n_A/n)·(n − d)/(n − 1), and the q407
    closed-form two-sided p. Times with n(t) ≤ 1 contribute zero
    variance (degenerate hypergeometric, skipped — documented).

    Plan: the kaplan_meier shape twice over — one grouped count per
    distinct duration (events and leavers PER ARM), cumulative windows
    over the duration-ordered risk table (O(distinct durations) rows,
    metadata-sized next to the subject table), then ONE 1-row reduce.
    O/E/n are exact integers or single divisions; the O−E and V terms
    ride DECIMAL(25,9) sums of 9dp-rounded values.

    Output: ONE row — (n_a, n_b, events_a, events_b, observed_a,
    expected_a, z, p_two_sided); z/p NULL when ΣV = 0 (no usable
    event times).
    """
    both = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(duration_col).isNotNull()
    )
    is_a = (F.col(group_col) == group_a).cast("int")
    base = both.select(
        F.col(duration_col).alias("_t"),
        F.col(observed_col).cast("int").alias("_e"),
        is_a.alias("_a"),
    )
    per_t = base.groupBy("_t").agg(
        F.sum("_e").cast("long").alias("_d"),
        F.sum(F.col("_e") * F.col("_a")).cast("long").alias("_da"),
        F.count("*").cast("long").alias("_leave"),
        F.sum("_a").cast("long").alias("_leave_a"),
    )
    tot = base.agg(
        F.count("*").cast("long").alias("_n_all"),
        F.sum("_a").cast("long").alias("_n_a_all"),
        F.sum(F.col("_e") * F.col("_a")).cast("long").alias("events_a"),
        F.sum(F.col("_e") * (1 - F.col("_a"))).cast("long").alias(
            "events_b"
        ),
    )
    w = Window.orderBy("_t")
    risk = per_t.crossJoin(F.broadcast(tot)).select(
        "*",
        (
            F.col("_n_all")
            - F.coalesce(
                F.sum("_leave").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).alias("_nt"),
        (
            F.col("_n_a_all")
            - F.coalesce(
                F.sum("_leave_a").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).alias("_nat"),
    )
    dec = "decimal(25,9)"
    ev = risk.filter(F.col("_d") > 0)
    share = F.col("_nat") / F.col("_nt")
    oe_term = F.round(F.col("_da") - F.col("_d") * share, 9).cast(dec)
    v_term = F.when(
        F.col("_nt") > 1,
        F.round(
            F.col("_d")
            * share
            * (1 - share)
            * (F.col("_nt") - F.col("_d"))
            / (F.col("_nt") - 1),
            9,
        ).cast(dec),
    )
    agg = ev.agg(
        F.sum(F.col("_da")).cast("long").alias("observed_a"),
        F.sum(F.round(F.col("_d") * share, 9).cast(dec)).alias("_ea"),
        F.sum(oe_term).alias("_oe"),
        F.coalesce(F.sum(v_term), F.lit(0).cast(dec)).alias("_v"),
        # tot's columns are constants replicated by the broadcast join
        F.max("_n_a_all").alias("n_a"),
        F.max(F.col("_n_all") - F.col("_n_a_all")).alias("n_b"),
        F.max("events_a").alias("events_a"),
        F.max("events_b").alias("events_b"),
    )
    z = F.when(
        F.col("_v").cast("double") > 0,
        F.col("_oe").cast("double") / F.sqrt(F.col("_v").cast("double")),
    )
    from .mlmetrics import normal_p_two_sided

    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("events_a").cast("long").alias("events_a"),
        F.col("events_b").cast("long").alias("events_b"),
        "observed_a",
        F.round(F.col("_ea").cast("double"), 6).alias("expected_a"),
        F.round(z, 6).alias("z"),
        F.when(z.isNotNull(), normal_p_two_sided(z)).alias("p_two_sided"),
    )
