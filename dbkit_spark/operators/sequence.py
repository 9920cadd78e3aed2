"""Ordered event-pattern detection — the MATCH_RECOGNIZE shapes
(A then B within t, with no C between) as plain window algebra.

Funnnels (q125) answer "did A precede B"; attribution (q189) answers
"which A gets credit". This operator answers the stricter sequencing
question real conversion / incident / fraud analyses ask: for every B,
find the MOST RECENT prior A in the same partition, require it within a
time bound, and require that no disqualifying event C occurred strictly
between them. SQL engines with MATCH_RECOGNIZE compile simple patterns
to exactly this: conditional running-last-value windows.

Plan: ONE window over (partition key, event time) carrying two
``last(when(...), ignorenulls=True)`` columns (last-A-time,
last-C-time) with a ROWS UNBOUNDED PRECEDING .. 1 PRECEDING frame —
running conditional state, no self-join, no per-key collect_list. At
100 TB that is a single hash-partitioned sort per key group — the same
cost class as any sessionization — and everything after is a map-side
filter. Skewed users salt the same way q64 does.

Cross-engine: the window ordering ties on (ts, event id) — total, so
last() is deterministic; the time bound compares exact integer
microseconds (unix_micros / epoch_us), no float time arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pattern_conversions(
    events: DataFrame,
    partition_col: str,
    ts_col: str,
    type_col: str,
    start_type: str,
    end_type: str,
    within_seconds: int,
    blocker_type: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Rows of ``events`` that COMPLETE the pattern: every ``end_type``
    event with a ``start_type`` event at most ``within_seconds`` earlier
    in the same partition and (optionally) no ``blocker_type`` event
    strictly between the two. Adds ``start_ts`` and ``latency_s``.

    The pattern window is strict: blockers AT the start event's
    timestamp do not disqualify (they are not *between*); ties resolve
    by ``tiebreak_col`` so replays are exact.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = (
        Window.partitionBy(partition_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us: Column = F.unix_micros(F.col(ts_col))
    last_start = F.last(
        F.when(F.col(type_col) == start_type, us), ignorenulls=True
    ).over(w)
    cols = [
        F.col("*"),
        last_start.alias("_start_us"),
    ]
    if blocker_type is not None:
        last_block = F.last(
            F.when(F.col(type_col) == blocker_type, us), ignorenulls=True
        ).over(w)
        cols.append(last_block.alias("_block_us"))
    staged = events.select(*cols)
    cond = (
        (F.col(type_col) == end_type)
        & F.col("_start_us").isNotNull()
        & (F.unix_micros(F.col(ts_col)) - F.col("_start_us") <= within_seconds * 1_000_000)
    )
    if blocker_type is not None:
        cond = cond & (
            F.col("_block_us").isNull() | (F.col("_block_us") <= F.col("_start_us"))
        )
    out = staged.filter(cond).withColumn(
        "start_ts", F.timestamp_micros(F.col("_start_us"))
    )
    out = out.withColumn(
        "latency_s",
        F.round(
            (F.unix_micros(F.col(ts_col)) - F.col("_start_us")) / F.lit(1_000_000.0), 6
        ),
    )
    drop = ["_start_us"] + (["_block_us"] if blocker_type is not None else [])
    return out.drop(*drop)


def window_funnel(
    events: DataFrame,
    partition_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    window_seconds: int,
) -> DataFrame:
    """Multi-step FIRST-TOUCH window funnel (the windowFunnel shape):
    per partition key, the funnel anchors at the EARLIEST ``steps[0]``
    event; each later step must be the earliest matching event STRICTLY
    after the previous step and within ``window_seconds`` of the anchor.
    Output: one row per key with ``funnel_level`` (0..len(steps)) and
    ``anchor_ts`` (the step-1 timestamp, NULL at level 0).

    First-touch greedy semantics are deliberately chosen over
    max-over-all-anchors: they are deterministic, replayable as plain
    nested MIN() SQL (the oracle), and what product funnels report.

    Plan: filter to the step types (funnel-relevant events only — the
    list a key carries is bounded by its own funnel activity, not its
    raw event volume), ONE groupBy(key) with a sorted collect_list of
    (ts_micros, type_idx) structs, then a JVM higher-order ``aggregate``
    fold walks the sorted list once — one exchange total, no window, no
    self-joins, no Python. Time compares exact integer microseconds
    (unix_micros ≡ DuckDB epoch_us), never float time arithmetic.

    Skew caveat: a key whose step-type event count alone is huge still
    collects that list; salt upstream if funnel events themselves skew
    (the q64 rule).
    """
    if len(steps) < 2:
        raise ValueError("steps must have at least 2 entries")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct")
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    win_us = int(window_seconds) * 1_000_000
    idx = F.lit(None).cast("int")
    for i, s in reversed(list(enumerate(steps))):
        idx = F.when(F.col(type_col) == s, F.lit(i)).otherwise(idx)
    evs = (
        events.filter(F.col(type_col).isin(steps))
        .select(
            F.col(partition_col).alias("key"),
            F.struct(
                # ntz sources cast through the session zone first (UTC in
                # build_session) — unix_micros requires TIMESTAMP
                F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
                idx.alias("step"),
            ).alias("e"),
        )
        .groupBy("key")
        .agg(F.array_sort(F.collect_list("e")).alias("evs"))
    )

    zero = F.struct(
        F.lit(0).alias("level"),
        F.lit(None).cast("long").alias("t1"),
        F.lit(None).cast("long").alias("tprev"),
    )

    def fold(acc: Column, x: Column) -> Column:
        start = (acc["level"] == 0) & (x["step"] == 0)
        advance = (
            (acc["level"] > 0)
            & (acc["level"] < len(steps))
            & (x["step"] == acc["level"])
            & (x["us"] > acc["tprev"])
            & (x["us"] <= acc["t1"] + F.lit(win_us))
        )
        return F.struct(
            F.when(start, F.lit(1))
            .when(advance, acc["level"] + 1)
            .otherwise(acc["level"])
            .alias("level"),
            F.when(start, x["us"]).otherwise(acc["t1"]).alias("t1"),
            F.when(start | advance, x["us"])
            .otherwise(acc["tprev"])
            .alias("tprev"),
        )

    done = F.aggregate(F.col("evs"), zero, fold)
    return evs.select(
        F.col("key").alias(partition_col),
        done["level"].alias("funnel_level"),
        F.timestamp_micros(done["t1"]).alias("anchor_ts"),
    )


def markov_transitions(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
    alpha: float = 0.0,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences — the behavioral model next to the funnel ops above:
    P(next state | current state) estimated from every adjacent pair
    in each key's timeline, with optional Laplace smoothing ``alpha``
    (p = (n + alpha) / (row_n + alpha·K), K = number of observed
    states). Output: (state, next_state, n, p) for every observed
    ordered pair (smoothed mass for never-seen pairs is implied by the
    formula, not materialized — the matrix stays sparse).

    ``order_cols`` must end in a unique tiebreaker (ts alone is not a
    total order in event data; same rule as the top-k survivors).

    Scale: one exchange on ``key_col`` for the lead() window (pairs
    never leave their key's partition), then a map-side-combined hash
    agg on (state, next_state) — output is O(K²) metadata, never
    row-sized. K (distinct states) is computed with one tiny agg and
    joined by broadcast-able constant, no collect.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(key_col),
            F.col(state_col).alias("state"),
            F.lead(state_col).over(w).alias("next_state"),
        )
        .filter(F.col("next_state").isNotNull())
    )
    counts = pairs.groupBy("state", "next_state").agg(
        F.count("*").cast("long").alias("n")
    )
    k = df.select(state_col).agg(
        F.countDistinct(state_col).cast("long").alias("_k")
    )
    wrow = Window.partitionBy("state")
    return (
        counts.crossJoin(F.broadcast(k))
        .select(
            "state",
            "next_state",
            "n",
            (
                (F.col("n") + F.lit(alpha))
                / (F.sum("n").over(wrow) + F.lit(alpha) * F.col("_k"))
            ).alias("p"),
        )
    )
