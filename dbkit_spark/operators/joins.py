"""Join surface (SURVEY.md §2.3 — all Tier C; the reference only hints at
a broadcast "Tiny table" join in ``util/copy_value.rs:101-102``).

Everything delegates to Catalyst's join selection; the helpers add the
scale discipline: explicit broadcast for small dimensions, plan guards
against accidental nested-loop joins, and distributed strategies for the
two joins Spark lacks natively (as-of, interval/range) built from
equi-join-able primitives so they shuffle on keys instead of exploding.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..errors import AttributeMissing

_VALID = {
    "inner", "left", "right", "full", "left_semi", "left_anti", "cross",
    "leftouter", "rightouter", "fullouter", "semi", "anti",
}


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    if how not in _VALID:
        raise ValueError(f"unknown join type {how!r}; one of {sorted(_VALID)}")
    if isinstance(on, str):
        on = [on]
    if isinstance(on, (list, tuple)):
        for c in on:
            if c not in left.columns:
                raise AttributeMissing(c, left.columns)
            if c not in right.columns:
                raise AttributeMissing(c, right.columns)
        return left.join(right, list(on), how)
    return left.join(right, on, how)


def broadcast_join(
    left: DataFrame, right_small: DataFrame, on: str | Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """The reference's envisioned "Tiny table ... always alive" join
    (``copy_value.rs:101-102``): replicate the small side to every
    executor; no shuffle of the big side."""
    return join(left, F.broadcast(right_small), on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_key: str,
    on_time: str,
    right_time: str | None = None,
    direction: str = "backward",
    suffix: str = "_r",
    tolerance: str | None = None,
) -> DataFrame:
    """Distributed as-of join (event-time nearest match per key).

    Strategy (SURVEY.md §2.3): union both sides tagged by origin, sort
    within key by time, and carry the most recent right-side row forward
    with ``last(ignorenulls=True)`` over an unbounded-preceding window.
    One shuffle on the key — same cost profile as a regular sort-merge
    join; no range explosion, scales to arbitrarily dense right sides.

    direction="backward": latest right row with rtime <= ltime.
    direction="forward":  earliest right row with rtime >= ltime.

    ``tolerance`` (an interval literal body, e.g. ``"5 minutes"`` —
    pandas ``merge_asof``'s parameter) caps the allowed time gap: a
    carried match farther than the tolerance is nulled out instead of
    joined. Applied as a map-side post-filter on the carried row's
    timestamp — the plan (one key shuffle) is unchanged.

    Ties (multiple right rows sharing key + timestamp) are broken
    deterministically by the greatest right-side payload tuple — the
    window orderBy includes the payload columns, so the survivor does not
    depend on partition layout. Map-typed right columns are excluded from
    the tiebreak (not orderable in Spark).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rt = right_time or on_time

    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns if c != on_key]

    l_tagged = left.select(
        F.col(on_key).alias("__key"),
        F.col(on_time).cast("timestamp").alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
    )
    r_tagged = right.select(
        F.col(on_key).alias("__key"),
        F.col(rt).cast("timestamp").alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    from pyspark.sql.types import MapType

    tiebreak = [
        F.col(f"__r_{c}").asc_nulls_first()
        for c in rcols
        if not isinstance(right.schema[c].dataType, MapType)
    ]
    if direction == "backward":
        # right rows sort before left rows at equal time => <= semantics;
        # payload tiebreak makes the equal-time survivor deterministic
        w = (
            Window.partitionBy("__key")
            .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), *tiebreak)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy("__key")
            .orderBy(F.col("__t").desc(), F.col("__is_left").asc(), *tiebreak)
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    if not rcols:
        return unioned.filter(F.col("__is_left") == 1).select(
            *[F.col(c) for c in lcols]
        )
    # Carry the matched right row as ONE struct: per-column last(ignorenulls)
    # would mix values from different right rows whenever payloads contain
    # nulls (column-wise LOCF, not row-wise as-of semantics).
    r_struct = F.when(
        F.col("__is_left") == 0,
        F.struct(
            F.col("__t").alias("__rt"),
            *[F.col(f"__r_{c}").alias(c) for c in rcols],
        ),
    )
    filled = unioned.select(
        "*", F.last(r_struct, ignorenulls=True).over(w).alias("__r")
    )
    if tolerance is not None:
        gap_ok = (
            F.col("__r.__rt") >= F.col("__t") - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("__r.__rt") <= F.col("__t") + F.expr(f"INTERVAL {tolerance}")
        )
        filled = filled.withColumn(
            "__r", F.when(gap_ok, F.col("__r")).otherwise(F.lit(None))
        )
    out = filled.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col("__r")[c].alias(c + suffix if c in lcols else c) for c in rcols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bin_size: float,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Interval/overlap join without a nested-loop plan.

    Bin-bucketing rewrite (SURVEY.md §2.3): explode each right interval
    into the fixed-width bins it overlaps, equi-join on the bin (plus any
    extra keys), then re-check the exact range predicate. Turns an O(n·m)
    BroadcastNestedLoopJoin into a shuffled equi-join whose fan-out is
    bounded by interval_width / bin_size — the standard trick for range
    joins at 100 TB.
    """
    bin_l = (F.col(left_val) / F.lit(bin_size)).cast("long").alias("__bin")
    l_binned = left.select("*", bin_l)
    r_binned = right.select(
        "*",
        F.explode(
            F.sequence(
                (F.col(right_lo) / F.lit(bin_size)).cast("long"),
                (F.col(right_hi) / F.lit(bin_size)).cast("long"),
            )
        ).alias("__bin"),
    )
    on = ["__bin"] + (extra_on or [])
    joined = l_binned.join(r_binned, on, "inner").filter(
        (F.col(left_val) >= F.col(right_lo)) & (F.col(left_val) <= F.col(right_hi))
    )
    return joined.drop("__bin")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-mitigating equi-join for a hot-keyed big left side.

    The standard salting rewrite for the case AQE skew-split can't fix
    (one key >> one partition even after splitting, right side too big to
    broadcast): the left side gets a deterministic salt in
    ``[0, salt_buckets)`` (xxhash64 of the whole row — reproducible, no
    rand()), the right side is replicated ``salt_buckets`` times, and the
    join key becomes (key, salt). The hot key's rows now spread over
    ``salt_buckets`` partitions; the cost is a bounded right-side blowup.
    Results are exactly the plain equi-join's (tests assert equality).
    """
    if how not in ("inner", "left", "leftouter"):
        raise ValueError("salted_join supports inner/left joins only")
    on_cols = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)
    ).alias("__salt")
    l_salted = left.select("*", salt)
    r_replicated = right.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>")).alias(
            "__salt"
        ),
    )
    return join(l_salted, r_replicated, on_cols + ["__salt"], how).drop("__salt")
