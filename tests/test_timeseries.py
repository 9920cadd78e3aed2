"""Unit tests for operators/timeseries.py: gap-fill + LOCF spine
semantics and SCD2 interval construction on tiny hand-checked inputs."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from dbkit_spark.operators.timeseries import gapfill_locf, scd2_history


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def series(spark):
    # key "a": observations in hours 0, 1, 4 (gaps at 2, 3)
    # key "b": observations in hours 2, 3 only (no gaps)
    rows = [
        ("a", _ts(0, 5), 1.0),
        ("a", _ts(1, 10), 2.0),
        ("a", _ts(1, 20), 3.0),
        ("a", _ts(4, 0), 4.0),
        ("b", _ts(2, 30), 10.0),
        ("b", _ts(3, 45), 20.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_gapfill_locf_fills_gaps(series):
    out = gapfill_locf(
        series, "ts", ["k"], {"total": F.sum("v")}, bucket="1 hour"
    ).orderBy("k", "bucket_ts")
    rows = [(r.k, r.bucket_ts.hour, r.n_events, r.is_gap, r.total_locf)
            for r in out.collect()]
    assert rows == [
        ("a", 0, 1, False, 1.0),
        ("a", 1, 2, False, 5.0),   # two rows in hour 1 aggregate
        ("a", 2, 0, True, 5.0),    # gap: carries hour-1 value
        ("a", 3, 0, True, 5.0),
        ("a", 4, 1, False, 4.0),
        ("b", 2, 1, False, 10.0),  # b's spine starts at ITS OWN min
        ("b", 3, 1, False, 20.0),
    ]


def test_gapfill_spine_is_per_key(series):
    """Key b must not inherit key a's time range: 2 buckets, not 5."""
    out = gapfill_locf(series, "ts", ["k"], {"total": F.sum("v")})
    assert out.filter(F.col("k") == "b").count() == 2


def test_gapfill_locf_never_null(series):
    """Every spine starts at the key's first observed bucket, so LOCF
    always has a predecessor."""
    out = gapfill_locf(series, "ts", ["k"], {"total": F.sum("v")})
    assert out.filter(F.col("total_locf").isNull()).count() == 0


@pytest.fixture(scope="module")
def feed(spark):
    rows = [
        # user 1: x -> x (collapse) -> y -> x  => 3 versions
        (1, _ts(0), "x", 100),
        (1, _ts(1), "x", 101),
        (1, _ts(2), "y", 102),
        (1, _ts(3), "x", 103),
        # user 2: single state => 1 open version
        (2, _ts(0), "z", 200),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, state string, event_id long"
    )


def test_scd2_versions_and_intervals(feed):
    out = scd2_history(feed, "user_id", ["state"], "ts", tiebreak="event_id")
    got = {
        (r.user_id, r.version): (r.state, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert got == {
        (1, 1): ("x", _ts(0), _ts(2), False),  # x run collapsed to one row
        (1, 2): ("y", _ts(2), _ts(3), False),
        (1, 3): ("x", _ts(3), None, True),     # reopened state = new version
        (2, 1): ("z", _ts(0), None, True),
    }


def test_scd2_null_state_transitions(spark):
    """NULL->v and v->NULL are changes; NULL->NULL is not (eqNullSafe)."""
    rows = [
        (1, _ts(0), None, 1),
        (1, _ts(1), None, 2),   # no change
        (1, _ts(2), "a", 3),    # change
        (1, _ts(3), None, 4),   # change
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, state string, event_id long"
    )
    out = scd2_history(df, "user_id", ["state"], "ts", tiebreak="event_id")
    states = [r.state for r in out.orderBy("version").collect()]
    assert states == [None, "a", None]


def test_scd2_same_ts_tiebreak_deterministic(spark):
    """Two rows at the identical timestamp: event_id order decides, and
    both orderings of the input produce the identical history."""
    rows = [(1, _ts(0), "a", 2), (1, _ts(0), "b", 1), (1, _ts(1), "c", 3)]
    df1 = spark.createDataFrame(
        rows, "user_id long, ts timestamp, state string, event_id long"
    )
    df2 = spark.createDataFrame(
        list(reversed(rows)), "user_id long, ts timestamp, state string, event_id long"
    )
    out1 = [(r.state, r.version) for r in
            scd2_history(df1, "user_id", ["state"], "ts", "event_id")
            .orderBy("version").collect()]
    out2 = [(r.state, r.version) for r in
            scd2_history(df2, "user_id", ["state"], "ts", "event_id")
            .orderBy("version").collect()]
    assert out1 == out2 == [("b", 1), ("a", 2), ("c", 3)]


def test_ewma_matches_reference_recursion(spark):
    """applyInPandas EWMA must equal the textbook recursion
    y_t = a*x_t + (1-a)*y_(t-1) exactly (same FP operation order as
    pandas adjust=False), per key, with tiebreak determinism."""
    from dbkit_spark.operators.timeseries import ewma

    rows = [
        (1, _ts(0), 10.0, 1),
        (1, _ts(1), 20.0, 2),
        (1, _ts(2), 15.0, 3),
        (2, _ts(0), 5.0, 4),
        (2, _ts(0), 7.0, 5),   # same ts: event_id tiebreak decides order
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    out = {
        (r.user_id, r.ts, r.value): r.ewma
        for r in ewma(df, "ts", ["user_id"], "value", 0.25,
                      tiebreak=["event_id"]).collect()
    }

    def ref(xs, a=0.25):
        ys = [xs[0]]
        for x in xs[1:]:
            ys.append((1 - a) * ys[-1] + a * x)
        return ys

    y1 = ref([10.0, 20.0, 15.0])
    y2 = ref([5.0, 7.0])
    assert out[(1, _ts(0), 10.0)] == y1[0]
    assert out[(1, _ts(1), 20.0)] == y1[1]
    assert out[(1, _ts(2), 15.0)] == y1[2]
    assert out[(2, _ts(0), 5.0)] == y2[0]
    assert out[(2, _ts(0), 7.0)] == y2[1]


def test_ewma_validates_alpha(spark):
    from dbkit_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [(1, _ts(0), 1.0)], "user_id long, ts timestamp, value double"
    )
    with pytest.raises(ValueError):
        ewma(df, "ts", ["user_id"], "value", 0.0)
    with pytest.raises(ValueError):
        ewma(df, "ts", ["user_id"], "value", 1.5)


def test_enrich_with_scd2_point_in_time(spark):
    """Each event gets the dim version valid AT its timestamp: boundary
    events take the new version, pre-history events enrich as NULLs, no
    fan-out (row count preserved), collisions raise, and the
    availableNow streaming replay equals the batch join."""
    import pytest as _pytest

    from dbkit_spark.operators.timeseries import enrich_with_scd2, scd2_history

    feed = spark.createDataFrame(
        [(1, "bronze", 10, 100), (1, "silver", 20, 101), (1, "gold", 30, 102),
         (2, "bronze", 15, 103)],
        "user_id long, tier string, ts long, change_id long",
    )
    dim = scd2_history(feed, "user_id", ["tier"], "ts", tiebreak="change_id")
    events = spark.createDataFrame(
        [(1, 5, 1000), (1, 10, 1001), (1, 25, 1002), (1, 30, 1003),
         (1, 99, 1004), (2, 16, 1005), (3, 50, 1006)],
        "user_id long, ts long, event_id long",
    )
    out = enrich_with_scd2(events, dim, "user_id", "ts")
    got = {r.event_id: (r.tier, r.version) for r in out.collect()}
    assert got == {
        1000: (None, None),      # before user 1's first version
        1001: ("bronze", 1),     # boundary -> the version starting at ts
        1002: ("silver", 2),
        1003: ("gold", 3),       # boundary of the change -> NEW version
        1004: ("gold", 3),       # open current version
        1005: ("bronze", 1),
        1006: (None, None),      # key with no dim history
    }
    assert out.count() == events.count()  # intervals partition time: no fan-out

    with _pytest.raises(ValueError, match="collide"):
        enrich_with_scd2(
            events.withColumn("tier", F.lit("x")), dim, "user_id", "ts"
        )

    # streaming parity: the same events through a file stream
    import tempfile

    src = tempfile.mkdtemp() + "/ev"
    events.coalesce(1).write.parquet(src)
    from dbkit_spark.streaming.runner import run_available_now

    stream = spark.readStream.schema(events.schema).parquet(src)
    streamed = run_available_now(
        enrich_with_scd2(stream, dim, "user_id", "ts"), output_mode="append"
    )
    assert {tuple(r) for r in streamed.collect()} == {
        tuple(r) for r in out.collect()
    }
