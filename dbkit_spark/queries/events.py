"""Event-time windowed queries over the events table (SURVEY.md §2.9).

q34-q36 run the window builders in *batch* mode with exact DuckDB oracles
(epoch arithmetic reproduces Spark's epoch-aligned windows, TZ-free).
q37 replays the SAME tumbling aggregation through Structured Streaming
(file source → availableNow → memory sink) and must match the same oracle —
batch/stream parity is the correctness claim.
q38 is a custom stateful streaming operator (applyInPandasWithState):
rows-only for the driver; exact-value parity with batch is pytest-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.aggregate import stable_sum, stable_sum_sql
from ..sources import read_table
from ..streaming.runner import read_events_stream, run_available_now
from ..streaming.windows import session_agg, sliding_agg, tumbling_agg

_EPOCH = "TIMESTAMP '1970-01-01 00:00:00'"


def _bin_sql(sec: int, offset: int = 0) -> str:
    """Spark-compatible epoch-aligned window start, TZ-free."""
    expr = f"CAST(floor((epoch(ts) - {offset}) / {sec}) * {sec} + {offset} AS BIGINT)"
    return f"{_EPOCH} + to_seconds({expr})"


# --- B5: tumbling window aggregation (batch) -------------------------------
@register(
    "q34_tumbling_window",
    oracle=f"""
    SELECT {_bin_sql(300)} AS window_start,
           {_bin_sql(300)} + to_seconds(300) AS window_end,
           event_type,
           COUNT(*) AS n,
           {stable_sum_sql("value")} AS total_value
    FROM events
    GROUP BY window_start, window_end, event_type
    """,
    notes="5-minute tumbling windows, epoch-aligned like F.window",
)
def q34_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split=False: partial agg on (window, type) reduces events before
    # the one exchange; the split's extra shuffle measured net-negative
    events = read_table(spark, sf_dir, "events", split=False)
    return tumbling_agg(
        events,
        "ts",
        "5 minutes",
        ["event_type"],
        {"n": F.count("*"), "total_value": stable_sum("value")},
    )


# --- sliding windows -------------------------------------------------------
@register(
    "q35_sliding_window",
    oracle=f"""
    WITH slid AS (
      SELECT e.*, {_EPOCH} + to_seconds(
               CAST((floor((epoch(ts) - o.off) / 600) * 600 + o.off) AS BIGINT)
             ) AS window_start
      FROM events e, (VALUES (0), (300)) AS o(off)
      WHERE epoch(ts) >= CAST(floor((epoch(ts) - o.off) / 600) * 600 + o.off AS BIGINT)
        AND epoch(ts) < CAST(floor((epoch(ts) - o.off) / 600) * 600 + o.off AS BIGINT) + 600
    )
    SELECT window_start, window_start + to_seconds(600) AS window_end,
           event_type, COUNT(*) AS n
    FROM slid
    GROUP BY window_start, window_end, event_type
    """,
    notes="10-min windows sliding by 5 min: each event in exactly 2 windows",
)
def q35_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return sliding_agg(
        events, "ts", "10 minutes", "5 minutes", ["event_type"], {"n": F.count("*")}
    )


# --- session windows -------------------------------------------------------
@register(
    "q36_session_window",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM d
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id, COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    notes="session_window(gap=30m) == gaps-and-islands; new session at "
    "inter-event gap >= 30m, end = last event + gap (Spark semantics)",
)
def q36_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return session_agg(
        events, "ts", "30 minutes", ["user_id"], {"n_events": F.count("*")}
    )


# --- streaming replay of q34 (batch/stream parity) -------------------------
@register(
    "q37_stream_tumbling_replay",
    oracle=f"""
    SELECT {_bin_sql(300)} AS window_start,
           {_bin_sql(300)} + to_seconds(300) AS window_end,
           event_type,
           COUNT(*) AS n,
           {stable_sum_sql("value")} AS total_value
    FROM events
    GROUP BY window_start, window_end, event_type
    """,
    notes="SAME oracle as q34, computed via readStream + availableNow + "
    "memory sink: structured-streaming replay must equal batch",
)
def q37_stream_tumbling_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir)
    agg = tumbling_agg(
        stream,
        "ts",
        "5 minutes",
        ["event_type"],
        {"n": F.count("*"), "total_value": stable_sum("value")},
    )
    return run_available_now(agg, output_mode="complete")


# --- custom stateful streaming operator ------------------------------------
@register(
    "q38_stateful_user_stats",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value,
           max(value) AS max_value
    FROM events GROUP BY user_id
    """,
    notes="applyInPandasWithState custom operator. Converted from "
    "rows-only in round 11 (VERDICT r10 item 4): in update mode over "
    "the single-micro-batch events fixture (the q353 single-file "
    "assumption, guarded by tests/test_round10.py's scale-dir "
    "enumeration) the memory sink holds exactly one final row per "
    "user, so the batch GROUP BY is a full SQL oracle — the "
    "streaming-vs-batch parity previously only pytest-asserted in "
    "tests/test_streaming.py is now driver-replayed; 6dp rounding on "
    "total_value on both legs absorbs pandas-vs-sequential summation "
    "ulp",
)
def q38_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.state import user_running_stats

    stream = read_events_stream(spark, sf_dir)
    return run_available_now(user_running_stats(stream), output_mode="update")


# --- grouped-map pandas (§2.10) --------------------------------------------
@register(
    "q94_grouped_zscore",
    oracle="""
    SELECT event_id, event_type,
           round(CASE WHEN sd = 0 THEN 0.0 ELSE (value - m) / sd END, 6) AS z
    FROM (SELECT event_id, event_type, value,
                 avg(value) OVER (PARTITION BY event_type) AS m,
                 stddev_pop(value) OVER (PARTITION BY event_type) AS sd
          FROM events)
    """,
    notes="grouped-map applyInPandas (operators/grouped.grouped_zscore): "
    "per-group z-score where each whole group lands in one Python worker; "
    "the oracle is the JVM-side window rewrite of the same statistic — "
    "which is also the recommended plan when groups are huge or keys are "
    "few (grouped-map caps parallelism at group count); round-6 "
    "canonicalization per SURVEY §7.4",
)
def q94_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.grouped import grouped_zscore

    events = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return grouped_zscore(events, ["event_type"], "value").select(
        "event_id", "event_type", F.round("z", 6).alias("z")
    )


# --- batch sessionization --------------------------------------------------
@register(
    "q95_sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, value, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 86400
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, value, ts,
             CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_num
      FROM flagged
    )
    SELECT user_id, session_num, COUNT(*) AS n_events,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS start_s,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS end_s,
           {stable_sum_sql("value")} AS total_value
    FROM sess GROUP BY user_id, session_num
    """,
    notes="gap-based batch sessionization (operators/window.sessionize), "
    "the batch twin of q36's streaming session window: 24 h inactivity gap "
    "splits each user's stream; lag-flag + running-sum share ONE shuffle "
    "(identical window specs collapse to one exchange), then session-level "
    "aggregates; second-resolution gap arithmetic mirrored exactly in SQL; "
    "event_id tiebreak makes per-user order total",
)
def q95_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.window import sessionize

    events = read_table(spark, sf_dir, "events")
    sess = sessionize(events, "user_id", "ts", 86400, "event_id")
    return sess.groupBy("user_id", "session_num").agg(
        F.count("*").alias("n_events"),
        F.unix_timestamp(F.min("ts")).alias("start_s"),
        F.unix_timestamp(F.max("ts")).alias("end_s"),
        stable_sum("value").alias("total_value"),
    )


# --- time-range rolling window ---------------------------------------------
@register(
    "q97_trailing_window_1h",
    oracle=f"""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    notes="event-time RANGE frame (§2.5): per-user trailing-1h count/sum — "
    "the time-windowed twin of q25's numeric RANGE frame. Both engines "
    "order by the SAME integer epoch-seconds key so frame membership is "
    "identical (an interval frame over raw ns-vs-us timestamps could "
    "disagree at boundaries); same-second peers share frames by RANGE "
    "semantics; decimal-stabilized window sum",
)
def q97_trailing_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.aggregate import dec

    events = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum(dec("value", 6)).over(w).cast("double").alias("sum_1h"),
    )


# --- streaming dedup within watermark --------------------------------------
@register(
    "q100_stream_dedup",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n, {stable_sum_sql("value")} AS total_value
    FROM events GROUP BY event_type
    """,
    notes="dropDuplicatesWithinWatermark (§2.9): the event stream is "
    "unioned with a second replay of itself — every row arrives twice, in "
    "different micro-batches — and streaming dedup state must collapse the "
    "duplicates so per-type counts equal the single-copy batch oracle; "
    "dedup runs in the stream (append mode), the final rollup is batch "
    "over the sink table",
)
def q100_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    s1 = read_events_stream(spark, sf_dir)
    s2 = read_events_stream(spark, sf_dir)
    deduped = (
        s1.unionByName(s2)
        .withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type", "value")
    )
    sink = run_available_now(deduped, output_mode="append")
    return sink.groupBy("event_type").agg(
        F.count("*").alias("n"), stable_sum("value").alias("total_value")
    )
