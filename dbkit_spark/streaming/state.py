"""Custom stateful streaming operators (SURVEY.md §2.9 "stateful
processing") on BOTH public surfaces:

- ``user_running_stats``: ``applyInPandasWithState`` (Spark 3.4+ API) —
  per-user running event count / value sum / max, the canonical
  "profile accumulator" shape for an event pipeline. State is one tiny
  tuple per user; at scale the state store shards by the group key, so
  memory is O(distinct users / executor), not O(events).
- ``user_running_stats_tws``: the same operator on Spark 4's
  ``transformWithStateInPandas`` (typed state handles, multiple state
  variables per key, event-time timers — the successor surface).
  EXECUTION-GATED in this container: the TransformWithStateInPySpark
  state-protocol worker requires the ``google.protobuf`` Python runtime,
  which is not installed here and cannot be (no package installs).
  ``tws_runtime_available()`` probes for it; the code path itself is
  real, plan/schema construction is always tested, and the execution
  parity test runs wherever protobuf exists (any standard PySpark 4
  deployment).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("vmax", DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, vmax = state.get
    else:
        n, total, vmax = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            vmax = max(vmax, float(pdf["value"].max()))
    state.update((n, total, vmax))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 6)],
            "max_value": [vmax],
        }
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Per-user running stats over a stream of events(user_id, value)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def tws_runtime_available() -> bool:
    """True when ``transformWithStateInPandas`` can actually execute:
    its Python state-protocol worker imports ``google.protobuf`` at
    startup, so a missing protobuf runtime crashes every TWS query at
    run time (plan construction still works)."""
    import importlib.util

    try:
        # find_spec on a dotted name imports the parent package, which
        # itself raises when the 'google' namespace is entirely absent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


class UserStatsProcessor(StatefulProcessor):
    """``StatefulProcessor`` computing the same per-user running stats as
    ``_update`` on Spark 4's ``transformWithStateInPandas`` surface
    (SURVEY.md §2.9). Differences from the legacy API that matter at
    scale: state is a typed handle (``getValueState``) against the
    RocksDB-backed store rather than one opaque tuple, multiple
    independent state variables (value/list/map) can coexist per key,
    and event-time timers (``registerTimer``/``handleExpiredTimer``)
    replace the single timeout conf — the right base for TTL'd profile
    state over an unbounded user universe."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("stats", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        if self._state.exists():
            n, total, vmax = self._state.get()
        else:
            n, total, vmax = 0, 0.0, float("-inf")
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                vmax = max(vmax, float(pdf["value"].max()))
        self._state.update((n, total, vmax))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "max_value": [vmax],
            }
        )

    def close(self) -> None:
        pass


def user_running_stats_tws(events: DataFrame) -> DataFrame:
    """Per-user running stats on ``transformWithStateInPandas`` — result-
    identical to ``user_running_stats`` (parity-tested); the Spark-4
    stateful surface with typed state handles and timer support."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )
