"""Streaming window funnel — the stateful-stream twin of
`operators/sequence.window_funnel`.

The batch operator folds each key's (finished) event list once; the
product-analytics deployment wants the same first-touch funnel level
advancing LIVE as events arrive: per-key (level, anchor, last-step
time) state carried across micro-batches, each batch's events folded in
order exactly as the batch fold would — so at every point the stream
has emitted precisely the level the batch operator would compute over
the events seen so far. Same fold, two runtimes — the batch/stream
parity discipline of the CUSUM/windowed-PSI families (SURVEY §2.9).

State is three scalars per key (int + two longs) — RocksDB-ready,
O(keys) memory; within a micro-batch rows sort by the time column,
across batches the file source's per-file ordering is the replay
contract (the q215 ingest-loop rule). Out-of-order arrivals ACROSS
batches degrade exactly like they would in any first-touch funnel fed
late data: a step event older than the current state cannot rewind it
(documented, tested) — watermark-and-replay is the recovery path.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_funnel(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    window_seconds: int,
) -> DataFrame:
    """Per-key funnel progress over an event stream: after each
    micro-batch emits (key, funnel_level, anchor_us) — the first-touch
    level over all events seen so far. Filter to ``steps`` types
    upstream or here (done here for safety); output mode: update."""
    if len(steps) < 2:
        raise ValueError("steps must have at least 2 entries")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct")
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    win_us = int(window_seconds) * 1_000_000
    step_idx = {s: i for i, s in enumerate(steps)}
    n_steps = len(steps)
    dtypes = dict(events.dtypes)
    out_schema = (
        f"{key_col} {dtypes[key_col]}, funnel_level int, anchor_us bigint, "
        "n_seen bigint"
    )
    state_schema = "level int, t1 bigint, tprev bigint, n_seen bigint"

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        level, t1, tprev, n_seen = (
            state.get if state.exists else (0, -1, -1, 0)
        )
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("_us").reset_index(drop=True)
        for us, et in zip(pdf["_us"], pdf[type_col]):
            si = step_idx.get(et)
            if si is None:
                continue
            us = int(us)
            if level == 0 and si == 0:
                level, t1, tprev = 1, us, us
            elif (
                0 < level < n_steps
                and si == level
                and us > tprev
                and us <= t1 + win_us
            ):
                level, tprev = level + 1, us
        n_seen += len(pdf)
        state.update((level, t1, tprev, n_seen))
        # n_seen makes "the latest state per key" selectable downstream
        # (max n_seen) without relying on sink insertion order
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "funnel_level": [level],
                "anchor_us": [t1 if t1 >= 0 else None],
                "n_seen": [n_seen],
            }
        )

    # ts may be a timestamp (any flavor) or already-extracted epoch
    # micros (bigint) — replay fixtures often ship the integer form
    ts_dtype = dtypes[ts_col]
    us_col = (
        F.col(ts_col).cast("long")
        if ts_dtype in ("bigint", "int")
        else F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    return (
        events.filter(F.col(type_col).isin(steps))
        .select(
            key_col,
            type_col,
            us_col.alias("_us"),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
