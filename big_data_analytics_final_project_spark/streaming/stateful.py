"""Custom stateful streaming operator: incremental sessionization via
``applyInPandasWithState``.

The built-in ``session_window`` (streaming/__init__.py) defines a
session's end as *last event + gap*. The batch sessionizer
(operators/sessionize.py) — which mirrors what the reference's
generator synthesizes directly (reference data_generator.py:252-321:
explicit start_time/end_time/duration_seconds per session) — reports
*last − first*. This operator reproduces the batch semantics
incrementally: it is the engine's template for stateful logic Spark's
built-in windows can't express.

Mechanics (the part that matters at 100 TB):

- State is keyed by user and holds ONE open session
  (start_us, last_us, n_events, sum_value) — O(distinct active users)
  rows in the state store, independent of event volume.
- A session closes and is EMITTED when (a) a later event for the same
  user arrives more than ``gap`` after the session's last event, or
  (b) the event-time watermark passes last_event + gap
  (``GroupStateTimeout.EventTimeTimeout``) — so state for idle users
  is evicted, not leaked.
- Arrow moves each group's rows as pandas batches; per-row Python cost
  is vectorized away (brief: Pandas-UDF path, never row-at-a-time).

Late events (possible under the watermark bound) that sort before the
open session's last event are folded into that session without moving
its end — bounded disorder degrades duration, never state size.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _emit(user: int, start_us: int, last_us: int, n: int, sv: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user],
            "session_start": [pd.to_datetime(start_us, unit="us")],
            "session_end": [pd.to_datetime(last_us, unit="us")],
            "n_events": [n],
            "sum_value": [sv],
            "duration_s": [(last_us - start_us) / 1_000_000.0],
        }
    )


def _make_fold(gap_us: int):
    gap_ms = gap_us // 1000

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            start_us, last_us, n, sv = state.get
            state.remove()
            yield _emit(user, start_us, last_us, n, sv)
            return

        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us = last_us = -1
            n, sv = 0, 0.0

        # Materialize ALL of this group's chunks before folding:
        # applyInPandasWithState may split one group's batch across
        # several pandas chunks in arbitrary order, and folding a
        # later-timestamp chunk first would merge sessions the batch
        # sessionizer splits (session_start never moves backward). One
        # concat+sort restores a global order; chunk sizes are bounded
        # by spark.sql.execution.arrow.maxRecordsPerBatch, and a single
        # group's per-trigger volume is micro-batch-bounded, so the
        # buffering is small and per-group, never per-partition.
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values("ts", kind="mergesort")
            ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
            vals = pdf["value"].fillna(0.0).to_numpy()
            for t_us, v in zip(ts_us, vals):
                t_us = int(t_us)
                if start_us < 0:
                    start_us, last_us, n, sv = t_us, t_us, 1, float(v)
                elif t_us - last_us > gap_us:
                    yield _emit(user, start_us, last_us, n, sv)
                    start_us, last_us, n, sv = t_us, t_us, 1, float(v)
                else:
                    # in-gap successor, or a late event folded in place
                    last_us = max(last_us, t_us)
                    n += 1
                    sv += float(v)

        state.update((start_us, last_us, n, sv))
        # Close the open session when the watermark passes last + gap.
        # The timeout timestamp must be ahead of the current watermark.
        state.setTimeoutTimestamp(
            max(last_us // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        )

    return fold


def stateful_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Incremental gaps-and-islands sessionization with explicit state.

    Emits one row per CLOSED session (append mode): same
    (user_id, session_start, session_end, n_events, duration_s) the
    batch `operators.sessionize.sessionize` produces, plus sum_value.
    """
    prepared = events.selectExpr(
        f"CAST({user_col} AS BIGINT) AS user_id",
        f"{ts_col} AS ts",
        f"CAST({value_col} AS DOUBLE) AS value",
    ).withWatermark("ts", watermark)
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_fold(gap_seconds * 1_000_000),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
