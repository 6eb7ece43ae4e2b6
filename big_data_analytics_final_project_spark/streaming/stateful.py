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


# ---------------------------------------------------------------------------
# Incremental gaps-and-islands RUN collapse (the VALUE-change islands of
# queries/windows.py::user_event_runs, stateful) — run boundaries are
# event-type changes, not time gaps, so the open-state shape differs
# from the sessionizer's: closing is triggered by the NEXT event's
# type, and only the watermark can close a user's final run.

RUN_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("run_start", T.TimestampType()),
        T.StructField("run_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_micro", T.LongType()),
    ]
)

_RUN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_micro", T.LongType()),
    ]
)


def _emit_run(
    user: int, etype: str, start_us: int, last_us: int, n: int, micro: int
) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user],
            "event_type": [etype],
            "run_start": [pd.to_datetime(start_us, unit="us")],
            "run_end": [pd.to_datetime(last_us, unit="us")],
            "n_events": [n],
            "sum_micro": [micro],
        }
    )


def _make_run_fold(idle_close_us: int):
    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (user,) = key
        if state.hasTimedOut:
            etype, start_us, last_us, n, micro = state.get
            state.remove()
            # n > 0 guard: a defensively-stored empty state (below)
            # must flush silently, never emit a NULL-typed zero-run
            if n > 0:
                yield _emit_run(user, etype, start_us, last_us, n, micro)
            return

        if state.exists:
            etype, start_us, last_us, n, micro = state.get
        else:
            etype, start_us, last_us, n, micro = None, -1, -1, 0, 0

        # same chunk discipline as the sessionizer: applyInPandasWithState
        # may split one group across pandas chunks in arbitrary order;
        # concat+sort restores the (ts, event_id) fold order the batch
        # window uses, so run numbering is identical
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
            # floor(v*1e6 + 0.5) integer micro-units (streaming/tws.py
            # convention): the running total is exact integer math, so
            # emissions are chunking-independent
            micros = (
                np.floor(pdf["value"].fillna(0.0).to_numpy() * 1e6 + 0.5)
                .astype("int64")
            )
            types = pdf["event_type"].to_numpy()
            for t_us, v_micro, t_type in zip(ts_us, micros, types):
                t_us, v_micro, t_type = int(t_us), int(v_micro), str(t_type)
                if etype is None:
                    etype, start_us, last_us = t_type, t_us, t_us
                    n, micro = 1, v_micro
                elif t_type == etype:
                    # extension (or a late same-type event folded in
                    # place — bounded disorder degrades bounds, never
                    # state size)
                    last_us = max(last_us, t_us)
                    n += 1
                    micro += v_micro
                else:
                    yield _emit_run(user, etype, start_us, last_us, n, micro)
                    etype, start_us, last_us = t_type, t_us, t_us
                    n, micro = 1, v_micro

        if etype is None:
            # no prior state and only empty chunks this trigger: there
            # is no run to hold — storing (None, -1, ...) would arm a
            # timeout that emits a garbage row at the epoch
            return
        state.update((etype, start_us, last_us, n, micro))
        # a run has no natural end-time: flush it when the user goes
        # idle past the horizon (watermark-driven, state never leaks)
        state.setTimeoutTimestamp(
            max(
                last_us // 1000 + idle_close_us // 1000,
                state.getCurrentWatermarkMs() + 1,
            )
        )

    return fold


def stateful_run_collapse(
    events: DataFrame,
    idle_close_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Incremental value-change run collapse with explicit state.

    Emits one row per CLOSED run (append mode): the same
    (user_id, event_type, run_start, run_end, n_events) frame the
    batch `user_event_runs` window produces, with the value total in
    exact integer micro-units. State is ONE open run per user —
    O(active users), independent of stream length.

    Ordering contract: run semantics need per-key in-order arrival
    (a Kafka partition keyed by user, or the chunked replay source);
    within-trigger disorder is repaired by the concat+sort, and a
    late SAME-type event folds into the open run, but a late
    CROSS-type event under the watermark starts a new run rather than
    splitting history — bounded-disorder degradation, like the
    sessionizer's duration note. The idle flush is likewise a POLICY:
    a user who resumes the same type after ``idle_close_seconds`` of
    silence opens a NEW run (state cannot be held for unboundedly
    quiet keys) — size the horizon to the longest silence the domain
    treats as continuity.
    """
    prepared = events.selectExpr(
        "CAST(user_id AS BIGINT) AS user_id",
        "ts",
        "CAST(event_id AS BIGINT) AS event_id",
        "event_type",
        "CAST(value AS DOUBLE) AS value",
    ).withWatermark("ts", watermark)
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_run_fold(idle_close_seconds * 1_000_000),
        outputStructType=RUN_SCHEMA,
        stateStructType=_RUN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
