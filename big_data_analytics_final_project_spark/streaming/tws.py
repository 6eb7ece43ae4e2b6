"""Custom stateful streaming operator on the `transformWithState`
API — Spark 4's successor to `applyInPandasWithState` (streaming/
stateful.py keeps the classic API; together they cover both stateful
surfaces an operator author meets on a modern cluster).

The operator maintains a per-user LIFETIME PROFILE — event count,
purchase count, exact value total, first/last activity — updated
incrementally per micro-batch and re-emitted on every change (output
mode Update): the "user feature store" pattern, where downstream
serving reads the latest row per key.

What the new API buys over applyInPandasWithState, used here:
- named, schema'd state variables (`getValueState`) instead of one
  opaque tuple — evolvable independently;
- state lives in the state store keyed by user: O(distinct users)
  rows, independent of event volume (100 TB safe);
- optional TTL and timers exist on the same handle (not used here —
  a lifetime profile never expires by design).

Exactness discipline: the value total is accumulated as
floor(v·1e6 + 0.5) INTEGER micro-units, so the running total is
order- and batching-independent — the streamed profile equals the
batch aggregate bit-for-bit no matter how the stream was chunked
(same quantized-sum discipline as operators/kmeans.py).

ENVIRONMENT NOTE: running transformWithState end-to-end requires the
`google.protobuf` package (the Python↔state-server protocol), which
this container does not ship — the same env-blocked category as the
media codecs (operators/multimodal.py). The processor's fold logic is
therefore unit-tested directly against a fake state handle
(tests/test_streaming.py), and the end-to-end stream==batch test
skips unless protobuf is importable (it runs on any real cluster)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

PROFILE_SCHEMA = (
    "user_id bigint, n_events bigint, n_purchases bigint, "
    "sum_value_q bigint, first_us bigint, last_us bigint"
)
_STATE_SCHEMA = (
    "n bigint, npur bigint, sumq bigint, first_us bigint, last_us bigint"
)


def quantize_micro(series: pd.Series) -> int:
    """Σ floor(v·1e6 + 0.5) over non-null values, as a Python int."""
    import numpy as np

    vals = series.dropna().to_numpy(dtype="float64")
    if len(vals) == 0:
        return 0
    return int(np.floor(vals * 1e6 + 0.5).astype("int64").sum())


class UserProfileProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._profile = handle.getValueState("profile", _STATE_SCHEMA)

    def handleInputRows(
        self,
        key: tuple[Any, ...],
        rows: Iterator[pd.DataFrame],
        timerValues: Any,
    ) -> Iterator[pd.DataFrame]:
        n = npur = sumq = 0
        first_us: int | None = None
        last_us: int | None = None
        for pdf in rows:
            n += len(pdf)
            npur += int((pdf["event_type"] == "purchase").sum())
            sumq += quantize_micro(pdf["value"])
            # drop NaT BEFORE the int64 view: a NaT would otherwise
            # become INT64_MIN and silently corrupt first/last — null
            # timestamps are ignored, mirroring quantize_micro's
            # dropna discipline for the sum
            ts_us = (
                pdf["ts"].dropna().astype("datetime64[us]").astype("int64")
            )
            if len(ts_us):
                lo, hi = int(ts_us.min()), int(ts_us.max())
                first_us = lo if first_us is None else min(first_us, lo)
                last_us = hi if last_us is None else max(last_us, hi)
        if n == 0:
            return
        if self._profile.exists():
            pn, ppur, psum, pfirst, plast = self._profile.get()
            n += pn
            npur += ppur
            sumq += psum
            firsts = [x for x in (first_us, pfirst) if x is not None]
            lasts = [x for x in (last_us, plast) if x is not None]
            first_us = min(firsts) if firsts else None
            last_us = max(lasts) if lasts else None
        self._profile.update((n, npur, sumq, first_us, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_purchases": [npur],
                "sum_value_q": [sumq],
                "first_us": [first_us],
                "last_us": [last_us],
            }
        )

    def close(self) -> None:
        pass


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Per-user lifetime profile over a (streaming or batch) events
    frame; in streaming, re-emits a user's row whenever a micro-batch
    touches that user."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
