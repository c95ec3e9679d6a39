"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §7 M7 extension — the reference has
no streaming surface at all).

Pattern notes for scale: state is per-key (user), partitioned by the
grouping key across executors; the watermark bounds both late data and
state lifetime (event-time timeout), so state size is O(active users
within the gap window), not O(history). The same operator shape hosts
any accumulate-and-flush analytic (rolling feature windows, dedup
caches, CDC collapse).
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
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("end_us", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)

#: session gap in MICROSECONDS — the engine-wide time unit, matching
#: the batch operators.sessionize scan exactly (parity-tested on the
#: events fixture, whose timestamps carry sub-millisecond precision)
GAP_US = 30 * 60 * 1_000_000


def _sessionize_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this trigger's events for one user into the open session;
    emit closed sessions (gap exceeded inside the batch, or event-time
    timeout when the watermark passes start+gap)."""
    user_id = key[0]
    if state.hasTimedOut:
        start_us, end_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
            }
        )
        return

    ts_us: list[int] = []
    for pdf in pdfs:
        ts_us.extend(int(t.value // 1_000) for t in pdf["ts"])
    ts_us.sort()
    if state.exists:
        start_us, end_us, n = state.get
    else:
        start_us, end_us, n = None, None, 0

    closed: list[tuple[int, int, int]] = []
    for t in ts_us:
        if start_us is None:
            start_us, end_us, n = t, t, 1
        elif t - end_us <= GAP_US:
            end_us, n = max(end_us, t), n + 1
        else:
            closed.append((start_us, end_us, n))
            start_us, end_us, n = t, t, 1
    state.update((start_us, end_us, n))
    # flush the open session once the watermark passes its gap horizon
    # (GroupState timeouts are millisecond-granular: round UP so the
    # microsecond horizon is never undershot)
    state.setTimeoutTimestamp(-(-(end_us + GAP_US) // 1000))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def sessionize_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessions over a streaming events frame with columns
    (ts timestamp, user_id long, ...). Emits one row per closed
    session; open sessions flush via event-time timeout after the
    watermark passes session_end + gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
