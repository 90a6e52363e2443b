"""Custom stateful streaming operator: sessionization via
``applyInPandasWithState`` (SURVEY.md §7 — the one stateful op the
built-ins can't fully express when you need custom per-session payloads,
e.g. emitting a feature vector per closed session for a training
pipeline).

Semantics match ``plans/eventtime.py::e3_session_window`` exactly:
a session groups consecutive events of one user with gaps < 30 min;
``session_end = last_event + gap`` (exclusive end — a new session starts
when the gap is >= the threshold). Sessions are emitted when they CLOSE:
either superseded within a micro-batch (a later event opened a new
session) or timed out by the event-time watermark.

Scale notes: state is one small tuple per open session per user, keyed
by user_id in the state store — bounded by active users, not event
volume. Arrow batches move the per-user event groups into pandas; the
per-group loop is O(events of that user in this batch).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import functions as F

GAP_US = 30 * 60 * 1_000_000

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, n_events long, sum_value double"
)
# open-session state: (start_us, last_us, n_events, sum_cents)
SESSION_STATE_SCHEMA = "start_us long, last_us long, n_events long, sum_cents long"


def _cents(v: float) -> int:
    # half-up to cents, matching CAST(value AS DECIMAL(18,2)) for positive values
    return int(v * 100 + 0.5)


def _emit(user_id: int, start: int, last: int, n: int, cents: int) -> dict:
    return {
        "user_id": user_id,
        "session_start_us": start,
        "session_end_us": last + GAP_US,
        "n_events": n,
        "sum_value": cents / 100.0,
    }


def _sessionize_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, cents = state.get
        state.remove()
        yield pd.DataFrame([_emit(user_id, start, last, n, cents)])
        return

    batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_us")
    open_sess = list(state.get) if state.exists else None
    closed: list[dict] = []
    for ts_us, value in zip(batch["ts_us"], batch["value"]):
        ts_us = int(ts_us)
        if open_sess is None:
            open_sess = [ts_us, ts_us, 1, _cents(value)]
        elif ts_us - open_sess[1] >= GAP_US:
            closed.append(_emit(user_id, *open_sess))
            open_sess = [ts_us, ts_us, 1, _cents(value)]
        else:
            # a late in-watermark event from a later micro-batch may carry
            # ts_us < the open session's last event; max() keeps the session
            # end monotone so gap checks match batch session_window semantics
            open_sess[1] = max(open_sess[1], ts_us)
            open_sess[2] += 1
            open_sess[3] += _cents(value)

    state.update(tuple(open_sess))
    # wake up when the watermark passes the open session's end
    end_ms = (open_sess[1] + GAP_US) // 1000
    state.setTimeoutTimestamp(max(end_ms, state.getCurrentWatermarkMs() + 1))
    if closed:
        yield pd.DataFrame(closed)


def sessionize_with_state(events: DataFrame, *, watermark: str = "10 minutes") -> DataFrame:
    """events(ts timestamp, user_id, value, ...) → closed sessions.

    The input must be a streaming DataFrame; the watermark drives the
    event-time timeout that flushes idle sessions.
    """
    prepared = events.withWatermark("ts", watermark).select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value", "ts"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
