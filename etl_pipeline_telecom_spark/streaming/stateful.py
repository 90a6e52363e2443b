"""Custom stateful streaming operator: sessionization via
``applyInPandasWithState`` (SURVEY.md §7 — the one stateful op the
built-ins can't fully express when you need custom per-session payloads,
e.g. emitting a feature vector per closed session for a training
pipeline).

Semantics match the gaps-and-islands oracle
(``plans/eventtime.py::E3_SESSION_SQL``): a session groups consecutive
events of one user with gaps < 30 min; ``session_end = last_event + gap``
(a new session starts when the gap is >= the threshold). At an
EXACTLY-threshold gap this splits — like the oracle and DuckDB, unlike
the builtin ``session_window`` which merges touching bounds; see the
boundary note at ``E3_SESSION_SQL`` (the family's single source of
truth). Sessions are emitted when they CLOSE:
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

    This (``applyInPandasWithState``) is the DEFAULT sessionizer path;
    :func:`sessionize_with_tws` is the Spark-4 ``transformWithStateInPandas``
    twin, usable where ``protobuf`` is installed (its state-server protocol
    needs it; pyspark does not declare it as a hard dependency).
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


def sessionize_with_tws(events: DataFrame, *, watermark: str = "10 minutes") -> DataFrame:
    """``transformWithStateInPandas`` twin of :func:`sessionize_with_state`.

    Same session semantics (30-min gap, exclusive end, close on supersede
    or watermark timer); state is the same 4-field tuple in a ValueState
    instead of the legacy GroupState, and the event-time timeout becomes
    an explicit registered timer. Parity between both paths is asserted in
    tests/test_streaming.py. The legacy path stays the default until the
    TWS state-store format is the standard — both run on Spark 4.1. The
    StatefulProcessor import is local so importing this module never
    requires the ABC (pyspark>=4.0 only).

    Runtime requirements beyond the legacy path: the RocksDB state store
    (flipped below) and the ``protobuf`` package — pyspark's TWS state
    server speaks protobuf to the python worker but does not declare the
    dependency, so a bare environment crashes the worker with a bewildering
    "driver worker exited unexpectedly". Fail fast here instead.
    """
    import importlib.util

    try:
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # parent 'google' namespace pkg absent
        has_protobuf = False
    if not has_protobuf:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pyspark's TWS state server protocol); install protobuf or use "
            "sessionize_with_state (applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    class SessionizeProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState("open_sess", SESSION_STATE_SCHEMA)

        def handleInputRows(
            self, key: tuple, rows: Iterable[pd.DataFrame], timerValues: "TimerValues"
        ) -> Iterable[pd.DataFrame]:
            (user_id,) = key
            batch = pd.concat(list(rows), ignore_index=True).sort_values("ts_us")
            open_sess = list(self._sess.get()) if self._sess.exists() else None
            closed: list[dict] = []
            for ts_us, value in zip(batch["ts_us"], batch["value"]):
                ts_us = int(ts_us)
                if open_sess is None:
                    open_sess = [ts_us, ts_us, 1, _cents(value)]
                elif ts_us - open_sess[1] >= GAP_US:
                    closed.append(_emit(user_id, *open_sess))
                    open_sess = [ts_us, ts_us, 1, _cents(value)]
                else:
                    # same late-event monotonicity rule as _sessionize_group
                    open_sess[1] = max(open_sess[1], ts_us)
                    open_sess[2] += 1
                    open_sess[3] += _cents(value)

            self._sess.update(tuple(open_sess))
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            end_ms = (open_sess[1] + GAP_US) // 1000
            self._handle.registerTimer(max(end_ms, timerValues.getCurrentWatermarkInMs() + 1))
            if closed:
                yield pd.DataFrame(closed)

        def handleExpiredTimer(
            self, key: tuple, timerValues: "TimerValues", expiredTimerInfo: "ExpiredTimerInfo"
        ) -> Iterable[pd.DataFrame]:
            if self._sess.exists():
                (user_id,) = key
                start, last, n, cents = self._sess.get()
                self._sess.clear()
                yield pd.DataFrame([_emit(user_id, start, last, n, cents)])

        def close(self) -> None:
            pass

    # TWS runs only on the RocksDB state store; the legacy HDFS-backed
    # provider is still fine for applyInPandasWithState, so flip the
    # session conf here (runtime-settable, picked up at query start).
    # CAUTION: this conf is SESSION-GLOBAL — every streaming query started
    # after this call inherits RocksDB, and a legacy query restarting from
    # an HDFS-provider checkpoint would hit a state-store format mismatch.
    # We therefore refuse to clobber an explicit non-default user setting
    # instead of silently overriding it (ADVICE r2).
    _PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
    _HDFS_DEFAULT = (
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    )
    _ROCKSDB = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    current = events.sparkSession.conf.get(_PROVIDER_CONF, _HDFS_DEFAULT)
    if current not in (_HDFS_DEFAULT, _ROCKSDB):
        raise RuntimeError(
            f"sessionize_with_tws needs the RocksDB state store, but "
            f"{_PROVIDER_CONF} is explicitly set to {current!r}; refusing to "
            "override a user-chosen provider. Unset it or set it to RocksDB, "
            "and note the flip applies to ALL later streaming queries in "
            "this session."
        )
    events.sparkSession.conf.set(_PROVIDER_CONF, _ROCKSDB)
    prepared = events.withWatermark("ts", watermark).select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value", "ts"
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionizeProcessor(),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )


# ---------------------------------------------------------------------------
# Streaming CDC apply (st10): the stateful twin of plans/pipeline.p4 —
# same changelog semantics (event_id%10==9 is a DELETE tombstone, latest
# (ts, event_id) op wins, deletes suppress the key, later upserts
# resurrect it), maintained incrementally in the state store and flushed
# by the event-time watermark (sentinel replay, the st3 mechanics).
# State is ONE small tuple per live key — bounded by distinct keys, not
# stream volume: the materialized-view maintenance shape.

CDC_OUTPUT_SCHEMA = (
    "user_id long, event_type string, live_event_id long, live_ts_us long, "
    "live_value double, n_ops long, n_deletes long"
)
CDC_STATE_SCHEMA = (
    "ts_us long, event_id long, is_del boolean, value double, n_ops long, n_deletes long"
)


def _cdc_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    user_id, event_type = key
    if state.hasTimedOut:
        ts_us, event_id, is_del, value, n_ops, n_deletes = state.get
        state.remove()
        if not is_del:  # a delete-last key materializes NO row (p4 filter)
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "event_type": event_type,
                        "live_event_id": event_id,
                        "live_ts_us": ts_us,
                        "live_value": value,
                        "n_ops": n_ops,
                        "n_deletes": n_deletes,
                    }
                ]
            )
        return

    batch = pd.concat(list(pdfs), ignore_index=True)
    cur = list(state.get) if state.exists else None
    for ts_us, event_id, value in zip(batch["ts_us"], batch["event_id"], batch["value"]):
        ts_us, event_id = int(ts_us), int(event_id)
        is_del = event_id % 10 == 9
        if cur is None:
            cur = [ts_us, event_id, is_del, float(value), 1, int(is_del)]
        else:
            cur[4] += 1
            cur[5] += int(is_del)
            if (ts_us, event_id) > (cur[0], cur[1]):
                cur[0], cur[1], cur[2], cur[3] = ts_us, event_id, is_del, float(value)
    state.update(tuple(cur))
    # no natural close: flush when the watermark finally passes (the
    # sentinel advances it a year past the data)
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
    return
    yield  # pragma: no cover — makes this a generator in the no-emit path


def cdc_apply_with_state(events: DataFrame, *, watermark: str = "10 minutes") -> DataFrame:
    """events stream → incrementally-maintained live table (append on flush).

    Emits each (user_id, event_type) key's materialized row when the
    event-time watermark passes its timeout — on a sentinel replay that
    is exactly once per key, after all real data: the batch p4 SQL is an
    exact oracle.
    """
    prepared = events.withWatermark("ts", watermark).select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id", "value", "ts"
    )
    return prepared.groupBy("user_id", "event_type").applyInPandasWithState(
        _cdc_group,
        outputStructType=CDC_OUTPUT_SCHEMA,
        stateStructType=CDC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming throttle (st11): the stateful twin of plans/semistructured.g2 —
# the same greedy per-user debounce (keep an event iff >= GAP after the
# last KEPT one), maintained incrementally in the state store. State is
# ONE long per user (the last kept timestamp), and its eviction is EXACT,
# not heuristic: once the event-time watermark passes last_kept + GAP,
# every future on-time event satisfies ts >= last_kept + GAP regardless of
# the stored value — the state is semantically dead and the event-time
# timeout removes it. (Same argument that makes g2b's gap-split segments
# independent.) So state size is bounded by users ACTIVE within one GAP
# window, not by all users ever seen — the TTL every production
# rate-limiter needs, here with a proof instead of a knob.

THROTTLE_GAP_US = 86_400 * 1_000_000  # 1 day; sync with plans/semistructured._G2_GAP_US
THROTTLE_OUTPUT_SCHEMA = "user_id long, event_id long, kept_ts_us long"
THROTTLE_STATE_SCHEMA = "last_kept_us long, max_seen_us long"


def _throttle_stream_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()  # watermark >= last_kept + GAP: provably dead state
        return
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts_us", "event_id"])
    last, max_seen = (state.get[0], state.get[1]) if state.exists else (None, None)
    # RUNTIME GUARD on the in-order delivery contract (ADVICE r8): the
    # greedy recurrence is exact only if each user's events arrive
    # event-time-ordered ACROSS micro-batches. Spark's watermark filter
    # drops rows older than the watermark before they reach this function,
    # but a row inside the watermark slack can still arrive after a later
    # row was decided — append mode cannot retract that decision, so fail
    # LOUDLY instead of emitting silently-wrong keeps.
    if max_seen is not None and int(batch["ts_us"].iloc[0]) < max_seen:
        raise ValueError(
            f"st11 in-order contract violated for user {user_id}: event at "
            f"{int(batch['ts_us'].iloc[0])}us arrived after a batch that ended "
            f"at {max_seen}us; an append-mode greedy throttle cannot retract "
            "earlier keep decisions. Deliver per-user event-time-ordered "
            "input (the replay harness does), or sessionize upstream."
        )
    max_seen = max(int(batch["ts_us"].iloc[-1]), max_seen or 0)
    kept: list[dict] = []
    for ts_us, eid in zip(batch["ts_us"], batch["event_id"]):
        ts_us = int(ts_us)
        if last is None or ts_us >= last + THROTTLE_GAP_US:
            kept.append(
                {"user_id": user_id, "event_id": int(eid), "kept_ts_us": ts_us}
            )
            last = ts_us
    state.update((int(last), int(max_seen)))
    state.setTimeoutTimestamp(
        max((last + THROTTLE_GAP_US) // 1000, state.getCurrentWatermarkMs() + 1)
    )
    if kept:
        yield pd.DataFrame(kept)


def throttle_with_state(events: DataFrame, *, watermark: str = "10 minutes") -> DataFrame:
    """events(ts timestamp, user_id, event_id, ...) → KEPT events.

    Kept rows emit immediately (append mode) — the throttle DECIDES at
    arrival time; the watermark only drives state eviction. Exactness vs
    the batch recurrence requires event-time-ordered arrival per user
    (the bounded-replay harness guarantees it). The contract is ENFORCED
    at runtime: state carries the max event time already processed, and a
    batch whose first row precedes it raises instead of silently keeping
    the wrong events (see ``_throttle_stream_group``).
    """
    prepared = events.withWatermark("ts", watermark).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _throttle_stream_group,
        outputStructType=THROTTLE_OUTPUT_SCHEMA,
        stateStructType=THROTTLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
