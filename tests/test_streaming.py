"""Structured Streaming parity tests (SURVEY.md §2.10 / §7).

Strategy: replay the events fixture through real file-based streams and
assert the emitted rows against the BATCH event-time plans —
``e1_tumbling_window`` / ``e3_session_window`` are the ground truth.

Multi-batch tests split the fixture into time-ordered files and replay
one file per micro-batch so the watermark actually advances between
batches (single-file replays never close an append-mode window).
"""

from __future__ import annotations

import math
import os
import time

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from etl_pipeline_telecom_spark.plans.eventtime import e1_tumbling_window, e3_session_window
from etl_pipeline_telecom_spark.streaming import (
    read_events_stream,
    run_available_now,
    sessionize_with_state,
    stream_dedup,
    stream_session_agg,
    stream_tumbling_counts,
)

from .conftest import SF_DIR


def _split_events(out_dir: str, n_files: int = 4, copies: int = 1) -> None:
    """Write the fixture's events as n time-ordered parquet files with
    strictly increasing mtimes (FileStreamSource replays oldest-first).
    ``ts`` is cast to int64 epoch-nanos — same shape the engine reads."""
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    ts_idx = t.schema.get_field_index("ts")
    t = t.set_column(ts_idx, "ts", t["ts"].cast("timestamp[ns]").cast("int64"))
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    step = math.ceil(t.num_rows / n_files)
    base = time.time() - 3600
    for i in range(n_files):
        chunk = t.slice(i * step, step)
        for c in range(copies):
            path = os.path.join(out_dir, f"{i:02d}_{c}.parquet")
            pq.write_table(chunk, path)
            os.utime(path, (base + 10 * i + c, base + 10 * i + c))


def _rows(df) -> set[tuple]:
    return {tuple(r) for r in df.collect()}


def test_stream_tumbling_complete_equals_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir, glob="events.parquet")
    out, _ = run_available_now(stream_tumbling_counts(stream), output_mode="complete")
    assert _rows(out) == _rows(e1_tumbling_window(spark, sf_dir))


def test_stream_session_append_multibatch(spark, sf_dir, tmp_path):
    _split_events(str(tmp_path), n_files=4)
    stream = read_events_stream(spark, str(tmp_path), max_files_per_trigger=1)
    out, progress = run_available_now(stream_session_agg(stream))
    emitted = _rows(out)
    batch = _rows(e3_session_window(spark, sf_dir))
    assert emitted, "no sessions closed across 4 micro-batches"
    assert emitted <= batch, f"streaming emitted sessions not in batch result: {sorted(emitted - batch)[:3]}"


def test_stateful_sessionize_multibatch(spark, sf_dir, tmp_path):
    _split_events(str(tmp_path), n_files=4)
    stream = read_events_stream(spark, str(tmp_path), max_files_per_trigger=1)
    out, _ = run_available_now(sessionize_with_state(stream))
    emitted = _rows(out)
    batch = _rows(e3_session_window(spark, sf_dir))
    assert emitted, "stateful sessionizer emitted nothing"
    assert emitted <= batch, f"stateful sessions diverge from batch: {sorted(emitted - batch)[:3]}"


import importlib.util

try:
    # find_spec raises ModuleNotFoundError if the parent 'google' pkg is absent
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    _HAS_PROTOBUF = False


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="pyspark's transformWithStateInPandas state server needs protobuf "
    "(not installed in this container); sessionize_with_tws raises a clear "
    "RuntimeError instead — covered by test_tws_requires_protobuf",
)
def test_tws_sessionize_parity_with_legacy(spark, sf_dir, tmp_path):
    """transformWithStateInPandas port emits the same closed sessions as
    the applyInPandasWithState path on the same multi-batch replay, and
    both stay a subset of the batch session_window ground truth."""
    from etl_pipeline_telecom_spark.streaming import sessionize_with_tws

    _split_events(str(tmp_path), n_files=4)
    legacy_out, _ = run_available_now(
        sessionize_with_state(read_events_stream(spark, str(tmp_path), max_files_per_trigger=1))
    )
    tws_out, _ = run_available_now(
        sessionize_with_tws(read_events_stream(spark, str(tmp_path), max_files_per_trigger=1))
    )
    legacy, tws = _rows(legacy_out), _rows(tws_out)
    assert tws, "TWS sessionizer emitted nothing"
    assert tws == legacy, (
        f"paths diverge: only-legacy={sorted(legacy - tws)[:3]} only-tws={sorted(tws - legacy)[:3]}"
    )
    batch = _rows(e3_session_window(spark, sf_dir))
    assert tws <= batch


@pytest.mark.skipif(_HAS_PROTOBUF, reason="with protobuf present the parity test runs instead")
def test_tws_requires_protobuf(spark, sf_dir):
    """Without protobuf the TWS path must fail fast with a clear message,
    not crash the streaming python worker mid-query."""
    from etl_pipeline_telecom_spark.streaming import read_events_stream, sessionize_with_tws

    stream = read_events_stream(spark, sf_dir, glob="events.parquet")
    with pytest.raises(RuntimeError, match="protobuf"):
        sessionize_with_tws(stream)


def test_stream_dedup_within_watermark(spark, tmp_path):
    # every file written twice → exact duplicates within the watermark window
    _split_events(str(tmp_path), n_files=2, copies=2)
    n_events = pq.read_metadata(os.path.join(SF_DIR, "events.parquet")).num_rows
    stream = read_events_stream(spark, str(tmp_path), max_files_per_trigger=1)
    out, _ = run_available_now(stream_dedup(stream, keys=["event_id"]))
    assert out.count() == n_events


def test_stream_stream_join_multibatch(spark, sf_dir, tmp_path):
    """The join must stay complete when the replay spans micro-batches and
    the watermark evicts state between them."""
    from etl_pipeline_telecom_spark.plans.streaming import st4_stream_stream_join
    from etl_pipeline_telecom_spark.streaming.jobs import stream_stream_click_error_join
    import pyspark.sql.functions as F

    _split_events(str(tmp_path), n_files=4)
    clicks = read_events_stream(spark, str(tmp_path), max_files_per_trigger=1).where(
        F.col("event_type") == "click"
    )
    errors = read_events_stream(spark, str(tmp_path), max_files_per_trigger=1).where(
        F.col("event_type") == "error"
    )
    out, _ = run_available_now(stream_stream_click_error_join(clicks, errors))
    # batch ground truth via the single-batch catalog entry (oracle-checked)
    batch = _rows(st4_stream_stream_join(spark, sf_dir))
    assert _rows(out) == batch


def test_foreach_batch_parquet_sink(spark, tmp_path):
    """foreachBatch: the arbitrary-sink escape hatch — write each micro-batch
    to parquet and verify the union of batches is exactly the input."""
    import pyspark.sql.functions as F

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _split_events(str(src_dir), n_files=3)
    out_dir = str(tmp_path / "out")
    stream = read_events_stream(spark, str(src_dir), max_files_per_trigger=1)

    def write_batch(df, epoch_id):
        df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    written = spark.read.parquet(out_dir)
    n_events = pq.read_metadata(os.path.join(SF_DIR, "events.parquet")).num_rows
    assert written.count() == n_events
    assert written.select("epoch").distinct().count() == 3  # one write per micro-batch
    assert written.select("event_id").distinct().count() == n_events


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Restarting from a checkpoint must not re-emit already-processed files:
    run 1 sees file A; run 2 (same checkpoint) sees A+B and must emit only B."""
    import pyspark.sql.functions as F

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    ts_idx = t.schema.get_field_index("ts")
    t = t.set_column(ts_idx, "ts", t["ts"].cast("timestamp[ns]").cast("int64"))
    half = t.num_rows // 2

    def run_once():
        stream = read_events_stream(spark, str(src_dir))
        q = (
            stream.writeStream.foreachBatch(
                lambda df, epoch: df.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    pq.write_table(t.slice(0, half), str(src_dir / "a.parquet"))
    run_once()
    first = spark.read.parquet(out_dir).count()
    assert first == half

    pq.write_table(t.slice(half), str(src_dir / "b.parquet"))
    run_once()
    written = spark.read.parquet(out_dir)
    assert written.count() == t.num_rows  # B emitted once, A NOT re-emitted
    assert written.select("event_id").distinct().count() == t.num_rows


def test_incremental_hourly_rollup(spark, sf_dir, tmp_path):
    """The continuously-maintained rollup must converge to the batch answer:
    every hour partition holds the final complete totals after replay."""
    from etl_pipeline_telecom_spark.streaming.jobs import maintain_hourly_rollup

    src = tmp_path / "src"
    src.mkdir()
    _split_events(str(src), n_files=4)
    out = str(tmp_path / "rollup")
    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    maintain_hourly_rollup(stream, out)
    rollup = {tuple(r) for r in spark.read.parquet(out).select(
        "window_start_us", "event_type", "cnt", "sum_value").collect()}
    batch = _rows(e1_tumbling_window(spark, sf_dir))
    assert rollup == batch


def test_stream_stream_join_exact_window_bound(spark, tmp_path):
    """st4's join keeps errors in [click - 5min, click] INCLUSIVE on both
    ends. Random fixtures never land on the exact bound, so pin it through
    the real streaming join: an error exactly 5 minutes before the click
    pairs; one microsecond earlier does not; same-microsecond pairs."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_telecom_spark.streaming import read_events_stream
    from etl_pipeline_telecom_spark.streaming.jobs import (
        run_available_now,
        stream_stream_click_error_join,
    )

    t0 = dt.datetime(2026, 5, 1, 12, 0, 0)
    rows = [
        # user 1: error EXACTLY 5 min before the click -> pairs
        (1, t0 - dt.timedelta(minutes=5), 1, "error"),
        (2, t0, 1, "click"),
        # user 2: error 5 min + 1 µs before -> out of window
        (3, t0 - dt.timedelta(minutes=5, microseconds=1), 2, "error"),
        (4, t0, 2, "click"),
        # user 3: error at the same microsecond as the click -> pairs
        (5, t0, 3, "error"),
        (6, t0, 3, "click"),
    ]
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(table, str(tmp_path / "events.parquet"))

    clicks = read_events_stream(spark, str(tmp_path)).where("event_type = 'click'")
    errors = read_events_stream(spark, str(tmp_path)).where("event_type = 'error'")
    out, _ = run_available_now(stream_stream_click_error_join(clicks, errors))
    pairs = {(r["click_id"], r["error_id"]) for r in out.collect()}
    assert pairs == {(2, 1), (6, 5)}


def test_st7_maintained_bloom_equals_eager_build(spark, sf_dir):
    """st7's incrementally-maintained sketch must be BYTE-equal to the
    eager batch build (OR over micro-batches == bloom of the union), and
    the replay must actually exercise the multi-batch path."""
    import glob
    import os

    from etl_pipeline_telecom_spark.plans.dedup import (
        _build_bloom,
        eval_shingle_hashes,
    )
    from etl_pipeline_telecom_spark.streaming.jobs import (
        maintain_contamination_bloom,
        replay_table_slices,
    )

    replay = replay_table_slices(sf_dir, "documents")
    files = glob.glob(os.path.join(replay, "*.parquet"))
    assert len(files) >= 4, "replay must split the corpus into micro-batches"

    state = os.path.join("/tmp", f"st7_test_bloom_{os.getpid()}.bin")
    if os.path.exists(state):
        os.remove(state)
    try:
        maintained = maintain_contamination_bloom(spark, replay, state)
        eager = _build_bloom(eval_shingle_hashes(spark, sf_dir))
        assert maintained == eager
        # idempotence: re-running the maintenance over the same replay
        # (a restart replaying every batch) must not change the sketch
        remaintained = maintain_contamination_bloom(spark, replay, state)
        assert remaintained == eager
    finally:
        if os.path.exists(state):
            os.remove(state)


def test_st7_result_equals_d13_batch(spark, sf_dir):
    from etl_pipeline_telecom_spark.plans.dedup import d13_contamination_bloom
    from etl_pipeline_telecom_spark.plans.streaming import st7_stream_bloom_refresh

    a = {tuple(r) for r in d13_contamination_bloom(spark, sf_dir).collect()}
    b = {tuple(r) for r in st7_stream_bloom_refresh(spark, sf_dir).collect()}
    assert a == b and a


def test_st8_live_centroids_equal_batch_recompute(spark, sf_dir):
    """The stream-maintained centroid must equal the batch v3-style
    recompute over the FULL embeddings table (exact integer moment sums
    make batch boundaries invisible), and the replay must be multi-batch."""
    import glob
    import os

    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.similarity import _quantized
    from etl_pipeline_telecom_spark.plans.streaming import st8_stream_centroid_drift
    from etl_pipeline_telecom_spark.streaming.jobs import replay_table_slices

    replay = replay_table_slices(sf_dir, "embeddings")
    assert len(glob.glob(os.path.join(replay, "*.parquet"))) >= 4

    got = {
        (r["label"], r["dim"]): r["live_centroid"]
        for r in st8_stream_centroid_drift(spark, sf_dir).collect()
    }
    want = {
        (r["label"], r["dim"]): r["c"]
        for r in (
            _quantized(spark, sf_dir)
            .select("label", F.posexplode("qv").alias("dim", "val"))
            .groupBy("label", "dim")
            .agg(F.round(F.sum("val") / F.count(F.lit(1)), 6).alias("c"))
        ).collect()
    }
    assert got == want and got


def _write_events_file(d: str, fname: str, rows, mtime: float) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    path = os.path.join(d, fname)
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def _stage_late_arrival_dir(tmp_path):
    """Four micro-batches: on-time events → two far-future watermark
    advancers → rows older than the advanced watermark (must be DROPPED).

    TWO advancers because the watermark used to filter batch N's input is
    computed from data through batch N-2 (the same one-batch lag the st3
    sentinel replay handles with two sentinels): advancer #1 raises the
    event-time high mark, advancer #2's batch makes it the FILTERING
    watermark, so the late file in batch 3 is dropped. Both advancers
    share one hourly window/session (5 min apart, user 99) whose end stays
    above every watermark the stream ever reaches — it never closes, so
    the appended result must equal the batch aggregation over
    on_time_rows alone. Returns (dir, on_time_rows, n_late)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    on_time = [
        (1, t0 + 5 * m, 1, "click", 10.0),
        (2, t0 + 20 * m, 1, "click", 2.5),
        (3, t0 + 70 * m, 1, "click", 4.0),  # second hourly window / session
    ]
    adv1 = [(50, dt.datetime(2024, 1, 20, 0, 0, 0), 99, "click", 1.0)]
    adv2 = [(51, dt.datetime(2024, 1, 20, 0, 5, 0), 99, "click", 1.0)]
    late = [
        (60, t0 + 30 * m, 1, "click", 100.0),
        (61, t0 + 75 * m, 1, "click", 100.0),
    ]
    base = time.time() - 3600
    d = str(tmp_path)
    _write_events_file(d, "00_ontime.parquet", on_time, base)
    _write_events_file(d, "01_advancer.parquet", adv1, base + 10)
    _write_events_file(d, "02_advancer.parquet", adv2, base + 20)
    _write_events_file(d, "03_late.parquet", late, base + 30)
    return d, on_time, len(late)


def _run_append_with_progress(spark, agg):
    import itertools as it
    import json as jsonlib

    name = f"late_test_{next(_LATE_IDS)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        if q.isActive:
            q.stop()
    dropped = 0
    for p in q.recentProgress:
        prog = jsonlib.loads(p.json) if hasattr(p, "json") else p
        for op in prog.get("stateOperators", []):
            dropped += op.get("numRowsDroppedByWatermark", 0)
    return spark.table(name), dropped


import itertools as _it  # noqa: E402

_LATE_IDS = _it.count()


def test_watermark_drops_late_rows_tumbling(spark, tmp_path):
    """SURVEY §2.10 late-data surface (VERDICT r6 item 6): rows arriving
    beyond the watermark are EXCLUDED from the tumbling aggregation, the
    exclusion is exactly what a batch filter would remove, and the
    StreamingQueryProgress drop accounting says so."""
    d, on_time, n_late = _stage_late_arrival_dir(tmp_path)
    stream = read_events_stream(spark, d, glob="*.parquet", max_files_per_trigger=1)
    out, dropped = _run_append_with_progress(spark, stream_tumbling_counts(stream))

    batch = spark.createDataFrame(
        on_time, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    expected = _rows(stream_tumbling_counts(batch))  # watermark is a no-op in batch
    assert _rows(out) == expected  # late rows absent; advancer window never closed
    assert dropped == n_late


def test_watermark_drops_late_rows_sessions(spark, tmp_path):
    d, on_time, n_late = _stage_late_arrival_dir(tmp_path)
    stream = read_events_stream(spark, d, glob="*.parquet", max_files_per_trigger=1)
    out, dropped = _run_append_with_progress(spark, stream_session_agg(stream))

    batch = spark.createDataFrame(
        on_time, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    expected = _rows(stream_session_agg(batch))
    assert _rows(out) == expected
    assert dropped == n_late


def _has_rocksdb_jni() -> bool:
    import glob

    import pyspark

    return bool(
        glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "rocksdbjni*.jar"))
    )


@pytest.mark.skipif(
    not _has_rocksdb_jni(),
    reason="rocksdbjni jar not bundled with this pyspark build",
)
def test_stateful_sessionize_on_rocksdb_state_store(spark, sf_dir):
    """VERDICT r7 item 7: the 100 TB state-store configuration, proven —
    st3's applyInPandasWithState sessionizer on RocksDBStateStoreProvider
    (state on local disk, not executor heap) over the sentinel replay:

    1. the provider actually engaged (rocksdb* custom metrics live in the
       state-operator progress),
    2. watermark-timeout EVICTION removed state rows (every session closes
       → state.remove()),
    3. the emitted session set is IDENTICAL to the batch gaps-and-islands
       ground truth — same rows the default-provider st3 path emits.
    """
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.session import enable_rocksdb_state_store
    from etl_pipeline_telecom_spark.streaming.jobs import replay_dir_with_sentinels

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    changelog_key = (
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    )
    saved = spark.conf.get(conf_key, None)
    saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
    replay = replay_dir_with_sentinels(sf_dir, glob="events.parquet")
    try:
        enable_rocksdb_state_store(spark)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        stream = read_events_stream(spark, replay, glob="*.parquet", max_files_per_trigger=1)
        q = (
            sessionize_with_state(stream)
            .writeStream.format("memory")
            .queryName("rocksdb_sessions")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        finally:
            if q.isActive:
                q.stop()
        progresses = list(q.recentProgress)
        got = _rows(spark.table("rocksdb_sessions").where(F.col("user_id") >= 0))
    finally:
        if saved is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, saved)
        spark.conf.unset(changelog_key)
        spark.conf.set("spark.sql.shuffle.partitions", saved_parts)

    ops = [op for p in progresses for op in p.get("stateOperators", [])]
    assert ops, "no state operators reported progress"
    rocks_keys = {
        k for op in ops for k in (op.get("customMetrics") or {}) if k.startswith("rocksdb")
    }
    assert rocks_keys, "no rocksdb* metrics — provider did not engage"
    assert sum(op.get("numRowsRemoved", 0) for op in ops) > 0, (
        "no state rows evicted — timeouts never removed closed sessions"
    )
    batch = _rows(e3_session_window(spark, sf_dir))
    assert got == batch, (
        f"RocksDB-backed sessions diverge from batch: "
        f"only-stream={sorted(got - batch)[:3]} only-batch={sorted(batch - got)[:3]}"
    )


def test_st11_stream_throttle_equals_batch_and_evicts_dead_state(spark, sf_dir):
    """The streaming throttle emits EXACTLY the batch g2 kept set on the
    sentinel replay, and its event-time timeout actually deletes state
    (the exact-TTL argument: watermark past last_kept + GAP makes the
    stored timestamp semantically dead)."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.semistructured import g2_throttle_debounce
    from etl_pipeline_telecom_spark.streaming import read_events_stream
    from etl_pipeline_telecom_spark.streaming.jobs import replay_dir_with_sentinels
    from etl_pipeline_telecom_spark.streaming.stateful import throttle_with_state

    replay = replay_dir_with_sentinels(sf_dir, glob="events.parquet")
    saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream = read_events_stream(spark, replay, glob="*.parquet", max_files_per_trigger=1)
        q = (
            throttle_with_state(stream)
            .writeStream.format("memory")
            .queryName("st11_throttle")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        finally:
            if q.isActive:
                q.stop()
        progresses = list(q.recentProgress)
        got = _rows(spark.table("st11_throttle").where(F.col("user_id") >= 0))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved_parts)

    batch = _rows(g2_throttle_debounce(spark, sf_dir))
    assert got == batch, (
        f"stream kept set diverges from batch: only-stream="
        f"{sorted(got - batch)[:3]} only-batch={sorted(batch - got)[:3]}"
    )
    removed = sum(
        op.get("numRowsRemoved", 0)
        for p in progresses
        for op in p.get("stateOperators", [])
    )
    assert removed > 0, "timeouts never evicted dead throttle state"
