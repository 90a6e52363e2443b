"""SparkSession factory.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default all cores) but every
config here is chosen to also hold on a multi-executor cluster:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic join-strategy switching — the knobs that keep a 100 TB shuffle
  from dying on a hot key.
- Arrow on: vectorized Python interop for the few Pandas-UDF operators.
- Session timezone pinned to UTC so timestamp semantics are deterministic
  and match the DuckDB oracle (naive-UTC timestamps).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE coalesces from a high initial count, so we set the initial
  partition number rather than hand-tuning per query.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "etl-pipeline-telecom-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session with scale-appropriate defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = int(cpus)
        except ValueError:
            shuffle_partitions = os.cpu_count() or 8
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # broadcast true dimensions only: the 10MB default is large enough to
        # broadcast-build a mid-size FACT at local scale (sf0.1 lineitem ≈
        # 8MB), which inverts on a cluster; measured perf-neutral locally,
        # and AQE still upgrades genuinely small sides at runtime
        .config("spark.sql.autoBroadcastJoinThreshold", str(4 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # fixture events.ts is parquet TIMESTAMP(NANOS) which Spark rejects;
        # read as long and convert in sources.load_table (ns → µs, truncating
        # exactly like DuckDB's CAST(ts AS TIMESTAMP))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # keep 10× the default stage history so StageMetricsTracker's
        # per-query delta() cannot lose stages to eviction inside one
        # iterative query (ADVICE r9); the tracker ALSO detects and
        # reports any gap via the stage_id_gaps channel
        .config("spark.ui.retainedStages", "10000")
    )
    return builder.getOrCreate()


#: Production state-store provider for long-running stateful streams
#: (st3 sessionizer, st10 CDC apply). The default HDFSBackedStateStoreProvider
#: keeps every state row ON-HEAP per executor — fine for bounded tests,
#: but a 100 TB stream whose state is "all currently-active users" needs
#: state that spills to local disk and restores incrementally. RocksDB is
#: the stock answer (rocksdbjni ships inside pyspark's jars — no extra
#: dependency). The conf is read at QUERY START and baked into the
#: checkpoint: never flip it under a query restarting from an
#: HDFS-provider checkpoint (state-format mismatch) — new checkpoint, new
#: provider. tests/test_streaming.py proves the sessionizer emits the
#: identical session set under RocksDB, with rocksdb* metrics live and
#: watermark-timeout eviction actually removing state rows.
ROCKSDB_STATE_STORE = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def enable_rocksdb_state_store(spark: SparkSession) -> None:
    """Point stateful streaming at RocksDB (see ROCKSDB_STATE_STORE notes).

    Also enables changelog checkpointing: per-batch uploads then carry the
    CHANGED keys only, not a full state-store snapshot — the knob that
    keeps checkpoint traffic proportional to update rate at production
    state sizes. Further production tuning lives under
    ``spark.sql.streaming.stateStore.rocksdb.*`` (e.g.
    ``boundedMemoryUsage=true`` to cap block-cache + memtable memory
    across all stores on an executor).
    """
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_STATE_STORE)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
