"""Streaming file source for the ``events`` fixture.

A file-based stream is the idiomatic replay/backfill source in Spark:
point ``readStream`` at a directory and every new file becomes a
micro-batch (bounded by ``maxFilesPerTrigger``). At 100 TB this is the
same pattern used against a landing bucket — the source lists new files,
so per-batch work scales with arriving data, not the table's history.

``events.ts`` is parquet TIMESTAMP(NANOS); as in the batch loader
(``sources/readers.py``) it arrives as epoch-nanos long under
``spark.sql.legacy.parquet.nanosAsLong`` and is converted with integer
division to a microsecond timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)


def read_events_stream(
    spark: SparkSession,
    directory: str,
    *,
    glob: str = "*.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream the events table from a directory of parquet files.

    ``max_files_per_trigger=1`` replays one file per micro-batch — the
    test harness uses that to exercise watermark advancement across
    batches exactly as a production stream would see it.
    """
    # same defense as sources.load_table: a session without the legacy conf
    # rejects TIMESTAMP(NANOS) parquet outright
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(directory)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
