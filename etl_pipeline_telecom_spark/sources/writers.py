"""Sink operators (SURVEY.md §2.2: K1–K5).

The reference writes single CSV files per stage (``scripts/extract.py:16``,
``scripts/transform.py:77``), one JSON array summary (``etl_analysis.ipynb
cell9:13-14``), and batches 200-row inserts into Postgres with retry/backoff
and a local-CSV fallback (``scripts/load.py:95-230``).

Spark-first mapping:
- single-file CSV/JSON shapes need ``coalesce(1)`` — acceptable only at a
  final small sink, never mid-plan (it would serialize the whole job).
- partitioned parquet is the engine-native sink for anything big.
- the hand-rolled 200-row batching + NaN→NULL of K4 is exactly what
  ``df.write.jdbc(..., properties={"batchsize": "200"})`` does natively.
- K5's fallback routing is a driver-side try/except around the two sinks.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, *, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def _promote_single_part(tmp_dir: str, dest: str, ext: str) -> None:
    parts = sorted(glob.glob(os.path.join(tmp_dir, f"part-*{ext}")))
    if len(parts) != 1:
        raise RuntimeError(f"expected exactly one part file in {tmp_dir}, got {parts}")
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    shutil.move(parts[0], dest)
    shutil.rmtree(tmp_dir)


def write_single_csv(df: DataFrame, dest: str) -> str:
    """K1 — single-file CSV with header, matching pandas ``to_csv(index=False)``.

    Writes via a temp dir then promotes the lone part file so the artifact
    is one plain ``.csv`` like the reference's stage outputs.
    """
    tmp = dest + ".__tmp__"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    _promote_single_part(tmp, dest, ".csv")
    return dest


def write_single_json(df: DataFrame, dest: str, *, indent: int = 2) -> str:
    """K2 — one JSON *array* file (reference shape: ``json.dump(rows, indent=2)``).

    The reference emits a single array-of-records, not JSONL, so the final
    assembly is driver-side over a collected (small) result.
    """
    import json

    rows = [r.asDict(recursive=True) for r in df.collect()]
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    with open(dest, "w") as fh:
        json.dump(rows, fh, indent=indent, default=str)
    return dest


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    batchsize: int = 200,
    properties: dict[str, str] | None = None,
) -> None:
    """K3+K4 — JDBC sink with batched inserts.

    ``batchsize=200`` mirrors the reference's batch size
    (``scripts/load.py:95,161``); NaN→NULL and DDL-on-overwrite come free
    from the JDBC writer. Retry/backoff is delegated to the JDBC driver /
    Spark task retries rather than re-implemented per batch. Jar-less
    environments: ``sources.pgcopy`` is the live-tested COPY-based sink.
    """
    props = {"batchsize": str(batchsize), **(properties or {})}
    writer = df.write.mode(mode)
    for k, v in props.items():
        writer = writer.option(k, v)
    writer.option("url", url).option("dbtable", table).format("jdbc").save()


def write_with_fallback(df: DataFrame, primary, fallback) -> str:
    """K5 — attempt the remote sink, fall back to the local one.

    Mirrors ``scripts/load.py:151-158,186-193``: missing credentials or a
    remote schema error routes the same DataFrame to a local CSV copy.
    ``primary``/``fallback`` are callables taking the DataFrame.
    """
    try:
        primary(df)
        return "primary"
    except Exception:  # noqa: BLE001 — mirror reference's broad fallback
        fallback(df)
        return "fallback"


def stage_partitioned_events(spark, sf_dir: str) -> str:
    """Materialize events as a date-PARTITIONED parquet layout under /tmp.

    The p5 catalog query reads this sink back with a partition filter —
    the write side of the §7 layout story (bucketing.py covers joins;
    this covers the partition-pruned scan every time-partitioned fact
    table lives by). Cached by source mtime; atomic rename publish
    (the replay_dir_with_sentinels discipline).
    """
    import hashlib
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    from .readers import load_table

    src = os.path.join(sf_dir, "events.parquet")
    key = hashlib.md5(f"{os.path.abspath(src)}:{os.path.getmtime(src)}".encode()).hexdigest()[:10]
    out_dir = f"/tmp/spark_graft_p5_part_{key}"
    if os.path.isdir(out_dir):
        return out_dir
    work = f"{out_dir}.stage-{os.getpid()}-{time.monotonic_ns()}"
    (
        load_table(spark, sf_dir, "events")
        .withColumn("event_date", F.to_date("ts"))
        .write.partitionBy("event_date")
        .parquet(work)
    )
    try:
        os.rename(work, out_dir)
    except OSError:
        shutil.rmtree(work, ignore_errors=True)
    return out_dir


def stage_bucketed_events(spark, sf_dir: str, n_buckets: int = 24) -> str:
    """Materialize events as an md5-bucketed parquet layout (one file per
    bucket directory) under /tmp — the physical input for p7's compaction
    planner.

    Bucket = portable md5-mod of event_id (NOT Spark's murmur hash(), so
    a DuckDB oracle can recompute membership); ``repartition(bucket)``
    guarantees each bucket's rows land in exactly ONE task → one part
    file per directory — the file-count invariant p7's audit reads back
    through ``_metadata``. Cached by source mtime; atomic rename publish
    (the stage_partitioned_events discipline).
    """
    import hashlib
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    from .readers import load_table

    src = os.path.join(sf_dir, "events.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{os.path.getmtime(src)}:{n_buckets}".encode()
    ).hexdigest()[:10]
    out_dir = f"/tmp/spark_graft_p7_bucket_{key}"
    if os.path.isdir(out_dir):
        return out_dir
    bucket = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % n_buckets
    )
    work = f"{out_dir}.stage-{os.getpid()}-{time.monotonic_ns()}"
    (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value", bucket.alias("bucket"))
        .repartition("bucket")
        .write.partitionBy("bucket")
        .parquet(work)
    )
    try:
        os.rename(work, out_dir)
    except OSError:
        shutil.rmtree(work, ignore_errors=True)
    return out_dir


def stage_two_generation_events(spark, sf_dir: str) -> str:
    """Materialize events as TWO parquet generations with an EVOLVED
    schema under one partitioned layout (gen=1, gen=2) — dq7's fixture.

    gen=1 (even event_ids) carries the original columns; gen=2 (odd
    event_ids) adds ``quality_tier`` — the additive-column evolution
    every long-lived feed goes through. A ``mergeSchema`` read of the
    parent must surface the new column with NULLs for gen-1 rows.
    Cached by source mtime; atomic rename publish.
    """
    import hashlib
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    from .readers import load_table

    src = os.path.join(sf_dir, "events.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{os.path.getmtime(src)}:dq7".encode()
    ).hexdigest()[:10]
    out_dir = f"/tmp/spark_graft_dq7_gen_{key}"
    if os.path.isdir(out_dir):
        return out_dir
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    tier = F.when(F.col("value") >= 50.0, "hi").otherwise("lo")
    work = f"{out_dir}.stage-{os.getpid()}-{time.monotonic_ns()}"
    ev.where(F.col("event_id") % 2 == 0).write.parquet(os.path.join(work, "gen=1"))
    (
        ev.where(F.col("event_id") % 2 == 1)
        .withColumn("quality_tier", tier)
        .write.parquet(os.path.join(work, "gen=2"))
    )
    try:
        os.rename(work, out_dir)
    except OSError:
        shutil.rmtree(work, ignore_errors=True)
    return out_dir
