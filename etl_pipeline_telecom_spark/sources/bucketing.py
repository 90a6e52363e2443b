"""Bucketed tables: co-located joins and aggregations without a shuffle.

At 100 TB the shuffle IS the cost: a fact-fact join on l_orderkey =
o_orderkey exchanges both tables across the cluster every query. Writing
both sides bucketed (and sorted) BY THE JOIN KEY moves that exchange to
write time, once: every subsequent join/groupBy on the key reads
co-located buckets and Catalyst plans a sort-merge join with ZERO
Exchange nodes (asserted in tests/test_bucketing.py).

Rules that make it work (all encoded here):
- both sides bucketed into the SAME number of buckets on the join key;
- ``sortBy`` the key so the merge needs no per-task sort;
- bucket count chosen for target file sizes (128–512 MB each) — a
  128-bucket, 100 TB table yields ~800 GB buckets, so real deployments
  use thousands; the parameter is explicit, never defaulted.

Bucketing metadata lives in the session catalog (``saveAsTable``), data
in plain parquet at ``path``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    *,
    buckets: int,
    keys: list[str],
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (+sorted) parquet table at ``path``."""
    writer = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.option("path", path).format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact."""
    return spark.table(table)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains any shuffle Exchange — the
    property bucketed co-located joins exist to eliminate."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "ShuffleExchange" in plan
