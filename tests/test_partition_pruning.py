"""Partitioned-parquet layout: partition pruning must reach the scan.

At 100 TB a date/segment-partitioned table turns most queries into reads
of a sliver of files; these tests assert (a) the filter appears as a
PartitionFilter in the physical scan — not a post-scan row filter — and
(b) results match the unpartitioned read.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_telecom_spark.sources import load_table, write_parquet


@pytest.fixture(scope="module")
def partitioned_orders(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "orders_by_status")
    write_parquet(
        load_table(spark, sf_dir, "orders"), path, partition_by=["o_orderstatus"]
    )
    return path


def test_partition_filter_reaches_scan(spark, partitioned_orders):
    df = spark.read.parquet(partitioned_orders).where(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan
    # the partition predicate must NOT degrade into a row-level data filter
    assert "PushedFilters: [IsNotNull(o_orderstatus)" not in plan


def test_partitioned_read_matches_plain(spark, sf_dir, partitioned_orders):
    plain = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    pruned = spark.read.parquet(partitioned_orders).where(F.col("o_orderstatus") == "F")
    assert pruned.count() == plain.count()
