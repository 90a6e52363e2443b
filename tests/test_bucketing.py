"""Bucketed co-located join: the write-once/shuffle-never contract.

Asserts at the PLAN level (no Exchange nodes) and at the value level
(bucketed join ≡ plain join) — the property that matters at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_telecom_spark.sources import load_table
from etl_pipeline_telecom_spark.sources.bucketing import (
    plan_has_shuffle,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "orders_b", str(base / "orders"), buckets=8, keys=["o_orderkey"])
    write_bucketed(lineitem, "lineitem_b", str(base / "lineitem"), buckets=8, keys=["l_orderkey"])
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _joined(spark, bucketed_tables):
    o, l = bucketed_tables
    return read_bucketed(spark, o).join(
        read_bucketed(spark, l), F.col("o_orderkey") == F.col("l_orderkey")
    )


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # sort-merge join must not introduce an Exchange on either side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = _joined(spark, bucketed_tables)
        assert not plan_has_shuffle(j), j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    o, _ = bucketed_tables
    agg = read_bucketed(spark, o).groupBy("o_orderkey").agg(F.sum("o_totalprice"))
    assert not plan_has_shuffle(agg)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    bucketed_count = _joined(spark, bucketed_tables).count()
    plain = load_table(spark, sf_dir, "orders").join(
        load_table(spark, sf_dir, "lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    assert bucketed_count == plain.count()
