"""Data-quality catalog queries: the V1–V6 suite over the fixture tables.

Each query runs :func:`run_expectations` — one aggregation pass for all
checks — and the oracle replays every check as a UNION ALL of scalar
SELECTs, so check names, pass booleans, observed and expected strings
must all agree cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register
from ..sources import load_table
from ..validation import (
    expect_domain,
    expect_no_nulls,
    expect_row_count,
    expect_unique,
    run_expectations,
)


@register(
    "dq1_lineitem_checks",
    """SELECT 'no_nulls:l_quantity' AS "check",
              SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) = 0 AS passed,
              CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS VARCHAR) AS observed,
              '0' AS expected
       FROM lineitem
       UNION ALL
       SELECT 'no_nulls:l_extendedprice',
              SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) = 0,
              CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS VARCHAR), '0'
       FROM lineitem
       UNION ALL
       SELECT 'row_count_min', COUNT(*) >= 1, CAST(COUNT(*) AS VARCHAR), '>=1' FROM lineitem
       UNION ALL
       SELECT 'domain:l_returnflag',
              string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag) = 'A,N,R',
              string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag), '={A,N,R}'
       FROM lineitem
       UNION ALL
       SELECT 'domain:l_linestatus',
              string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) = 'F,O',
              string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus), '={F,O}'
       FROM lineitem""",
    tags=("quality", "validation"),
    doc="V1/V2/V4-style checks over lineitem, all in one aggregation pass "
    "(scripts/validate.py:50-135 re-expressed as an expect() suite)",
)
def dq1_lineitem_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return run_expectations(
        li,
        [
            expect_no_nulls("l_quantity"),
            expect_no_nulls("l_extendedprice"),
            expect_row_count(1),
            expect_domain("l_returnflag", {"A", "N", "R"}),
            expect_domain("l_linestatus", {"F", "O"}),
        ],
    )


@register(
    "dq2_orders_checks",
    """SELECT 'unique:o_orderkey' AS "check",
              COUNT(*) - COUNT(DISTINCT o_orderkey) = 0 AS passed,
              CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS VARCHAR) AS observed,
              '0' AS expected
       FROM orders
       UNION ALL
       SELECT 'domain_violations:o_orderstatus',
              SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) = 0,
              CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS VARCHAR),
              '0'
       FROM orders
       UNION ALL
       SELECT 'row_count_min', COUNT(*) >= 1, CAST(COUNT(*) AS VARCHAR), '>=1' FROM orders""",
    tags=("quality", "validation"),
    doc="Key-uniqueness + scale-safe violation-count domain check over orders",
)
def dq2_orders_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return run_expectations(
        orders,
        [
            expect_unique("o_orderkey"),
            expect_domain("o_orderstatus", {"F", "O", "P"}, as_violations=True),
            expect_row_count(1),
        ],
    )
