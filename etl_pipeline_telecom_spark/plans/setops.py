"""Set operations (SURVEY.md §2.9 / §7 extensions).

Unused by the reference; included for engine completeness. UNION/INTERSECT/
EXCEPT compile to Catalyst union + hash-aggregate / hash-join — the
distinct variants shuffle on the full row, so at scale prefer key-level
semi/anti joins (plans/joins.py j3/j4) when only keys matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table


def _status_customers(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.where(F.col("o_orderstatus") == status).select("o_custkey")


@register(
    "s1_union_distinct",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       UNION
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""",
    tags=("setop",),
    doc="UNION (distinct): customers with finished or pending orders",
)
def s1_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _status_customers(spark, sf_dir, "F").union(_status_customers(spark, sf_dir, "P")).distinct()


@register(
    "s2_union_all_counts",
    """SELECT o_custkey, COUNT(*) AS cnt FROM (
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       ) GROUP BY o_custkey""",
    tags=("setop",),
    doc="UNION ALL preserving duplicates, then re-aggregated",
)
def s2_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    both = _status_customers(spark, sf_dir, "F").union(_status_customers(spark, sf_dir, "O"))
    return both.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "s3_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""",
    tags=("setop",),
    doc="INTERSECT: customers with both finished and open orders",
)
def s3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _status_customers(spark, sf_dir, "F").intersect(_status_customers(spark, sf_dir, "O"))


@register(
    "s4_except",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       EXCEPT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""",
    tags=("setop",),
    doc="EXCEPT: customers with finished but no pending orders",
)
def s4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtract == EXCEPT (distinct); exceptAll would keep left-side surplus
    # occurrences of keys that also appear on the right
    return _status_customers(spark, sf_dir, "F").subtract(_status_customers(spark, sf_dir, "P"))
