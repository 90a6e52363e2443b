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


@register(
    "s5_bag_setops",
    """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        ia AS (SELECT o_custkey FROM f INTERSECT ALL SELECT o_custkey FROM o),
        ea AS (SELECT o_custkey FROM f EXCEPT ALL SELECT o_custkey FROM o)
       SELECT 'intersect_all' AS op, o_custkey, COUNT(*) AS cnt
       FROM ia GROUP BY o_custkey
       UNION ALL
       SELECT 'except_all' AS op, o_custkey, COUNT(*) AS cnt
       FROM ea GROUP BY o_custkey""",
    tags=("setops", "bag-semantics"),
    doc="BAG-semantics set ops — the ALL variants s1/s3/s4's distinct "
    "forms silently collapse: intersectAll keeps each key "
    "min(multiplicity-left, multiplicity-right) times and exceptAll "
    "max(0, left − right) times — the semantics reconciliation jobs "
    "need (how many of my rows survive subtracting yesterday's batch, "
    "per key, WITH duplicates). Runs Spark's intersectAll/exceptAll "
    "operators for real (Catalyst plans them as count-compare "
    "aggregates — one shuffle each on the key, no row explosion), then "
    "aggregates the surviving bag to (op, key, multiplicity) so the "
    "result is hash-comparable; the oracle runs DuckDB's INTERSECT ALL "
    "/ EXCEPT ALL. Multiplicity arithmetic pinned on crafted dup "
    "counts in tests/test_r8_ops.py",
)
def s5_bag_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")

    def agg(df: DataFrame, op: str) -> DataFrame:
        return df.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt")).select(
            F.lit(op).alias("op"), "o_custkey", "cnt"
        )

    return agg(f.intersectAll(o), "intersect_all").unionByName(
        agg(f.exceptAll(o), "except_all")
    )
