"""Reshape + calendar operators: unpivot (wide→long melt) and date-part
aggregation — the two expression families the rest of the catalog didn't
exercise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table

_DEC = "decimal(18,2)"


@register(
    "r1_unpivot_measures",
    """SELECT measure, COUNT(*) AS cnt,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM (
         SELECT 'quantity' AS measure, l_quantity AS value FROM lineitem
         UNION ALL
         SELECT 'extendedprice', l_extendedprice FROM lineitem
         UNION ALL
         SELECT 'discount', l_discount FROM lineitem)
       GROUP BY measure""",
    tags=("reshape", "unpivot"),
    doc="Wide→long melt via unpivot (F.stack equivalent) + per-measure agg; "
    "narrow generate, no shuffle until the 3-row aggregate",
)
def r1_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[], values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure", valueColumnName="value",
    ).withColumn("measure", F.expr("substring(measure, 3)"))  # l_quantity → quantity
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("total"),
    )


@register(
    "r2_orders_by_month",
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
              EXTRACT(year FROM o_orderdate) AS order_year,
              COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_spend
       FROM orders GROUP BY 1, 2""",
    tags=("calendar", "agg"),
    doc="Calendar rollup: date_trunc month + year extraction over orders",
)
def r2_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("month_spend"),
        )
    )
