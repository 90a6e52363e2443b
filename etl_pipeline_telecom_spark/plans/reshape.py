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


@register(
    "r3_pivot_latest_value",
    """WITH latest AS (
         SELECT user_id, event_type, value,
                ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                            event_id DESC) AS rn
         FROM events)
       SELECT user_id,
              MAX(CASE WHEN event_type = 'click' THEN value END) AS click,
              MAX(CASE WHEN event_type = 'view' THEN value END) AS view,
              MAX(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
              MAX(CASE WHEN event_type = 'error' THEN value END) AS error,
              MAX(CASE WHEN event_type = 'signup' THEN value END) AS signup
       FROM latest WHERE rn = 1 GROUP BY user_id""",
    tags=("reshape", "pivot", "long-to-wide"),
    doc="Long→wide pivot carrying each key's LATEST VALUE (a7/a8 pivot "
    "COUNTS; feature stores pivot the newest reading per signal): one "
    "max(struct(ts, event_id, value)) aggregate per (user, type) picks "
    "the latest row — the p2 single-shuffle merge shape — then the "
    "Spark pivot() relational operator spreads the 5-type enum into "
    "columns (second agg is on pre-collapsed keys-only rows). The "
    "oracle takes the ROW_NUMBER + conditional-MAX form. Explicit "
    "pivot value list in both engines: an unlisted novel type must "
    "FAIL the schema compare, not silently add a column",
)
def r3_pivot_latest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    st = F.struct(
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id").alias("event_id"),
        F.col("value").alias("value"),
    )
    latest = ev.groupBy("user_id", "event_type").agg(F.max(st).alias("m"))
    types = ["click", "view", "purchase", "error", "signup"]
    return (
        latest.select("user_id", "event_type", F.col("m.value").alias("value"))
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.max("value"))
    )
