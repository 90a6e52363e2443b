"""Catalog queries for the aggregation inventory (SURVEY.md §2.5, A1–A13).

Each query mirrors a reference aggregate (``etl_analysis.ipynb cell8`` /
``scripts/validate.py``) re-targeted at the driver's synthetic fixture
tables per FIXTURES.md §C. Oracle SQL follows the decimal-sum discipline
documented in ``catalog.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import dec_avg, register, sql_dec_avg
from ..operators import (
    domain_values,
    exact_median,
    histogram,
    null_counts,
    pct_of_total,
    pivot_counts,
    value_counts,
)
from ..operators.aggregates import churn_rate_over_pivot
from ..sources import load_table


@register(
    "a1_count",
    "SELECT COUNT(*) AS cnt FROM lineitem",
    tags=("parity", "agg"),
    doc="A1 row count (validate.py:80, nb cell8:2)",
)
def a1_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "a2_distinct_count",
    "SELECT COUNT(*) AS distinct_cnt FROM (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)",
    tags=("parity", "agg"),
    doc="A2 distinct-row count (nb cell8:3 drop_duplicates)",
)
def a2_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderpriority", "o_orderstatus").distinct().agg(F.count(F.lit(1)).alias("distinct_cnt"))


@register(
    "a3_global_rate",
    """SELECT ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) * 100 / COUNT(*), 3)
              AS finished_pct
       FROM orders""",
    tags=("parity", "agg"),
    doc="A3 global mean → percentage (churn-rate analog, nb cell8:5-8)",
)
def a3_global_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    flag = (F.col("o_orderstatus") == "F").cast("bigint")
    return orders.agg(
        F.round(F.sum(flag).cast("double") * 100 / F.count(F.lit(1)), 3).alias("finished_pct")
    )


@register(
    "a4_group_avg",
    f"""SELECT l_returnflag, {sql_dec_avg('l_extendedprice', 'avg_extendedprice', ndigits=3)}
        FROM lineitem GROUP BY l_returnflag""",
    tags=("parity", "agg", "flagship"),
    doc="A4 group-by mean (avg_monthly_by_contract analog, nb cell8:10-14)",
)
def a4_group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(dec_avg("l_extendedprice", "avg_extendedprice", ndigits=3))


@register(
    "a5_value_counts",
    """SELECT c_mktsegment, COUNT(*) AS cnt FROM customer
       GROUP BY c_mktsegment ORDER BY cnt DESC, c_mktsegment""",
    tags=("parity", "agg"),
    doc="A5 value counts desc (tenure_group_counts analog, nb cell8:16-19)",
)
def a5_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_counts(load_table(spark, sf_dir, "customer"), "c_mktsegment")


@register(
    "a6_pct_of_total",
    """SELECT event_type, COUNT(*) AS cnt,
              ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 2) AS pct
       FROM events GROUP BY event_type ORDER BY cnt DESC, event_type""",
    tags=("parity", "agg", "window"),
    doc="A6 value counts + pct-of-total (internet_service_distribution analog, nb cell8:20-24)",
)
def a6_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pct_of_total(load_table(spark, sf_dir, "events"), "event_type")


@register(
    "a7_pivot_counts",
    """SELECT l_returnflag,
              CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS "F",
              CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS "O"
       FROM lineitem GROUP BY l_returnflag""",
    tags=("parity", "agg", "pivot"),
    doc="A7 crosstab/pivot 2-D counts (pd.crosstab analog, nb cell8:26-42)",
)
def a7_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return pivot_counts(li, "l_returnflag", "l_linestatus", ["F", "O"])


@register(
    "a8_pivot_rate",
    """SELECT o_orderpriority,
              CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS BIGINT) AS not_churned_count,
              CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS churned_count,
              CAST(COUNT(*) AS BIGINT) AS total,
              ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) * 100 / COUNT(*), 3)
                  AS churn_rate_pct
       FROM orders GROUP BY o_orderpriority""",
    tags=("parity", "agg", "pivot"),
    doc="A8 derived rate over pivot (pivot_churn_tenure analog, nb cell8:35-41)",
)
def a8_pivot_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "flag", (F.col("o_orderstatus") == "F").cast("int")
    )
    return churn_rate_over_pivot(orders, "o_orderpriority", "flag")


@register(
    "a9_group_rate_sorted",
    """SELECT event_type,
              ROUND(CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS DOUBLE) * 100 / COUNT(*), 3)
                  AS high_value_pct
       FROM events GROUP BY event_type ORDER BY high_value_pct DESC, event_type""",
    tags=("parity", "agg"),
    doc="A9 group-by rate, sorted desc (plot prep analog, nb cell10:3-4)",
)
def a9_group_rate_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    flag = (F.col("value") > 100).cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(F.round(F.sum(flag).cast("double") * 100 / F.count(F.lit(1)), 3).alias("high_value_pct"))
        .orderBy(F.desc("high_value_pct"), "event_type")
    )


@register(
    "a10_histogram",
    """WITH bounds AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders),
       binned AS (
         SELECT CAST(LEAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 40)), 39) AS INT) AS bin_id,
                lo, hi
         FROM orders, bounds WHERE o_totalprice IS NOT NULL)
       SELECT bin_id,
              ROUND(lo + bin_id * ((hi - lo) / 40), 6) AS bin_start,
              ROUND(lo + (bin_id + 1) * ((hi - lo) / 40), 6) AS bin_end,
              COUNT(*) AS cnt
       FROM binned GROUP BY bin_id, lo, hi ORDER BY bin_id""",
    tags=("parity", "agg"),
    doc="A10 fixed-bin histogram (nb cell10:15-17, bins=40)",
)
def a10_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return histogram(orders, "o_totalprice", 40).withColumnRenamed("count", "cnt")


@register(
    "a11_null_counts",
    """SELECT CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
              CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props_nulls,
              CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id_nulls
       FROM events""",
    tags=("parity", "agg", "validation"),
    doc="A11 per-column null counts (validate.py:70-73)",
)
def a11_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return null_counts(load_table(spark, sf_dir, "events"), ["value", "props", "user_id"])


@register(
    "a12_domain",
    "SELECT DISTINCT o_orderpriority FROM orders",
    tags=("parity", "agg", "validation"),
    doc="A12 distinct value domain (validate.py:94-118)",
)
def a12_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_values(load_table(spark, sf_dir, "orders"), "o_orderpriority")


@register(
    "a13_median",
    "SELECT MEDIAN(l_extendedprice) AS median_value FROM lineitem",
    tags=("parity", "agg"),
    doc="A13 exact interpolating median (transform.py:25)",
)
def a13_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_median(load_table(spark, sf_dir, "lineitem"), "l_extendedprice")
