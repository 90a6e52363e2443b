"""Catalog queries for the transform/expression inventory (SURVEY.md §2.4).

Each exercises one F-operator from the reference's transform stage
(``scripts/transform.py``) or notebook normalization (``etl_analysis.ipynb
cell7``) against the synthetic fixtures (FIXTURES.md §C). All row-level
queries carry their natural key so the order-insensitive compare is
well-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..functions import (
    bucketize,
    coerce_numeric,
    dict_encode,
    eq_flag,
    median_fill,
    membership_flag,
    normalize_string,
    segment3,
    to_flag,
)
from ..sources import load_table


@register(
    "f1_coerce_numeric",
    """SELECT event_id, TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS DOUBLE) AS k_value
       FROM events""",
    tags=("parity", "transform"),
    doc="F1 string→numeric coercion, unparseable→NULL (transform.py:20)",
)
def f1_coerce_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", coerce_numeric(F.regexp_extract("props", r"([0-9]+)", 1)).alias("k_value"))


@register(
    "f2_median_fill",
    """WITH holey AS (
         SELECT event_id, CASE WHEN event_id % 97 = 0 THEN NULL ELSE value END AS v FROM events),
       m AS (SELECT MEDIAN(v) AS med FROM holey)
       SELECT event_id, COALESCE(v, med) AS value_filled FROM holey, m""",
    tags=("parity", "transform"),
    doc="F2 exact-median null fill (transform.py:23-25); nulls injected deterministically",
)
def f2_median_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 97 == 0, None).otherwise(F.col("value")).alias("v"),
    )
    return median_fill(ev, ["v"]).select("event_id", F.col("v").alias("value_filled"))


@register(
    "f3_const_fill",
    """SELECT event_id, COALESCE(CASE WHEN event_id % 53 = 0 THEN NULL ELSE event_type END, 'Unknown')
              AS event_type_filled
       FROM events""",
    tags=("parity", "transform"),
    doc="F3 constant fill of string nulls with 'Unknown' (transform.py:28-29)",
)
def f3_const_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import const_fill

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 53 == 0, None).otherwise(F.col("event_type")).alias("event_type_filled"),
    )
    return const_fill(ev, "Unknown")


@register(
    "f4_bucketize",
    """SELECT CASE WHEN l_quantity <= 12 THEN 'New'
                   WHEN l_quantity <= 36 THEN 'Regular'
                   WHEN l_quantity <= 60 THEN 'Loyal'
                   ELSE 'Champion' END AS quantity_group,
              COUNT(*) AS cnt
       FROM lineitem GROUP BY quantity_group""",
    tags=("parity", "transform"),
    doc="F4 right-closed static binning (pd.cut parity, transform.py:36-38)",
)
def f4_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    group = bucketize("l_quantity", [12, 36, 60], ["New", "Regular", "Loyal", "Champion"])
    return li.groupBy(group.alias("quantity_group")).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "f5_segment3",
    """SELECT CASE WHEN o_totalprice < 100000 THEN 'Low'
                   WHEN o_totalprice <= 300000 THEN 'Medium'
                   ELSE 'High' END AS price_segment,
              COUNT(*) AS cnt
       FROM orders GROUP BY price_segment""",
    tags=("parity", "transform"),
    doc="F5 3-way nested conditional (np.where parity, transform.py:41-44)",
)
def f5_segment3(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    seg = segment3("o_totalprice", 100000, 300000)
    return orders.groupBy(seg.alias("price_segment")).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "f6_f8_flags",
    """SELECT o_orderkey,
              LOWER(TRIM(CAST(o_orderpriority AS VARCHAR))) AS prio_norm,
              CAST(LOWER(TRIM(CAST(o_orderpriority AS VARCHAR))) IN ('1-urgent', '2-high') AS INT)
                  AS is_high_priority,
              CAST(LOWER(TRIM(CAST(o_orderstatus AS VARCHAR))) = 'f' AS INT) AS is_finished
       FROM orders""",
    tags=("parity", "transform"),
    doc="F6 normalize + F7 membership flag + F8 equality flag (transform.py:47-53)",
)
def f6_f8_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        normalize_string("o_orderpriority").alias("prio_norm"),
        membership_flag("o_orderpriority", ["1-urgent", "2-high"]).alias("is_high_priority"),
        eq_flag("o_orderstatus", "f").alias("is_finished"),
    )


@register(
    "f9_dict_encode",
    """SELECT o_orderkey,
              CAST(CASE LOWER(TRIM(CAST(o_orderpriority AS VARCHAR)))
                   WHEN '1-urgent' THEN 0 WHEN '2-high' THEN 1 WHEN '3-medium' THEN 2
                   ELSE -1 END AS INT) AS priority_code
       FROM orders""",
    tags=("parity", "transform"),
    doc="F9 dict-map encode with −1 default (transform.py:56-63)",
)
def f9_dict_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    code = dict_encode("o_orderpriority", {"1-urgent": 0, "2-high": 1, "3-medium": 2})
    return orders.select("o_orderkey", code.alias("priority_code"))


@register(
    "f10_to_flag",
    """WITH mixed AS (
         SELECT event_id,
                CASE event_type WHEN 'purchase' THEN 'Yes' WHEN 'error' THEN ' no '
                     WHEN 'click' THEN '1' WHEN 'view' THEN 'FALSE' ELSE 'maybe' END AS raw
         FROM events)
       SELECT event_id,
              CASE WHEN raw IS NULL THEN NULL
                   WHEN TRY_CAST(LOWER(TRIM(raw)) AS DOUBLE) IS NOT NULL
                        THEN CAST(TRY_CAST(LOWER(TRIM(raw)) AS DOUBLE) = 1.0 AS INT)
                   WHEN LOWER(TRIM(raw)) IN ('yes', 'y', 'true', '1') THEN 1
                   WHEN LOWER(TRIM(raw)) IN ('no', 'n', 'false', '0') THEN 0
                   ELSE NULL END AS flag
       FROM mixed""",
    tags=("parity", "transform"),
    doc="F10 canonical 0/1 flag from mixed input (nb cell7:12-26 to_flag)",
)
def f10_to_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_type") == "purchase", "Yes")
        .when(F.col("event_type") == "error", " no ")
        .when(F.col("event_type") == "click", "1")
        .when(F.col("event_type") == "view", "FALSE")
        .otherwise("maybe")
    )
    return ev.select("event_id", to_flag(raw).alias("flag"))


@register(
    "f11_f12_round_cast",
    """SELECT l_orderkey, l_linenumber,
              CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)), 3)
                   AS DOUBLE) AS net_price,
              CAST(l_linenumber AS VARCHAR) AS linenumber_str
       FROM lineitem""",
    tags=("parity", "transform"),
    doc="F11 round + F12 cast-to-string (nb cell8:8-37, cell10:6). "
    "Arithmetic in DECIMAL: price×(1−disc) has 4 decimal digits, so round-to-3 "
    "hits .5 ties constantly — double rounding there is engine-dependent, decimal is exact.",
)
def f11_f12_round_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice").cast("decimal(18,2)") * (1 - F.col("l_discount")).cast("decimal(18,2)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(net, 3).cast("double").alias("net_price"),
        F.col("l_linenumber").cast("string").alias("linenumber_str"),
    )
