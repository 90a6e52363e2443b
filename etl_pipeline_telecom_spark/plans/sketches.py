"""Approximate/sketch aggregations + the projection-op parity chain.

Sketches are the 100 TB workhorses the exact forms can't be: HLL++
``approx_count_distinct`` replaces a full distinct shuffle with a
fixed-size sketch that merges map-side, and ``percentile_approx``
replaces the full sort an exact median needs (SURVEY.md §7 flags exact
median as the known scale hazard — these are the flagged alternative).

Approximate results are engine-specific, so there is NO value-level
DuckDB oracle (driver records the weaker rows-only check); instead
tests/test_sketches.py bounds the relative error against the exact
answers, which is the meaningful contract for a sketch.

``p1_projection_ops`` pins the SURVEY §2.3 projection/filter surface
(P1 select, P2 drop, P3 rename, P4 null-filter, P5 distinct) as one
oracle-checked chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table


@register(
    "a14_approx_distinct",
    None,  # HLL estimates are engine-specific → rows-only; error-bounded in tests
    tags=("sketch", "approx"),
    doc="HLL++ approx_count_distinct of order keys vs the exact count — the "
    "fixed-memory, map-side-mergeable form of a2_distinct_count",
)
def a14_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )


@register(
    "a15_percentile_approx",
    None,  # sketch quantiles are engine-specific → rows-only; bounded in tests
    tags=("sketch", "approx"),
    doc="approx_percentile quantiles of extended price — the no-full-sort "
    "form of a13_median, the SURVEY §7 scale path for exact median",
)
def a15_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10_000).alias("approx_quartiles"),
        F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").alias("exact_quartiles"),
    )


@register(
    "p1_projection_ops",
    """SELECT DISTINCT c_custkey, c_name AS customer_name, c_mktsegment
       FROM customer WHERE c_acctbal IS NOT NULL""",
    tags=("projection",),
    doc="P1-P5 chain: select, drop (ignore-missing), rename, null-row "
    "filter, distinct (scripts/transform.py:66,71; etl_analysis.ipynb cell8:3)",
)
def p1_projection_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.drop("c_nationkey", "no_such_column")  # P2: Spark drop ignores missing
        .withColumnRenamed("c_name", "customer_name")  # P3
        .na.drop(subset=["c_acctbal"])  # P4
        .select("c_custkey", "customer_name", "c_mktsegment")  # P1
        .distinct()  # P5
    )


@register(
    "a16_freq_items",
    None,  # single-pass heavy-hitter sketch — superset guarantee tested instead
    tags=("sketch", "approx", "heavy-hitters"),
    doc="freqItems heavy-hitter sketch over order priorities: one pass, "
    "fixed memory; guaranteed superset of all items above the support "
    "threshold (may include false positives, never misses)",
)
def a16_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.stat.freqItems(["o_orderpriority"], support=0.15)


@register(
    "a17_grouped_percentiles",
    """SELECT l_returnflag,
              quantile_cont(l_quantity, 0.5) AS p50_qty,
              quantile_cont(l_quantity, 0.9) AS p90_qty,
              COUNT(*) AS cnt
       FROM lineitem GROUP BY l_returnflag""",
    tags=("agg", "percentile"),
    doc="Exact grouped percentiles (linear interpolation) — cross-engine "
    "safe because l_quantity is integer-valued, so the lerp operands are "
    "identical doubles in both engines",
)
def a17_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("p50_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
