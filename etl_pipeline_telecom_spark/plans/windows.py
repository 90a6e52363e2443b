"""Window functions, rollup/cube, grouping sets (SURVEY.md §2.7 / §7).

The reference's only window is the unpartitioned pct-of-total (A6). These
extend to the full analytic-window surface: ranking, lag/lead, running
frames, multi-level aggregation. All built-in Catalyst ``WindowExec`` —
partitioned windows shuffle once on the partition key and sort within
partitions; no unpartitioned windows over raw facts (those serialize onto
one task — see ``operators/aggregates.py`` A6 for the safe pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table

_DEC = "decimal(18,2)"


@register(
    "w1_rank_topk_per_group",
    """SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
         SELECT c_mktsegment, c_custkey, c_acctbal,
                ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal DESC, c_custkey) AS rn
         FROM customer)
       WHERE rn <= 3""",
    tags=("window", "topk"),
    doc="Top-3 per group via row_number (deterministic tiebreak on key)",
)
def w1_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return (
        customer.select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


@register(
    "w2_lag_delta",
    """SELECT event_id, user_id,
              ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id), 6)
                  AS delta
       FROM events""",
    tags=("window", "lag"),
    doc="Per-user lag delta ordered by event time (event_id tiebreak)",
)
def w2_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # nulls-last pinned (Spark ASC default is nulls-FIRST, DuckDB/Postgres
    # nulls-last): a null event time must sort after the real timeline,
    # not inject itself as everyone's first lag value
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
    )


@register(
    "w3_running_sum",
    """SELECT o_custkey, o_orderkey,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS running_spend
       FROM orders""",
    tags=("window", "frame"),
    doc="Running per-customer spend: explicit ROWS frame, decimal-exact",
)
def w3_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # nulls-last pinned to the DuckDB/Postgres convention (see w2/w8): a
    # null order date accumulates at the END of the running spend
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias("running_spend"),
    )


@register(
    "w4_dense_rank",
    """SELECT s_nationkey, s_suppkey,
              DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY CAST(s_acctbal AS DECIMAL(18,2)) DESC)
                  AS bal_rank
       FROM supplier""",
    tags=("window", "rank"),
    doc="Dense rank of suppliers by balance within nation (decimal order key "
    "so rank ties are well-defined cross-engine)",
)
def w4_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc(F.col("s_acctbal").cast(_DEC)))
    return supplier.select("s_nationkey", "s_suppkey", F.dense_rank().over(w).alias("bal_rank"))


@register(
    "w5_rollup",
    """SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              COUNT(*) AS cnt
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    tags=("window", "rollup"),
    doc="Hierarchical totals: (flag,status), (flag), () — NULL-filled supergroups",
)
def w5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "w6_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    tags=("window", "cube"),
    doc="All grouping combinations of status × priority",
)
def w6_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "w7_grouping_sets",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""",
    tags=("window", "grouping-sets"),
    doc="Explicit grouping sets (by flag alone, by status alone)",
)
def w7_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
           FROM lineitem_gs
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"""
    )


@register(
    "w8_pct_rank_cume",
    """SELECT p_partkey,
              ROUND(PERCENT_RANK() OVER (ORDER BY CAST(p_retailprice AS DECIMAL(18,2)), p_partkey), 9)
                  AS price_pct_rank,
              ROUND(CUME_DIST() OVER (ORDER BY CAST(p_retailprice AS DECIMAL(18,2)), p_partkey), 9)
                  AS price_cume_dist
       FROM part""",
    tags=("window", "rank"),
    doc="percent_rank + cume_dist over parts by price (global window is fine: "
    "part is a dimension table; for facts, partition first)",
)
def w8_pct_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    # asc_nulls_last, explicitly: Spark's ASC default is NULLS FIRST while
    # DuckDB/Postgres sort nulls LAST — on a null-free fixture the plans
    # agree by luck; a null price would silently shift EVERY row's rank.
    # The engine pins the SQL-standard-common (Postgres/DuckDB) order.
    w = Window.orderBy(
        F.col("p_retailprice").cast(_DEC).asc_nulls_last(),
        F.col("p_partkey").asc_nulls_last(),
    )
    return part.select(
        "p_partkey",
        F.round(F.percent_rank().over(w), 9).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("price_cume_dist"),
    )


@register(
    "w9_ntile_buckets",
    """SELECT c_mktsegment, tile,
              COUNT(*) AS n_customers,
              MIN(c_acctbal) AS min_bal,
              MAX(c_acctbal) AS max_bal
       FROM (
         SELECT c_mktsegment, c_acctbal,
                NTILE(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey) AS tile
         FROM customer)
       GROUP BY c_mktsegment, tile""",
    tags=("window", "ntile", "quartile", "headline"),
    doc="NTILE quartile bucketing of customers by balance within segment, "
    "audited as per-(segment, tile) counts and balance ranges — the "
    "feature-bucketing / equal-frequency-binning window op (F4's "
    "fixed-edge bucketize is its equal-width sibling). Deterministic "
    "cross-engine because the window order is total (balance, then the "
    "unique key); min/max pass raw parquet doubles through unchanged",
)
def w9_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return (
        cust.select("c_mktsegment", "c_acctbal", F.ntile(4).over(w).alias("tile"))
        .groupBy("c_mktsegment", "tile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


@register(
    "w10_rolling_stats",
    """SELECT event_id, user_id,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_sum,
              ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                    / (COUNT(*) OVER w), 6) AS roll_avg,
              CAST(MIN(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_min,
              CAST(MAX(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_max
       FROM events
       WINDOW w AS (PARTITION BY user_id
                    ORDER BY CAST(ts AS TIMESTAMP), event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""",
    tags=("window", "frame", "rolling"),
    doc="Per-user rolling 5-event stats (sum/avg/min/max over an explicit "
    "ROWS frame) — the moving-average smoothing / feature-window op. "
    "Decimal-exact accumulation inside the frame, one double division "
    "per row with identical operands cross-engine (the a4 discipline), "
    "total order via (ts, event_id) with nulls pinned last. Plan: one "
    "shuffle on user_id, in-partition sort, single WindowExec computing "
    "all four frames in one pass — no self-join, no per-frame rescan",
)
def w10_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last())
        .rowsBetween(-4, 0)
    )
    v = F.col("value").cast(_DEC)
    roll_sum = F.sum(v).over(w).cast("double")
    return events.select(
        "event_id",
        "user_id",
        roll_sum.alias("roll_sum"),
        F.round(roll_sum / F.count(F.lit(1)).over(w), 6).alias("roll_avg"),
        F.min(v).over(w).cast("double").alias("roll_min"),
        F.max(v).over(w).cast("double").alias("roll_max"),
    )


@register(
    "w11_value_window_ops",
    """SELECT o_custkey, o_orderkey,
              FIRST_VALUE(o_orderkey) OVER w AS first_order,
              LAST_VALUE(o_orderkey) OVER w_full AS last_order,
              NTH_VALUE(o_orderkey, 2) OVER w_full AS second_order,
              CAST(o_orderkey = FIRST_VALUE(o_orderkey) OVER w AS INT) AS is_first
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
              w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
    tags=("window", "value-functions"),
    doc="first/last/nth_value window functions over each customer's order "
    "history (first order, latest order, second order, is-first flag) — "
    "the value-function half of the window surface (w1-w10 cover "
    "ranking/frames/lag). LAST_VALUE and NTH_VALUE are computed over "
    "the FULL-partition frame explicitly: the default frame ends at "
    "CURRENT ROW, which silently turns last_value into the current row "
    "— the classic window-function footgun, pinned here in both "
    "engines. One shuffle on the partition key, total order via the "
    "(date, key) tie-break",
)
def w11_value_window_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    first = F.first("o_orderkey").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        first.alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
        (F.col("o_orderkey") == first).cast("int").alias("is_first"),
    )
