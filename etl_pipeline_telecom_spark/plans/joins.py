"""Join operators (SURVEY.md §2.6 / §7 extensions).

The reference has no joins (single-table model); these are the multi-table
queries a user of a real analytics engine needs, designed Spark-first:

- dimension tables (region, nation, small customer subsets) are
  ``F.broadcast``-hinted — no shuffle of the fact side;
- fact⋈fact joins (orders⋈lineitem) shuffle on the join key and rely on
  AQE for skew splitting; at 100 TB both sides would be bucketed by
  orderkey at write time to make this a zero-shuffle co-located join;
- money sums follow the DECIMAL discipline from ``catalog.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table

_DEC = "decimal(18,2)"


@register(
    "j1_broadcast_join",
    """SELECT r.r_name, COUNT(*) AS nation_cnt
       FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY r.r_name ORDER BY r.r_name""",
    tags=("join", "broadcast"),
    doc="Inner equi-join with broadcast dimension (region is tiny)",
)
def j1_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("nation_cnt"))
        .orderBy("r_name")
    )


@register(
    "j2_revenue_topk",
    """SELECT o.o_orderkey, c.c_mktsegment,
              CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000
                  AS revenue
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
       GROUP BY o.o_orderkey, c.c_mktsegment
       ORDER BY revenue DESC, o.o_orderkey
       LIMIT 10""",
    tags=("join", "topk"),
    doc="TPC-H Q3-style 3-way join + top-k (deterministic tiebreak on "
    "orderkey). Revenue in integer cents×pct units (2-decimal inputs → "
    "exact longs, ~2× cheaper than decimal multiply, same exactness). "
    "Lineitem revenue is PRE-AGGREGATED per order key BEFORE the join "
    "(eager aggregation pushdown — sound because orderkey determines the "
    "group): the fact table crosses its one shuffle as |orders| partial "
    "sums instead of |lineitem| full rows, and the orders side (already "
    "segment-filtered via broadcast) then broadcasts into the result — the "
    "wide fact never shuffles as rows at all",
)
def j2_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    rev_units = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    li_rev = lineitem.groupBy("l_orderkey").agg(F.sum(rev_units).alias("units"))
    building_orders = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    ).select("o_orderkey", "c_mktsegment")
    return (
        # no broadcast hint on the order side: it is a fact SLICE, small here
        # but not at 100 TB — AQE picks broadcast when it fits, SMJ when not
        li_rev.join(building_orders, li_rev.l_orderkey == building_orders.o_orderkey)
        .select(
            "o_orderkey", "c_mktsegment", (F.col("units").cast("double") / 10000).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "j3_semi_join",
    """SELECT c_mktsegment, COUNT(*) AS customers_with_orders
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       GROUP BY c_mktsegment""",
    tags=("join", "semi"),
    doc="Left-semi join: customers having at least one order",
)
def j3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customers_with_orders"))
    )


@register(
    "j4_anti_join",
    """SELECT c_mktsegment, COUNT(*) AS customers_without_orders
       FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       GROUP BY c_mktsegment""",
    tags=("join", "anti"),
    doc="Left-anti join: customers with no orders",
)
def j4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customers_without_orders"))
    )


@register(
    "j5_left_join_agg",
    """SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_cnt,
              CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
       FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       GROUP BY c.c_custkey""",
    tags=("join", "outer"),
    doc="Left outer join preserving order-less customers (count=0, spend=0)",
)
def j5_left_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.coalesce(F.sum(F.col("o_totalprice").cast(_DEC)), F.lit(0)).cast("double").alias("total_spend"),
        )
    )


@register(
    "j6_star_join",
    """SELECT n.n_name,
              CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000
                  AS revenue
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name""",
    tags=("join", "star", "headline"),
    doc="TPC-H Q5-style 5-table star join, dimensions broadcast; lineitem "
    "revenue pre-aggregated per order key below the join (same eager "
    "aggregation pushdown as j2 — the wide fact crosses its shuffle as "
    "partial sums, never as rows)",
)
def j6_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # dimension chain region→nation→customer is small: broadcast the built-up
    # dim so the two fact tables only shuffle on their own join key
    dims = (
        customer.join(
            F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
            customer.c_nationkey == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    # integer cents×pct units: 2-decimal inputs make round(x*100) an exact
    # long, so the sum is exact in any order and ~2× cheaper than the
    # decimal(18,4) product it replaces
    rev_units = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    li_rev = lineitem.groupBy("l_orderkey").agg(F.sum(rev_units).alias("units"))
    asia_orders = orders.join(F.broadcast(dims), orders.o_custkey == F.col("c_custkey")).select(
        "o_orderkey", "n_name"
    )
    return (
        # order side is a fact slice: no broadcast hint, AQE decides
        li_rev.join(asia_orders, li_rev.l_orderkey == asia_orders.o_orderkey)
        .groupBy("n_name")
        .agg((F.sum("units").cast("double") / 10000).alias("revenue"))
    )


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Skew-mitigated equi-join: salt the fact side, replicate the dim side.

    A hot key (one customer with 10% of all orders) turns a shuffle join
    into one straggler task. Salting splits each key into ``salts``
    sub-keys: the fact row's salt is a DETERMINISTIC hash of a high-
    cardinality column (``salt_source``, defaults to the fact key itself —
    pass a row-unique column for real skew), and the dim side is exploded
    ``salts``× so every (key, salt) pair finds its match. Join output is
    row-identical to the plain join — the oracle for ``j7_salted_join``
    is the UNSALTED SQL join, which is the whole point.

    AQE's skew-join splitting handles moderate skew automatically; manual
    salting is for the pathological keys AQE's split granularity can't
    fix (one key bigger than a whole executor).
    """
    src = F.col(salt_source if salt_source is not None else fact_key)
    fact_s = fact.withColumn("_salt", F.pmod(F.xxhash64(src), F.lit(salts)).cast("int"))
    dim_s = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    return fact_s.join(
        dim_s, (F.col(fact_key) == F.col(dim_key)) & (fact_s["_salt"] == dim_s["_salt"])
    ).drop("_salt")


@register(
    "j7_salted_join",
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS segment_spend
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
    tags=("join", "skew", "salting"),
    doc="Skew-salted fact-dim join; the oracle is the PLAIN join — salting "
    "must be a pure physical rewrite with identical results",
)
def j7_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_equi_join(
        orders, customer, "o_custkey", "c_custkey", salts=8, salt_source="o_orderkey"
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("segment_spend"),
    )


@register(
    "j8_temporal_snapshot_join",
    """WITH dim AS (
         SELECT user_id, event_id AS version_id, value AS attr,
                epoch_us(CAST(ts AS TIMESTAMP)) AS vfrom,
                LEAD(epoch_us(CAST(ts AS TIMESTAMP)))
                  OVER (PARTITION BY user_id
                        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS vto
         FROM events WHERE event_type = 'signup'),
        fact AS (
         SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
         FROM events WHERE event_type = 'purchase')
       SELECT f.event_id, f.user_id, d.version_id, d.attr AS version_attr
       FROM fact f LEFT JOIN dim d
         ON d.user_id = f.user_id
        AND f.t_us >= d.vfrom AND (f.t_us < d.vto OR d.vto IS NULL)""",
    tags=("join", "temporal", "scd2", "asof-join", "headline"),
    doc="Point-in-time (temporal snapshot) join: each fact row joins the "
    "dimension VERSION that was valid at the fact's event time — the "
    "SCD-2 lookup that prevents attribute leakage from the future when "
    "building training data (joining today's profile onto last year's "
    "fact is the classic label-leak). Signup events are the versioned "
    "dimension (p3's interval build), purchases are the facts. Plan: NO "
    "interval join anywhere — facts and versions union into ONE stream, "
    "one window partitioned by the key carries the latest version "
    "forward (max over a (us, id, attr) struct; version rows sort "
    "before same-microsecond facts so the inclusive valid-from bound "
    "holds), facts project their carried version. One shuffle, task "
    "size bounded per key — e4's linear as-of shape, against the "
    "interval-join oracle. At 100 TB the interval join the oracle runs "
    "would be the naive O(facts x versions-per-key) plan; this is the "
    "union+window form warehouses use instead.",
)
def j8_temporal_snapshot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.where(F.col("event_type").isin("signup", "purchase"))
        .select(
            "event_id",
            "user_id",
            "ts",
            (F.col("event_type") == "purchase").cast("int").alias("kind"),
            F.when(
                F.col("event_type") == "signup",
                F.struct(
                    F.unix_micros("ts").alias("us"),
                    F.col("event_id").alias("id"),
                    F.col("value").alias("attr"),
                ),
            ).alias("ver_s"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last = F.max("ver_s").over(w)
    return (
        u.withColumn("last", last)
        .where(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("last.id").alias("version_id"),
            F.col("last.attr").alias("version_attr"),
        )
    )


# j9 bucket width: every interval duration is <= (1799 + 60) s, so a
# 2048 s bucket guarantees an interval covers at most 2 buckets — the
# explode factor is bounded by ceil(max_dur / W) + 1, never data-driven
_J9_W_US = 2048 * 1_000_000


@register(
    "j9_interval_bucket_join",
    """WITH iv AS (
         SELECT user_id, event_id AS iv_id,
                epoch_us(CAST(ts AS TIMESTAMP)) AS s,
                epoch_us(CAST(ts AS TIMESTAMP))
                  + ((event_id % 1800) + 60) * 1000000 AS e
         FROM events WHERE event_id % 4 = 0 AND ts IS NOT NULL
       ), pt AS (
         SELECT user_id, event_id AS pt_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
         FROM events WHERE event_id % 4 <> 0 AND ts IS NOT NULL
       ), j AS (
         SELECT pt.user_id, pt.pt_id, iv.iv_id
         FROM pt JOIN iv
           ON pt.user_id = iv.user_id AND pt.t >= iv.s AND pt.t < iv.e
       )
       SELECT user_id,
              COUNT(*) AS n_containments,
              COUNT(DISTINCT pt_id) AS n_points_covered,
              COUNT(DISTINCT iv_id) AS n_intervals_hit
       FROM j GROUP BY user_id""",
    tags=("join", "range-join", "intervals", "headline"),
    doc="Fact-to-fact interval containment join — the shape e5's "
    "broadcast band join cannot take when BOTH sides are large: every "
    "4th event spawns a [ts, ts + (id%1800+60)s) interval, the rest "
    "are points, and each point finds the same user's covering "
    "intervals. The Spark plan is the BUCKETED range join: intervals "
    "explode to the <=2 time buckets they touch (bucket width 2048 s "
    ">= max duration bounds the fan-out), points map to one bucket, "
    "and the join is a plain EQUI-join on (user_id, bucket) with the "
    "range predicate demoted to a post-join filter — shuffle-"
    "partitionable, AQE-skew-splittable, no BroadcastNestedLoopJoin "
    "anywhere (plan-asserted in tests/test_plan_shapes.py). The "
    "oracle runs the naive BETWEEN join; same containment multiset. "
    "At 100 TB both sides shuffle once on (user, bucket) — this is "
    "Spark's own storage-partitioned range-join recipe, and the "
    "double-counting trap (an interval spanning 2 buckets meets a "
    "1-bucket point once, because the POINT owns a single bucket) is "
    "what keeps the equi-join exact",
)
def j9_interval_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    t_us = F.unix_micros("ts")
    iv = ev.where(F.col("event_id") % 4 == 0).select(
        "user_id",
        F.col("event_id").alias("iv_id"),
        t_us.alias("s"),
        (t_us + ((F.col("event_id") % 1800) + 60) * F.lit(1_000_000)).alias("e"),
    )
    iv_b = iv.select(
        "user_id",
        "iv_id",
        "s",
        "e",
        F.explode(
            F.sequence(F.floor(F.col("s") / _J9_W_US), F.floor((F.col("e") - 1) / _J9_W_US))
        ).alias("bkt"),
    )
    pt = ev.where(F.col("event_id") % 4 != 0).select(
        "user_id",
        F.col("event_id").alias("pt_id"),
        t_us.alias("t"),
        F.floor(t_us / _J9_W_US).alias("bkt"),
    )
    j = pt.join(iv_b, ["user_id", "bkt"]).where(
        (F.col("t") >= F.col("s")) & (F.col("t") < F.col("e"))
    )
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_containments"),
        F.countDistinct("pt_id").alias("n_points_covered"),
        F.countDistinct("iv_id").alias("n_intervals_hit"),
    )


_J10_PRIORITY = "1-URGENT"
_J10_CUTOFF = "1996-01-01"


@register(
    "j10_bloom_pruned_join",
    f"""WITH sel AS (
         SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date
         FROM orders
         WHERE o_orderpriority = '{_J10_PRIORITY}'
           AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '{_J10_CUTOFF}')
       SELECT order_date,
              COUNT(*) AS n_items,
              CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE)
                  / 10000 AS revenue
       FROM sel s JOIN lineitem l ON l.l_orderkey = s.o_orderkey
       GROUP BY order_date""",
    tags=("join", "bloom", "runtime-filter"),
    doc="Bloom-pruned selective fact join — the runtime-filter shape "
    "(Spark's own runtime bloom pruning, written out declaratively "
    "since bloom_filter_agg isn't in PySpark 4.1's registry): the "
    "SELECTIVE dimension side (urgent pre-1996 orders, ~7% of keys) "
    "builds d13's distributed 1 MB bitset bloom over its join keys; "
    "the fact scan probes the broadcast sketch and drops ~93% of "
    "lineitem rows BEFORE the shuffle — the exchange then carries only "
    "probable matches. False positives cost shuffled rows, never "
    "correctness: the equi-join that follows is exact, which is why "
    "the oracle is simply the PLAIN join — the bloom must be "
    "semantically invisible. At 100 TB this is the difference between "
    "shuffling the whole fact table and shuffling the selectivity "
    "fraction; the sketch stays 1 MB regardless of fact size",
)
def j10_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _build_bloom, bloom_might_contain_udf

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    sel = orders.where(
        (F.col("o_orderpriority") == _J10_PRIORITY)
        & (F.col("o_orderdate") < F.lit(_J10_CUTOFF).cast("timestamp"))
    ).select("o_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
    bloom = _build_bloom(sel.select(F.xxhash64("o_orderkey").alias("h")))
    might_contain = bloom_might_contain_udf(spark, bloom)
    pruned = (
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        .withColumn("h", F.xxhash64("l_orderkey"))
        .where(might_contain("h"))
        .drop("h")
    )
    rev_units = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        pruned.join(sel, pruned.l_orderkey == sel.o_orderkey)
        .groupBy("order_date")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(rev_units).cast("double") / 10_000).alias("revenue"),
        )
    )
