"""Data-quality catalog queries: the V1–V6 suite over the fixture tables.

Each query runs :func:`run_expectations` — one aggregation pass for all
checks — and the oracle replays every check as a UNION ALL of scalar
SELECTs, so check names, pass booleans, observed and expected strings
must all agree cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.text import hash_bucket
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


@register(
    "dq3_outlier_bands",
    """WITH m AS (
         SELECT l_returnflag, COUNT(*) AS n,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx
         FROM lineitem GROUP BY l_returnflag
       ), b AS (
         SELECT l_returnflag, n, sx / n AS mu,
                sqrt((sxx - sx * sx / n) / n) AS sigma
         FROM m
       )
       SELECT li.l_returnflag, MAX(b.n) AS n_rows,
              CAST(SUM(CASE WHEN ABS(CAST(li.l_extendedprice AS DECIMAL(18,2))
                                    - b.mu) > 2 * b.sigma
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       FROM lineitem li JOIN b ON li.l_returnflag = b.l_returnflag
       GROUP BY li.l_returnflag""",
    tags=("quality", "statistics", "outliers", "headline"),
    doc="Per-group 2-sigma outlier screen on extended price — the "
    "data-quality anomaly band every ingest pipeline runs before "
    "training-data admission. mu/sigma come from exact decimal moment "
    "sums (the a18 discipline: identical doubles cross-engine, sqrt is "
    "IEEE-correctly-rounded), then ONE broadcast join of the per-group "
    "bounds back onto the scan — the fact table never shuffles, the "
    "outlier count aggregates map-side; both passes are plain scans, the "
    "correct two-pass shape for a 100 TB z-score screen",
)
def dq3_outlier_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d).cast("double").alias("sx"),
        F.sum(d * d).cast("double").alias("sxx"),
    )
    n = F.col("n").cast("double")
    bounds = m.select(
        F.col("l_returnflag").alias("rf"),
        F.col("n"),
        (F.col("sx") / n).alias("mu"),
        F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / n) / n).alias("sigma"),
    )
    return (
        li.join(F.broadcast(bounds), li["l_returnflag"] == bounds["rf"])
        .groupBy("l_returnflag")
        .agg(
            F.max("n").alias("n_rows"),
            F.sum(
                F.when(F.abs(d - F.col("mu")) > 2 * F.col("sigma"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


_DQ4_BUCKET_W = 50  # value-bucket width; buckets 0..9 (capped)
# A full timestamp boundary (not dayofmonth) so the ref/cur split stays
# correct on multi-month data; the constant is fixture-tuned (events span
# 2024-01) but the plan shape is production-correct as-is.
_DQ4_SPLIT_TS = "2024-01-16 00:00:00"
_DQ4_CRIT = 16.919  # chi-square critical value, df=9, alpha=0.05


def dq4_bucket_counts(ev: DataFrame) -> DataFrame:
    """(event_type, bucket) -> (ref_n, cur_n) — the maintained state both
    the batch monitor and st9's streaming twin aggregate to."""
    bucket = F.least(F.floor(F.col("value") / _DQ4_BUCKET_W).cast("bigint"), F.lit(9))
    win = F.when(
        F.col("ts") < F.lit(_DQ4_SPLIT_TS).cast("timestamp"), "ref"
    ).otherwise("cur")
    return (
        ev.select("event_type", bucket.alias("bucket"), win.alias("win"))
        .groupBy("event_type", "bucket")
        .agg(
            F.sum(F.when(F.col("win") == "ref", 1).otherwise(0)).alias("ref_n"),
            F.sum(F.when(F.col("win") == "cur", 1).otherwise(0)).alias("cur_n"),
        )
    )


def drift_from_counts(counts: DataFrame) -> DataFrame:
    """dq4's chi-square arithmetic over a (type, bucket, ref_n, cur_n)
    counts table — shared by the batch and streaming monitors."""
    w_type = Window.partitionBy("event_type")
    tot = counts.withColumn("ref_tot", F.sum("ref_n").over(w_type)).withColumn(
        "cur_tot", F.sum("cur_n").over(w_type)
    )
    num = (F.col("cur_n") * F.col("ref_tot") - F.col("ref_n") * F.col("cur_tot")).cast(
        "double"
    )
    den = (F.col("ref_n") * F.col("cur_tot") * F.col("ref_tot")).cast("double")
    # ref_n > 0: buckets with an empty reference carry no statistic.
    # cur_tot > 0: a type with ZERO current-window rows would make num and
    # den both 0 — num*num/den is NaN, and Spark's floor+cast silently
    # nulls it while DuckDB errors on CAST(NaN AS BIGINT); excluding the
    # whole type (nothing to compare against) keeps both engines defined.
    contrib = tot.where((F.col("ref_n") > 0) & (F.col("cur_tot") > 0)).withColumn(
        "contrib_u", F.floor(num * num / den * 1000000).cast("bigint")
    )
    chi2_u = F.sum("contrib_u").over(w_type)
    return contrib.select(
        "event_type",
        "bucket",
        F.col("ref_n").cast("bigint").alias("ref_n"),
        F.col("cur_n").cast("bigint").alias("cur_n"),
        F.round(F.col("contrib_u") / 1000000.0, 6).alias("contrib"),
        F.round(chi2_u / 1000000.0, 6).alias("chi2_type"),
        (chi2_u / 1000000.0 > _DQ4_CRIT).alias("drifted"),
    )


# shared with st9_stream_drift_monitor (the streaming twin maintains the
# same counts; end-of-replay state equals the batch counts exactly)
_SQL_DQ4 = f"""WITH b AS (
         SELECT event_type,
                LEAST(CAST(FLOOR(value / {_DQ4_BUCKET_W}) AS BIGINT), 9) AS bucket,
                CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '{_DQ4_SPLIT_TS}'
                     THEN 'ref' ELSE 'cur' END AS win
         FROM events),
        counts AS (
         SELECT event_type, bucket,
                SUM(CASE WHEN win = 'ref' THEN 1 ELSE 0 END) AS ref_n,
                SUM(CASE WHEN win = 'cur' THEN 1 ELSE 0 END) AS cur_n
         FROM b GROUP BY event_type, bucket),
        tot AS (
         SELECT *, SUM(ref_n) OVER (PARTITION BY event_type) AS ref_tot,
                   SUM(cur_n) OVER (PARTITION BY event_type) AS cur_tot
         FROM counts),
        contrib AS (
         SELECT event_type, bucket, CAST(ref_n AS BIGINT) AS ref_n,
                CAST(cur_n AS BIGINT) AS cur_n,
                CAST(FLOOR(
                  (CAST((cur_n * ref_tot - ref_n * cur_tot) AS DOUBLE)
                   * CAST((cur_n * ref_tot - ref_n * cur_tot) AS DOUBLE))
                  / CAST(ref_n * cur_tot * ref_tot AS DOUBLE) * 1000000
                ) AS BIGINT) AS contrib_u
         FROM tot WHERE ref_n > 0 AND cur_tot > 0)
        SELECT event_type, bucket, ref_n, cur_n,
               ROUND(contrib_u / 1000000.0, 6) AS contrib,
               ROUND(SUM(contrib_u) OVER (PARTITION BY event_type) / 1000000.0, 6)
                   AS chi2_type,
               SUM(contrib_u) OVER (PARTITION BY event_type) / 1000000.0 > {_DQ4_CRIT}
                   AS drifted
        FROM contrib"""


@register(
    "dq4_distribution_drift",
    _SQL_DQ4,
    tags=("quality", "drift", "statistics", "headline"),
    doc="Distribution-drift monitor between a reference and a current "
    "window (first vs second half of the month): per event type, value "
    "histograms are compared bucket-by-bucket and the Pearson chi-square "
    "statistic flags types whose CURRENT value distribution no longer "
    "matches the reference — the standard data-quality gate in front of "
    "a training pipeline (dq3 bounds individual outliers; dq4 catches "
    "the whole distribution moving). Exactness: each bucket's "
    "contribution (o·R − r·C)²/(r·C·R) is built from exact integer "
    "counts (int→double conversion rounds identically in every IEEE "
    "engine), then quantized to integer micro-units so the cross-bucket "
    "sum is order-independent — the same discipline as sm5/t16. Plan: "
    "one hash agg to (type, bucket) counts — 50 rows — then window "
    "arithmetic on the post-agg rows; the scan never shuffles. Buckets "
    "with an empty reference are excluded from the statistic (standard "
    "practice; they show as cur-only rows upstream).",
)
def dq4_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return drift_from_counts(dq4_bucket_counts(load_table(spark, sf_dir, "events")))


# Fixed audit instant for dq5 freshness (fixtures are January 2024; a
# wall-clock now() would be non-reproducible AND non-oracle-able).
_DQ5_NOW_US = 1_706_745_600_000_000  # TIMESTAMP '2024-02-01 00:00:00' UTC
_DQ5_FRESH_US = 14 * 86_400 * 1_000_000  # freshness SLA: 14 days


@register(
    "dq5_freshness",
    f"""WITH g AS (
         SELECT event_type,
                MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_ts_us,
                COUNT(DISTINCT CAST(ts AS DATE)) AS days_seen,
                MIN(CAST(ts AS DATE)) AS min_d,
                MAX(CAST(ts AS DATE)) AS max_d,
                COUNT(*) AS n_events,
                SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS null_ts
         FROM events GROUP BY event_type)
       SELECT event_type,
              last_ts_us,
              {_DQ5_NOW_US} - last_ts_us AS staleness_us,
              ({_DQ5_NOW_US} - last_ts_us) < {_DQ5_FRESH_US} AS fresh,
              CAST(days_seen AS BIGINT) AS days_seen,
              CAST(date_diff('day', min_d, max_d) + 1 AS BIGINT) AS span_days,
              CAST(FLOOR(CAST(days_seen AS DOUBLE) * 1000000.0
                         / (date_diff('day', min_d, max_d) + 1)) AS BIGINT)
                  AS coverage_ppm,
              n_events,
              CAST(null_ts AS BIGINT) AS null_ts
       FROM g""",
    tags=("quality", "freshness", "completeness"),
    doc="Per-type data freshness + completeness monitor: staleness of the "
    "newest event against a FIXED audit instant (wall-clock now() is "
    "neither reproducible nor oracle-able — production would bind the "
    "constant per run), day-coverage of the observed span as integer "
    "ppm (count-of-distinct-days over span-days — gaps in the feed drop "
    "coverage below 1e6), null-timestamp accounting. One hash aggregate "
    "over the scan (distinct-days is a per-type partial distinct, "
    "bounded by span not row count); all arithmetic integer or "
    "identical-operand double → bit-exact cross-engine",
)
def dq5_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.max(F.unix_micros("ts")).alias("last_ts_us"),
        F.countDistinct(F.to_date("ts")).alias("days_seen"),
        F.min(F.to_date("ts")).alias("min_d"),
        F.max(F.to_date("ts")).alias("max_d"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0)).cast("bigint").alias("null_ts"),
    )
    span = F.datediff("max_d", "min_d") + F.lit(1)
    return g.select(
        "event_type",
        "last_ts_us",
        (F.lit(_DQ5_NOW_US) - F.col("last_ts_us")).alias("staleness_us"),
        ((F.lit(_DQ5_NOW_US) - F.col("last_ts_us")) < F.lit(_DQ5_FRESH_US)).alias("fresh"),
        F.col("days_seen").cast("bigint").alias("days_seen"),
        span.cast("bigint").alias("span_days"),
        F.floor(F.col("days_seen").cast("double") * 1_000_000.0 / span)
        .cast("bigint")
        .alias("coverage_ppm"),
        "n_events",
        "null_ts",
    )


def _sql_dq6_rel(rel: str, child: str, ck: str, parent: str, pk: str) -> str:
    orphans = (
        f"(SELECT COUNT(*) FROM {child} c LEFT JOIN {parent} p"
        f" ON c.{ck} = p.{pk} WHERE p.{pk} IS NULL)"
    )
    childless = (
        f"(SELECT COUNT(*) FROM {parent} p LEFT JOIN"
        f" (SELECT DISTINCT {ck} AS k FROM {child}) c ON p.{pk} = c.k"
        f" WHERE c.k IS NULL)"
    )
    return (
        f"SELECT '{rel}' AS relation,\n"
        f"  (SELECT COUNT(*) FROM {child}) AS n_child,\n"
        f"  {orphans} AS n_orphans,\n"
        f"  {orphans} = 0 AS fk_ok,\n"
        f"  {childless} AS n_childless_parents"
    )


@register(
    "dq6_referential_integrity",
    " UNION ALL ".join(
        [
            _sql_dq6_rel("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
            _sql_dq6_rel("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
            _sql_dq6_rel("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
            _sql_dq6_rel("events->customer", "events", "user_id", "customer", "c_custkey"),
        ]
    ),
    tags=("quality", "referential-integrity", "anti-join"),
    doc="Referential-integrity audit across the star schema: per FK "
    "relation, the orphan count (child keys with no parent — the "
    "violation a broken ingest introduces; LEFT ANTI join), the "
    "boolean verdict, and the childless-parent count (parents never "
    "referenced — the reverse direction that catches truncated child "
    "loads; ~1/3 of customers have no orders, so this side is "
    "non-degenerate on healthy data). Plan: one anti-join + one "
    "distinct-key anti-join per relation, each broadcast when the "
    "parent is a dim; at 100 TB the child side shuffles once on its "
    "FK. The fixtures are referentially clean — the orphan-detecting "
    "path is pinned on crafted broken data in tests/test_r7_ops.py",
)
def dq6_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    rels = [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("events->customer", "events", "user_id", "customer", "c_custkey"),
    ]
    out = None
    for rel, child, ck, parent, pk in rels:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent)
        n_child = c.count()
        n_orphans = c.join(p, c[ck] == p[pk], "left_anti").count()
        n_childless = p.join(
            c.select(F.col(ck).alias("k")).distinct(), p[pk] == F.col("k"), "left_anti"
        ).count()
        row = spark.createDataFrame(
            [(rel, n_child, n_orphans, n_orphans == 0, n_childless)],
            "relation string, n_child long, n_orphans long, fk_ok boolean, "
            "n_childless_parents long",
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "dq7_schema_evolution",
    """WITH g AS (
         SELECT CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS gen,
                CASE WHEN event_id % 2 = 1
                     THEN CASE WHEN value >= 50.0 THEN 'hi' ELSE 'lo' END
                END AS quality_tier
         FROM events)
       SELECT gen,
              COUNT(*) AS n_rows,
              SUM(CASE WHEN quality_tier IS NULL THEN 1 ELSE 0 END)::BIGINT
                  AS n_null_tier,
              SUM(CASE WHEN quality_tier = 'hi' THEN 1 ELSE 0 END)::BIGINT AS n_hi,
              SUM(CASE WHEN quality_tier = 'lo' THEN 1 ELSE 0 END)::BIGINT AS n_lo
       FROM g GROUP BY gen""",
    tags=("quality", "schema-evolution", "source"),
    doc="Schema-evolution read audit — the additive-column migration "
    "every long-lived feed goes through: two parquet GENERATIONS are "
    "staged under one partitioned layout (gen=1 original columns, "
    "gen=2 adds quality_tier — sources/writers."
    "stage_two_generation_events), then read back through ONE "
    "mergeSchema scan; gen is a discovered partition column. The audit "
    "pins the evolution contract: every gen-1 row surfaces the new "
    "column as NULL (never dropped rows, never a read error — the "
    "failure modes of schema-on-read), gen-2 rows carry real values. "
    "The oracle replays both generations from the ORIGINAL events "
    "table (the p5 source-fidelity discipline), so a mergeSchema "
    "regression — missed files, wrong null-fill, type clash — breaks "
    "the hash. Scan-side: one distributed read + one hash agg; at "
    "100 TB the same plan reads years of heterogeneous files without "
    "a backfill rewrite",
)
def dq7_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.writers import stage_two_generation_events

    path = stage_two_generation_events(spark, sf_dir)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    return df.groupBy(F.col("gen").cast("int").alias("gen")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("quality_tier").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_tier"),
        F.sum(F.when(F.col("quality_tier") == "hi", 1).otherwise(0))
        .cast("bigint")
        .alias("n_hi"),
        F.sum(F.when(F.col("quality_tier") == "lo", 1).otherwise(0))
        .cast("bigint")
        .alias("n_lo"),
    )


_DQ8_EVENT_BUCKET = "CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
_DQ8_USER_BUCKET = "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"


def _dq8_sql_split(bucket: str) -> str:
    return (
        f"CASE WHEN {bucket} < 80 THEN 'train' "
        f"WHEN {bucket} < 90 THEN 'val' ELSE 'test' END"
    )


@register(
    "dq8_split_leakage",
    f"""WITH e AS (
         SELECT user_id,
                {_dq8_sql_split(_DQ8_EVENT_BUCKET)} AS split_event,
                {_dq8_sql_split(_DQ8_USER_BUCKET)} AS split_user
         FROM events),
       u AS (
         SELECT user_id,
                COUNT(DISTINCT split_event) AS n_se,
                COUNT(DISTINCT split_user) AS n_su
         FROM e GROUP BY user_id),
       le AS (SELECT SUM(CASE WHEN n_se > 1 THEN 1 ELSE 0 END)::BIGINT AS n_leak FROM u),
       lu AS (SELECT SUM(CASE WHEN n_su > 1 THEN 1 ELSE 0 END)::BIGINT AS n_leak FROM u),
       me AS (
         SELECT SUM(CASE WHEN split_event = 'train' THEN 1 ELSE 0 END)::BIGINT AS n_train,
                SUM(CASE WHEN split_event = 'val' THEN 1 ELSE 0 END)::BIGINT AS n_val,
                SUM(CASE WHEN split_event = 'test' THEN 1 ELSE 0 END)::BIGINT AS n_test
         FROM e),
       mu AS (
         SELECT SUM(CASE WHEN split_user = 'train' THEN 1 ELSE 0 END)::BIGINT AS n_train,
                SUM(CASE WHEN split_user = 'val' THEN 1 ELSE 0 END)::BIGINT AS n_val,
                SUM(CASE WHEN split_user = 'test' THEN 1 ELSE 0 END)::BIGINT AS n_test
         FROM e)
       SELECT 'by_event' AS split_mode, me.n_train, me.n_val, me.n_test,
              le.n_leak AS n_leaking_users
       FROM me, le
       UNION ALL
       SELECT 'by_user' AS split_mode, mu.n_train, mu.n_val, mu.n_test,
              lu.n_leak AS n_leaking_users
       FROM mu, lu""",
    tags=("quality", "split", "leakage"),
    doc="Train/test split ENTITY-leakage audit — the evaluation-validity "
    "gate sm3's hash split needs before anyone trusts a metric: "
    "splitting by EVENT hash (row-level, the naive choice) scatters a "
    "user's events across train and test, so models memorize "
    "per-entity signal and eval overstates generalization; splitting "
    "by USER hash keeps each entity whole. Both rules run side by side "
    "(portable md5-mod, 80/10/10) and the audit reports per-split row "
    "masses plus the count of LEAKING users (entities seen in >1 "
    "split) — structurally >0 for the event split, provably 0 for the "
    "user split. Plan: one scan computes both assignments, a per-user "
    "distinct-count aggregate finds leakers — shuffle on user_id only; "
    "the 2-row audit unions two aggregates of the same base (Catalyst "
    "reuses the scan)",
)
def dq8_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def bucket(col):
        return hash_bucket(col)

    def split(b):
        return F.when(b < 80, "train").when(b < 90, "val").otherwise("test")

    e = ev.select(
        "user_id",
        split(bucket("event_id")).alias("split_event"),
        split(bucket("user_id")).alias("split_user"),
    )

    def audit(mode: str, col: str) -> DataFrame:
        rows = e.agg(
            F.sum(F.when(F.col(col) == "train", 1).otherwise(0)).cast("bigint").alias("n_train"),
            F.sum(F.when(F.col(col) == "val", 1).otherwise(0)).cast("bigint").alias("n_val"),
            F.sum(F.when(F.col(col) == "test", 1).otherwise(0)).cast("bigint").alias("n_test"),
        )
        leak = (
            e.groupBy("user_id")
            .agg(F.countDistinct(col).alias("n_splits"))
            .agg(
                F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_leaking_users")
            )
        )
        return rows.crossJoin(leak).select(
            F.lit(mode).alias("split_mode"), "n_train", "n_val", "n_test", "n_leaking_users"
        )

    return audit("by_event", "split_event").unionByName(audit("by_user", "split_user"))


# ---------------------------------------------------------------------------
# dq9: near-duplicate leakage across train/val/test DOCUMENT splits —
# dq8 audits entity leakage (the same user in two splits); this audits
# CONTENT leakage (two near-identical documents in two splits), the
# benchmark-contamination failure mode Lee et al. 2022 ("Deduplicating
# Training Data Makes Language Models Better") measured: a hash split
# scatters near-dup clusters across train and eval, so eval docs have
# verbatim-ish twins in train and metrics overstate generalization.
# ---------------------------------------------------------------------------


def _dq9_sql_rank(col: str) -> str:
    """Split RANK (train=0, val=1, test=2) for a doc-id column — sm3's
    portable md5-mod-100 split rule (90/5/5), as a DuckDB expression."""
    b = (
        f"CAST(('0x' || SUBSTRING(md5(CAST({col} AS VARCHAR)), 1, 8))::UBIGINT "
        f"AS BIGINT) % 100"
    )
    return f"CASE WHEN {b} < 90 THEN 0 WHEN {b} < 95 THEN 1 ELSE 2 END"


def _sql_dq9() -> str:
    from . import dedup  # noqa: F401  (registers d5; keeps this module import-independent)
    from ..catalog import REGISTRY

    d5 = REGISTRY["d5_lsh_jaccard_dedup"].sql
    return f"""WITH pairs AS (SELECT doc_a, doc_b FROM ({d5})),
        rk AS (SELECT doc_a, doc_b,
                      {_dq9_sql_rank('doc_a')} AS rk_a,
                      {_dq9_sql_rank('doc_b')} AS rk_b
               FROM pairs),
        o AS (SELECT LEAST(rk_a, rk_b) AS rk_lo,
                     GREATEST(rk_a, rk_b) AS rk_hi,
                     CASE WHEN rk_a <= rk_b THEN doc_a ELSE doc_b END AS doc_lo,
                     CASE WHEN rk_a <= rk_b THEN doc_b ELSE doc_a END AS doc_hi
              FROM rk)
        SELECT CASE rk_lo WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END
                   AS split_lo,
               CASE rk_hi WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END
                   AS split_hi,
               rk_lo <> rk_hi AS is_leak,
               COUNT(*) AS n_pairs,
               CAST(COUNT(DISTINCT doc_lo) AS BIGINT) AS n_docs_lo,
               CAST(COUNT(DISTINCT doc_hi) AS BIGINT) AS n_docs_hi
        FROM o GROUP BY rk_lo, rk_hi"""


@register(
    "dq9_neardup_split_leakage",
    _sql_dq9(),
    tags=("quality", "dedup", "split", "leakage", "headline"),
    doc="Near-duplicate CONTENT leakage across train/val/test splits — "
    "the evaluation-validity audit dq8's entity check cannot see: a "
    "row-hash split (sm3's 90/5/5 md5 rule) assigns near-identical "
    "documents independently, so ~10% of every near-dup cluster lands "
    "outside train and eval metrics grade memorization (Lee et al. "
    "2022 measured exactly this on C4/RealNews validation sets). The "
    "pair surface is d5's audited MinHash-LSH pipeline (banded bucket "
    "join -> exact Jaccard >= 0.5 -> never all-pairs); each pair's two "
    "split ranks derive PURELY from the doc-id hash as row-local "
    "expressions, so the audit adds ZERO joins and zero corpus-sized "
    "shuffles on top of d5 — only a <=6-row aggregate. Each pair is "
    "oriented lo->hi by split rank (train<val<test; ties keep d5's "
    "doc_a<doc_b order) and the audit reports, per (split_lo, "
    "split_hi) class: is_leak (the classes a release gate must be "
    "zero on, or route through decontamination), n_pairs, and the "
    "distinct doc counts per side — on the cross rows whose split_lo "
    "is 'train', n_docs_hi IS the headline 'eval documents with a "
    "train-side near-twin' count (the val<->test row counts test docs "
    "whose twin sits in VAL — still leakage, but not train "
    "contamination; sum only the split_lo='train' rows for the "
    "headline). "
    "CONSERVATION LAW (pinned in tests/test_r12_ops.py): "
    "SUM(n_pairs) over all classes == |d5 pairs| exactly. At 100 TB "
    "the cost IS d5's cost: the split ranks are codegen'd md5 "
    "expressions on the pair rows, and within one session the shingle "
    "cache is shared with d5/sm10 (corpus_shingled's documented "
    "materialization).",
)
def dq9_neardup_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import d5_lsh_jaccard_dedup

    def rk(col: str):
        b = hash_bucket(col)
        return F.when(b < 90, 0).when(b < 95, 1).otherwise(2)

    pairs = d5_lsh_jaccard_dedup(spark, sf_dir).select(
        "doc_a", "doc_b", rk("doc_a").alias("rk_a"), rk("doc_b").alias("rk_b")
    )
    fwd = F.col("rk_a") <= F.col("rk_b")  # ties keep d5's doc_a < doc_b order
    o = pairs.select(
        F.least("rk_a", "rk_b").alias("rk_lo"),
        F.greatest("rk_a", "rk_b").alias("rk_hi"),
        F.when(fwd, F.col("doc_a")).otherwise(F.col("doc_b")).alias("doc_lo"),
        F.when(fwd, F.col("doc_b")).otherwise(F.col("doc_a")).alias("doc_hi"),
    )

    def name(c):
        return F.when(F.col(c) == 0, "train").when(F.col(c) == 1, "val").otherwise("test")

    return (
        o.groupBy("rk_lo", "rk_hi")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("doc_lo").alias("n_docs_lo"),
            F.countDistinct("doc_hi").alias("n_docs_hi"),
        )
        .select(
            name("rk_lo").alias("split_lo"),
            name("rk_hi").alias("split_hi"),
            (F.col("rk_lo") != F.col("rk_hi")).alias("is_leak"),
            "n_pairs",
            "n_docs_lo",
            "n_docs_hi",
        )
    )
