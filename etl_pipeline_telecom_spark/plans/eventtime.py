"""Event-time analytics over the ``events`` fixture (SURVEY.md §2.10 / §7).

The reference is batch-only with zero time semantics; these are the §7
extension operators a telemetry/training-data pipeline needs. Batch forms
here (SQL-oracle-checkable); the Structured Streaming forms live in
``streaming/`` and are asserted equal to these batch plans in tests.

Scale notes (100 TB):
- Tumbling/sliding ``F.window`` is a plain projection + hash aggregate —
  one shuffle on (window, key); partial aggregation is map-side, so
  cardinality in flight is windows × keys, not events.
- ``session_window`` shuffles once on the user key, then sorts within
  partitions to merge gaps — skewed users are the risk; AQE skew-join
  handles the shuffle, and a two-level (user_id, day) pre-split would cap
  worst-case session length if a single user dominated.
- The as-of join is LINEAR: union the two event streams, one shuffle+sort
  on the user key, and a running ``max(struct(ts, id))`` window carries the
  latest error forward to each click. No join, no clicks×errors
  intermediate — per-user cost is O(events log events) for the sort, never
  quadratic in a hot user's history (the r3 join+max_by form exploded
  clicks × all-prior-errors before aggregating).
- The band join broadcasts the tiny dimension — BroadcastNestedLoopJoin
  with a 3-row build side, never a shuffle of the fact table.

All timestamps are compared as epoch microseconds (``unix_micros`` /
DuckDB ``epoch_us``) — integer-exact cross-engine, no float rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import dec_sum, register
from ..sources import load_table

_US_30M = 30 * 60 * 1_000_000
_US_1H = 60 * 60 * 1_000_000

# shared with plans/streaming.py: the streaming tumbling plan must satisfy
# the exact same oracle as the batch form
E1_TUMBLING_SQL = f"""SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // {_US_1H}) * {_US_1H} AS window_start_us,
              event_type, COUNT(*) AS cnt,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM events GROUP BY 1, 2"""


@register(
    "e1_tumbling_window",
    E1_TUMBLING_SQL,
    tags=("eventtime", "window-agg", "headline"),
    doc="Hourly tumbling-window counts+sums per event type (F.window)",
)
def e1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dec_sum("value", "sum_value"))
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


@register(
    "e2_sliding_window",
    f"""SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // {_US_30M}) * {_US_30M} - o.o * {_US_30M}
                  AS window_start_us,
              COUNT(*) AS cnt,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS o) o
       GROUP BY 1""",
    tags=("eventtime", "window-agg"),
    doc="Sliding 1h windows every 30min: each event lands in exactly two "
    "windows; oracle replays that membership with a 2-row cross join",
)
def e2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), dec_sum("value", "sum_value"))
        .select(F.unix_micros("w.start").alias("window_start_us"), "cnt", "sum_value")
    )


# shared with plans/streaming.py: the stateful streaming sessionizer
# (st3) satisfies the same oracle once a sentinel replay closes every
# real session (see streaming/jobs.py::replay_dir_with_sentinels).
#
# EXACT-THRESHOLD BOUNDARY (single source of truth for the family):
# Spark's builtin `session_window` MERGES sessions whose bounds touch —
# an event at exactly last+gap continues the session (inclusive
# boundary). This SQL's gaps-and-islands rule `gap >= threshold` SPLITS
# there instead, as does the stateful st3 sessionizer (`>= GAP_US`,
# streaming/stateful.py). So at an exactly-30:00.000000 gap: e3
# (builtin) merges; the oracle, st3, and DuckDB split. The divergence is
# measure-zero on continuous µs timestamps — random fixtures never
# produce it, which is why e3 stays hash-green — and e3b reproduces the
# builtin's inclusive boundary exactly (strict `>` on island detection).
# tests/test_properties.py pins both behaviors on crafted
# exact-threshold data.
E3_SESSION_SQL = f"""WITH t AS (
         SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t, value FROM events
       ), g AS (
         SELECT *, CASE WHEN LAG(t) OVER w IS NULL
                          OR t - LAG(t) OVER w >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_s
         FROM t WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
       ), s AS (
         SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
         FROM g
       )
       SELECT user_id,
              epoch_us(MIN(t)) AS session_start_us,
              epoch_us(MAX(t)) + {_US_30M} AS session_end_us,
              COUNT(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM s GROUP BY user_id, sid"""


@register(
    "e3_session_window",
    E3_SESSION_SQL,
    tags=("eventtime", "session"),
    doc="Per-user session windows (30min gap); oracle is the classic "
    "gaps-and-islands rewrite. Session end = last event + gap. NOTE the "
    "builtin merges an exactly-threshold gap (inclusive boundary) while "
    "the oracle splits at gap >= threshold — a measure-zero divergence "
    "on continuous timestamps, documented at E3_SESSION_SQL above and "
    "pinned on crafted data in tests/test_properties.py",
)
def e3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "sum_value"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "e4_asof_join",
    """WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t
                  FROM events WHERE event_type = 'click'),
            e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t
                  FROM events WHERE event_type = 'error')
       SELECT event_id, user_id, last_error_id, last_error_us FROM (
         SELECT c.event_id, c.user_id,
                e.event_id AS last_error_id,
                epoch_us(e.t) AS last_error_us,
                ROW_NUMBER() OVER (PARTITION BY c.event_id
                                   ORDER BY e.t DESC, e.event_id DESC) AS rn
         FROM c LEFT JOIN e ON e.user_id = c.user_id AND e.t <= c.t)
       WHERE rn = 1""",
    tags=("eventtime", "asof-join"),
    doc="As-of join: for each click, the most recent error by the same user "
    "at-or-before it. LINEAR plan: union both event kinds, one shuffle+sort "
    "per user, and a running max(struct(err_us, err_id)) over rows-unbounded-"
    "preceding carries the latest error to each click — errors sort before "
    "clicks at equal ts so ties-at-the-click-instant are included, matching "
    "the oracle's e.t <= c.t. Never materializes the clicks×errors pairs "
    "(the r3 join+max_by shape was quadratic in a hot user's error history)",
)
def e4_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # kind 0 = error, 1 = click: at equal ts the error sorts first, so the
    # running max below sees it — the inclusive `<=` of the oracle's join
    u = (
        ev.where(F.col("event_type").isin("click", "error"))
        .select(
            "event_id",
            "user_id",
            "ts",
            (F.col("event_type") == "click").cast("int").alias("kind"),
            F.when(
                F.col("event_type") == "error",
                F.struct(F.unix_micros("ts").alias("us"), F.col("event_id").alias("id")),
            ).alias("err_s"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # max(struct) ignores null click rows; struct ordering (us, id) matches
    # the oracle's ORDER BY e.t DESC, e.event_id DESC tie-break
    last = F.max("err_s").over(w)
    return (
        u.withColumn("last", last)
        .where(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("last.id").alias("last_error_id"),
            F.col("last.us").alias("last_error_us"),
        )
    )


@register(
    "e6_gap_fill",
    f"""WITH b AS (
          SELECT event_type,
                 (epoch_us(CAST(ts AS TIMESTAMP)) // {_US_1H}) * {_US_1H} AS bucket_us,
                 COUNT(*) AS cnt,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
          FROM events GROUP BY 1, 2),
        r AS (SELECT MIN(bucket_us) AS lo, MAX(bucket_us) AS hi FROM b),
        g AS (
          SELECT t.event_type, u.bucket_us
          FROM (SELECT DISTINCT event_type FROM events) t
          CROSS JOIN (SELECT UNNEST(range(lo, hi + {_US_1H}, {_US_1H})) AS bucket_us FROM r) u)
        SELECT g.event_type, g.bucket_us,
               COALESCE(b.cnt, 0) AS cnt,
               b.sum_value AS sum_value,
               last_value(b.sum_value IGNORE NULLS)
                   OVER (PARTITION BY g.event_type ORDER BY g.bucket_us
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sum_value_ffill
        FROM g LEFT JOIN b
          ON b.event_type = g.event_type AND b.bucket_us = g.bucket_us""",
    tags=("eventtime", "gap-fill", "timeseries", "headline"),
    doc="Hypertable-style dense rollup: hourly per-type buckets over the "
    "full observed range with missing buckets zero-filled and the hourly "
    "sum forward-filled (last_value IGNORE NULLS ≙ F.last ignorenulls). "
    "Scale: the fact table collapses to windows×types rows in ONE hash "
    "aggregate before anything else; the dense grid is #hours × #types — "
    "bounded by wall-clock time and the type enum, NOT by corpus size — "
    "built from a 1-row bounds aggregate via sequence+explode, so the "
    "join and ffill window run on the tiny aggregated side only",
)
def e6_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), dec_sum("value", "sum_value"))
        .select(
            "event_type", F.unix_micros("w.start").alias("bucket_us"), "cnt", "sum_value"
        )
    )
    bounds = hourly.agg(F.min("bucket_us").alias("lo"), F.max("bucket_us").alias("hi"))
    grid_times = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(_US_1H))).alias("bucket_us")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(grid_times))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "bucket_us"], "left")
        .select(
            "event_type",
            "bucket_us",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            "sum_value",
            F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_ffill"),
        )
    )


@register(
    "e5_band_range_join",
    """SELECT band, COUNT(*) AS cnt,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM events
       JOIN (VALUES ('low', 0.0, 5.0), ('mid', 5.0, 15.0), ('high', 15.0, 1e9))
            AS b(band, lo, hi)
         ON value >= lo AND value < hi
       GROUP BY band""",
    tags=("eventtime", "range-join"),
    doc="Range (band) join: broadcast the 3-row band dimension so the fact "
    "side never shuffles — BroadcastNestedLoopJoin on the inequality",
)
def e5_band_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 5.0), ("mid", 5.0, 15.0), ("high", 15.0, 1e9)],
        schema="band string, lo double, hi double",
    )
    return (
        ev.join(F.broadcast(bands), (ev.value >= bands.lo) & (ev.value < bands.hi))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("cnt"), dec_sum("value", "sum_value"))
    )


_US_1W = 7 * 24 * 60 * 60 * 1_000_000


@register(
    "e7_cohort_retention",
    f"""WITH ua AS (
          SELECT DISTINCT user_id,
                 epoch_us(date_trunc('week', CAST(ts AS TIMESTAMP))) AS week_us
          FROM events),
        c AS (SELECT *, MIN(week_us) OVER (PARTITION BY user_id) AS cohort_us
              FROM ua)
        SELECT cohort_us,
               CAST((week_us - cohort_us) / {_US_1W} AS BIGINT) AS week_offset,
               COUNT(*) AS n_active_users
        FROM c GROUP BY 1, 2""",
    tags=("eventtime", "cohort", "retention", "headline"),
    doc="Cohort retention matrix: users cohorted by first-active ISO week, "
    "counted per (cohort, week-offset) — the standard engagement/retention "
    "rollup. Plan: distinct (user, week) in one hash agg (map-side combine "
    "collapses each user's events per week BEFORE the exchange), a per-user "
    "running-min window for the cohort, and a final (cohort, offset) agg — "
    "in-flight cardinality is users × active-weeks, never events. Week "
    "arithmetic is exact: epoch-µs difference of Monday-truncated stamps "
    "divided by a week of µs (exact multiple, < 2⁵³ — identical IEEE "
    "division cross-engine)",
)
def e7_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ua = ev.select(
        "user_id", F.unix_micros(F.date_trunc("week", F.col("ts"))).alias("week_us")
    ).distinct()
    cohorted = ua.withColumn(
        "cohort_us", F.min("week_us").over(Window.partitionBy("user_id"))
    )
    offset = ((F.col("week_us") - F.col("cohort_us")) / _US_1W).cast("bigint")
    return cohorted.groupBy("cohort_us", offset.alias("week_offset")).agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


@register(
    "e8_funnel_steps",
    """WITH b AS (
         SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t
         FROM events WHERE event_type IN ('signup', 'click', 'purchase')
       ), w1 AS (
         SELECT *, MIN(CASE WHEN event_type = 'signup' THEN t END)
                     OVER (PARTITION BY user_id) AS t1 FROM b
       ), w2 AS (
         SELECT *, MIN(CASE WHEN event_type = 'click' AND t > t1 THEN t END)
                     OVER (PARTITION BY user_id) AS t2 FROM w1
       ), w3 AS (
         SELECT *, MIN(CASE WHEN event_type = 'purchase' AND t > t2 THEN t END)
                     OVER (PARTITION BY user_id) AS t3 FROM w2
       ), u AS (
         SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
         FROM w3 GROUP BY user_id
       )
       SELECT 'step1_signup' AS funnel_step, COUNT(t1) AS users FROM u
       UNION ALL SELECT 'step2_click' AS funnel_step, COUNT(t2) AS users FROM u
       UNION ALL SELECT 'step3_purchase' AS funnel_step, COUNT(t3) AS users FROM u""",
    tags=("eventtime", "funnel", "headline"),
    doc="Ordered conversion funnel (signup → later click → later purchase): "
    "per-user step timestamps via three chained unordered windows over ONE "
    "user_id partitioning — each step's min-timestamp condition references "
    "the previous step's, so the sequence constraint is enforced without "
    "self-joins, arrays, or per-user sorts; the final per-user collapse and "
    "step counts reuse the same hash partitioning (one exchange total). At "
    "100 TB this is the shape that survives a hot user: windows and agg "
    "are all partial-aggregatable and state per user is three timestamps",
)
def e8_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("signup", "click", "purchase")
    )
    w = Window.partitionBy("user_id")
    steps = (
        ev.withColumn(
            "t1", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts")
                )
            ).over(w),
        )
    )
    u = steps.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    counts = u.agg(
        F.count("t1").alias("c1"), F.count("t2").alias("c2"), F.count("t3").alias("c3")
    )
    return counts.select(
        F.expr(
            "stack(3, 'step1_signup', c1, 'step2_click', c2, 'step3_purchase', c3) "
            "AS (funnel_step, users)"
        )
    )


_US_7D = 7 * 24 * 60 * 60 * 1_000_000


@register(
    "e9_windowed_funnel",
    f"""WITH b AS (
         SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t
         FROM events WHERE event_type IN ('signup', 'click', 'purchase')
       ), w1 AS (
         SELECT *, MIN(CASE WHEN event_type = 'signup' THEN t END)
                     OVER (PARTITION BY user_id) AS t1 FROM b
       ), w2 AS (
         SELECT *, MIN(CASE WHEN event_type = 'click' AND t > t1
                             AND epoch_us(t) - epoch_us(t1) <= {_US_7D} THEN t END)
                     OVER (PARTITION BY user_id) AS t2 FROM w1
       ), w3 AS (
         SELECT *, MIN(CASE WHEN event_type = 'purchase' AND t > t2
                             AND epoch_us(t) - epoch_us(t2) <= {_US_7D} THEN t END)
                     OVER (PARTITION BY user_id) AS t3 FROM w2
       ), u AS (
         SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
         FROM w3 GROUP BY user_id
       )
       SELECT 'step1_signup' AS funnel_step, COUNT(t1) AS users FROM u
       UNION ALL SELECT 'step2_click_7d' AS funnel_step, COUNT(t2) AS users FROM u
       UNION ALL SELECT 'step3_purchase_7d' AS funnel_step, COUNT(t3) AS users FROM u""",
    tags=("eventtime", "funnel"),
    doc="Time-bounded conversion funnel: e8's ordered sequence with a "
    "7-day completion window per step (click within 7d of signup, "
    "purchase within 7d of that click) — the form product analytics "
    "actually ships. Same single-shuffle chained-window plan as e8; the "
    "time bound is integer epoch-µs arithmetic, exact cross-engine",
)
def e9_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("signup", "click", "purchase")
    )
    w = Window.partitionBy("user_id")
    in_7d = lambda a, b: F.unix_micros(a) - F.unix_micros(b) <= F.lit(_US_7D)  # noqa: E731
    steps = (
        ev.withColumn(
            "t1", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t1"))
                    & in_7d(F.col("ts"), F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2"))
                    & in_7d(F.col("ts"), F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    u = steps.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    counts = u.agg(
        F.count("t1").alias("c1"), F.count("t2").alias("c2"), F.count("t3").alias("c3")
    )
    return counts.select(
        F.expr(
            "stack(3, 'step1_signup', c1, 'step2_click_7d', c2, 'step3_purchase_7d', c3) "
            "AS (funnel_step, users)"
        )
    )


@register(
    "e3b_session_window_skewfree",
    E3_SESSION_SQL,
    tags=("eventtime", "session", "skew"),
    doc="Skew-robust sessionization — the two-level (user, day) pre-split "
    "the e3 scale notes promise, IMPLEMENTED: phase 1 sessionizes within "
    "(user_id, calendar day), so a hot user's events spread across as "
    "many tasks as days instead of one straggler partition; phase 2 "
    "merges day-session chains that cross midnight (next session's first "
    "event before previous session's end ⟺ gap < threshold) with ONE "
    "window over the per-(user, day-session) rows — cardinality "
    "users × sessions-per-day, never events. Value sums stay exact "
    "decimals until the final cast, so the result is BIT-IDENTICAL to "
    "single-pass e3 and carries e3's oracle verbatim. Worst-case per-task "
    "work drops from one user's full history to one user-day",
)
def e3b_session_window_skewfree(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day_sessions = (
        ev.groupBy(
            "user_id",
            F.to_date("ts").alias("day"),
            F.session_window("ts", "30 minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("s_us"),
            F.unix_micros("w.end").alias("e_us"),
            "n",
            "sum_dec",
        )
    )
    w_user = Window.partitionBy("user_id").orderBy("s_us")
    prev_end = F.max("e_us").over(w_user.rowsBetween(Window.unboundedPreceding, -1))
    # STRICT > : Spark's session_window merges sessions whose bounds TOUCH
    # (an event at exactly last+gap continues the session — inclusive
    # boundary), while the gaps-and-islands SQL's `gap >= threshold` rule
    # would split there. The boundary is measure-zero on continuous
    # timestamps (why e3's oracle never sees it); e3b mirrors the builtin
    # exactly, and tests/test_properties.py pins the boundary behavior.
    flagged = day_sessions.withColumn(
        "new_island", (prev_end.isNull() | (F.col("s_us") > prev_end)).cast("int")
    ).withColumn(
        "island",
        F.sum("new_island").over(w_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("user_id", "island")
        .agg(
            F.min("s_us").alias("session_start_us"),
            F.max("e_us").alias("session_end_us"),
            F.sum("n").alias("n_events"),
            F.sum("sum_dec").cast("double").alias("sum_value"),
        )
        .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
    )


@register(
    "e10_time_weighted_avg",
    """WITH seq AS (
         SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                CAST(value AS DECIMAL(18,2)) AS v,
                epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
                LEAD(epoch_us(CAST(ts AS TIMESTAMP)))
                  OVER (PARTITION BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
                        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_us
         FROM events)
       SELECT user_id, day,
              CAST(COUNT(*) + 1 AS BIGINT) AS n_samples,
              CAST(SUM(next_us - t_us) AS BIGINT) AS span_us,
              ROUND(CAST(SUM(v * (next_us - t_us)) AS DOUBLE)
                    / CAST(SUM(next_us - t_us) AS DOUBLE), 6) AS twa
       FROM seq WHERE next_us IS NOT NULL
       GROUP BY user_id, day""",
    tags=("eventtime", "timeseries", "time-weighted", "headline"),
    doc="Time-weighted average over irregularly sampled values (the "
    "TimescaleDB time_weight op, LOCF interpolation): per (user, day), "
    "each observation holds until the next one, so TWA = "
    "sum(v_i * dt_i) / sum(dt_i) over consecutive-event gaps — the "
    "correct daily summary when sampling is bursty (a plain AVG "
    "overweights bursts; e1's tumbling AVG is the uniform-sampling "
    "special case). Exactness: dt is integer microseconds, v is "
    "DECIMAL(18,2), so the weighted sum is an exact decimal in any "
    "accumulation order; the single final division is double/double "
    "with identical operands cross-engine. Plan: ONE shuffle (the "
    "(user, day) window partitioning shared by the lead() and the "
    "aggregate — task size bounded by one user-day, e3b's skew "
    "argument); single-event days drop out (no interval). At 100 TB "
    "the decimal(38,2) weighted sum has ~1e17 headroom over int64 "
    "microsecond spans.",
)
def e10_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        day.alias("day"),
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.unix_micros("ts").alias("t_us"),
        "ts",
        "event_id",
    ).withColumn("next_us", F.lead("t_us").over(w))
    dt = F.col("next_us") - F.col("t_us")
    return (
        seq.where(F.col("next_us").isNotNull())
        .groupBy("user_id", "day")
        .agg(
            (F.count(F.lit(1)) + 1).cast("bigint").alias("n_samples"),
            F.sum(dt).cast("bigint").alias("span_us"),
            F.round(
                F.sum(F.col("v") * dt).cast("double") / F.sum(dt).cast("double"), 6
            ).alias("twa"),
        )
    )


@register(
    "e11_max_concurrency",
    """WITH iv AS (
         SELECT event_type,
                epoch_us(CAST(ts AS TIMESTAMP)) AS s,
                epoch_us(CAST(ts AS TIMESTAMP))
                  + ((event_id % 3600) + 60) * 1000000 AS e
         FROM events
       ), pts AS (
         SELECT event_type, s AS t, 1 AS delta FROM iv
         UNION ALL
         SELECT event_type, e AS t, -1 AS delta FROM iv
       ), run AS (
         SELECT event_type,
                SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                                 ROWS UNBOUNDED PRECEDING) AS conc
         FROM pts
       )
       SELECT event_type,
              CAST(MAX(conc) AS BIGINT) AS max_concurrent,
              CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals
       FROM run GROUP BY event_type""",
    tags=("eventtime", "intervals", "sweep"),
    doc="Peak concurrent intervals per event type via the classic "
    "sweep-line (+1 at start, -1 at end, running sum): each event spawns "
    "a deterministic half-open interval [ts, ts + (event_id%3600+60)s). "
    "LINEAR, never the quadratic interval self-join: one explode to 2N "
    "boundary points, one shuffle+sort on event_type, one running-sum "
    "window, one hash agg. Ends sort before starts at an equal "
    "timestamp (delta -1 < +1) so touching intervals don't overlap "
    "(half-open semantics); within a tie-run of equal (t, delta) the "
    "prefix-sum MULTISET is permutation-invariant, so MAX(conc) is "
    "deterministic cross-engine even though per-row running values at "
    "ties are not (only the aggregate is emitted). At 100 TB a skewed "
    "type would pre-split on (event_type, day) with per-day carry-in "
    "offsets (the e3b two-level pattern)",
)
def e11_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = F.unix_micros(F.col("ts").cast("timestamp"))
    e = s + ((F.col("event_id") % 3600) + 60) * F.lit(1_000_000)
    pts = ev.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(s.alias("t"), F.lit(1).alias("delta")),
                F.struct(e.alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("p"),
    ).select("event_type", "p.t", "p.delta")
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = pts.withColumn("conc", F.sum("delta").over(w))
    return run.groupBy("event_type").agg(
        F.max("conc").cast("bigint").alias("max_concurrent"),
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_intervals"),
    )
