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
    """SELECT l_returnflag AS grp,
              COUNT(DISTINCT l_orderkey) AS exact_orders,
              TRUE AS within_bound
       FROM lineitem GROUP BY 1""",
    tags=("sketch", "approx"),
    doc="HLL++ approx_count_distinct of order keys per return flag, emitted "
    "as (group, exact count, within-5%%-of-exact boolean). The sketch "
    "estimate itself is engine-specific, but it is a DETERMINISTIC "
    "function of the data, so the bound check is a stable value the "
    "oracle can assert TRUE (graduated from rows-only in r5 per VERDICT "
    "r4 #7; the raw-estimate form was rows-only through r4). At 100 TB "
    "only the fixed-memory sketch side runs; the exact count_distinct "
    "here is the verification anchor",
)
def a14_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("grp"))
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx"),
            F.count_distinct("l_orderkey").alias("exact_orders"),
        )
        .select(
            "grp",
            "exact_orders",
            (
                F.abs(F.col("approx") - F.col("exact_orders"))
                <= F.col("exact_orders") * F.lit(0.05)
            ).alias("within_bound"),
        )
    )


_A15_PS = (0.25, 0.5, 0.75)
# GK sketch at accuracy 10_000 bounds rank error to n/10_000 (0.01% of
# rows); on this distribution that is orders of magnitude inside a 1%
# VALUE tolerance (measured ~1e-5 relative at sf0.1), so the bound check
# below is a stable deterministic output, not a flaky tolerance.
_A15_REL_TOL = 0.01

_SQL_A15_CENTS = (
    "SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM lineitem"
)


def _sql_a15() -> str:
    branches = [
        f"""SELECT CAST({p} AS DOUBLE) AS p,
                   quantile_cont(c, {p}) / 100.0 AS exact_value,
                   TRUE AS approx_ok
            FROM ({_SQL_A15_CENTS})"""
        for p in _A15_PS
    ]
    return " UNION ALL ".join(branches)


@register(
    "a15_percentile_approx",
    _sql_a15(),
    tags=("sketch", "approx"),
    doc="approx_percentile quartiles of extended price — the no-full-sort "
    "form of a13_median, the SURVEY §7 scale path for exact median. One "
    "scalar row per quartile (p, exact_value, approx_ok): exact_value is "
    "interpolated over integer CENTS so the lerp operands are identical "
    "doubles in Spark and DuckDB (the a17 trick — bit-exact hash verdict); "
    "the sketch value itself is engine-specific, so it is verified as a "
    "deterministic error-bound check (approx within 1% of exact — the GK "
    "rank guarantee at accuracy 10k leaves ~3 orders of magnitude of "
    "margin) whose oracle expectation is the literal TRUE. The raw sketch "
    "error is additionally bounded in tests/test_sketches.py.",
)
def a15_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    ps_sql = ", ".join(str(p) for p in _A15_PS)
    agg = li.select(cents.alias("c")).agg(
        F.percentile_approx("c", list(_A15_PS), 10_000).alias("ap"),
        F.expr(f"percentile(c, array({ps_sql}))").alias("ex"),
    )
    zipped = agg.select(F.posexplode(F.arrays_zip("ap", "ex")).alias("pos", "z"))
    p = F.element_at(F.array(*[F.lit(float(x)) for x in _A15_PS]), F.col("pos") + 1)
    ap = F.col("z.ap").cast("double")
    ex = F.col("z.ex")
    return zipped.select(
        p.alias("p"),
        (ex / F.lit(100.0)).alias("exact_value"),
        (F.abs(ap - ex) <= F.lit(_A15_REL_TOL) * ex).alias("approx_ok"),
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


_A16_SUPPORT = 0.15


@register(
    "a16_freq_items",
    f"""SELECT COUNT(*) AS n_heavy, TRUE AS all_heavy_found
       FROM (SELECT o_orderpriority, COUNT(*) AS c FROM orders GROUP BY 1),
            (SELECT COUNT(*) AS n FROM orders)
       WHERE c > n * {_A16_SUPPORT}""",
    tags=("sketch", "approx", "heavy-hitters"),
    doc="freqItems heavy-hitter sketch over order priorities, emitted as "
    "(number of true heavy hitters, sketch-covers-them-all boolean). The "
    "sketch's contract — a superset of every item with frequency > "
    "support, never a miss — makes the coverage boolean deterministic, "
    "so the oracle can assert it TRUE against the exactly-computed heavy "
    "set (graduated from rows-only in r5 per VERDICT r4 #7). The two "
    "cross joins are 1-row scalar-count broadcasts, not data cartesians",
)
def a16_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    fi = orders.stat.freqItems(["o_orderpriority"], support=_A16_SUPPORT)
    cnts = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("c"))
    tot = orders.agg(F.count(F.lit(1)).alias("n"))
    heavy = cnts.join(F.broadcast(tot)).where(
        F.col("c") > F.col("n") * F.lit(_A16_SUPPORT)
    )
    return (
        heavy.join(F.broadcast(fi))
        .select(
            F.array_contains("o_orderpriority_freqItems", F.col("o_orderpriority")).alias("hit")
        )
        .agg(
            F.count(F.lit(1)).alias("n_heavy"),
            F.coalesce(F.bool_and("hit"), F.lit(True)).alias("all_heavy_found"),
        )
    )


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


# corr via exact decimal moment sums: qty/price cast to DECIMAL(18,2),
# their product to DECIMAL(37,4) — all sums exact; the six aggregate
# values convert to double identically in both engines (every scaled
# integer < 2^53 at probed sfs rounds to the same double), and the final
# Pearson formula is the SAME IEEE expression on the SAME operands.
_SQL_CORR = """WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n AS n_rows,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
               AS corr_qty_price
    FROM m"""


@register(
    "a18_exact_corr",
    _SQL_CORR,
    tags=("agg", "statistics", "corr", "headline"),
    doc="Grouped Pearson correlation (quantity ↔ price per return flag) "
    "from exact decimal moment sums — NOT F.corr/DuckDB corr, whose "
    "streaming accumulation orders differ across engines and partition "
    "layouts; six exact sums + one closed-form IEEE expression make the "
    "result bit-deterministic AND the plan a single map-side-combining "
    "hash aggregate (the moments pattern is also how you'd compute corr "
    "over 100 TB: one pass, six numbers per group in flight)",
)
def a18_exact_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d("l_quantity")).cast("double").alias("sx"),
        F.sum(d("l_extendedprice")).cast("double").alias("sy"),
        F.sum(d("l_quantity") * d("l_extendedprice")).cast("double").alias("sxy"),
        F.sum(d("l_quantity") * d("l_quantity")).cast("double").alias("sxx"),
        F.sum(d("l_extendedprice") * d("l_extendedprice")).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        "l_returnflag", F.col("n").alias("n_rows"), F.round(corr, 6).alias("corr_qty_price")
    )


# 2025-01-01 UTC — recenters epoch seconds so the decimal moment sums
# (notably Σx²) stay far inside DECIMAL(38) even at 1000× the probed data
_A19_X0 = 1_735_689_600

_SQL_A19 = f"""WITH b AS (
      SELECT event_type,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 - {_A19_X0}
                  AS DECIMAL(18,0)) AS x,
             CAST(value AS DECIMAL(18,2)) AS y
      FROM events
    ), m AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM b GROUP BY event_type
    )
    SELECT event_type, n AS n_rows,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 12) AS slope_per_sec,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 9)
             AS intercept
    FROM m"""


@register(
    "a19_grouped_regression",
    _SQL_A19,
    tags=("agg", "statistics", "regression", "headline"),
    doc="Grouped least-squares trend (value vs. time per event type) from "
    "exact decimal moment sums — same discipline as a18: x is epoch "
    "seconds recentered to 2025-01-01 (integral, so x·y and x² are exact "
    "decimals; Σx² stays < 10³⁸ even at 1000× data), the five sums "
    "convert to identical doubles in both engines, and slope/intercept "
    "are the same closed-form IEEE expression on the same operands. ONE "
    "map-side-combining hash aggregate — five numbers per group in "
    "flight, the correct 100 TB shape for any per-group OLS fit",
)
def a19_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = (F.expr("unix_micros(ts) div 1000000") - F.lit(_A19_X0)).cast("decimal(18,0)")
    y = F.col("value").cast("decimal(18,2)")
    m = ev.select("event_type", x.alias("x"), y.alias("y")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_rows"),
        F.round(slope, 12).alias("slope_per_sec"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 9).alias("intercept"),
    )


@register(
    "a20_hll_union",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
              CAST(COUNT(DISTINCT month(o_orderdate)) AS BIGINT) AS n_months,
              COUNT(DISTINCT o_custkey) AS exact_customers,
              TRUE AS within_bound
       FROM orders GROUP BY 1""",
    tags=("sketch", "approx", "mergeable", "headline"),
    doc="Mergeable-sketch rollup — the property that makes sketches work at "
    "100 TB: per-(year, month) Datasketches HLL sketches of the distinct "
    "customer set are built in one pass (hll_sketch_agg, lgConfigK=12), "
    "then UNIONED up to year level (hll_union_agg) without rescanning "
    "the data — exactly how a 1000-executor fleet combines per-partition "
    "sketches, or how daily sketches roll into monthly dashboards. "
    "Emitted as (year, months merged, exact count, estimate-within-2x-"
    "rsd boolean): the sketch estimate is a deterministic function of "
    "the data (register maxima — order- and partitioning-independent), "
    "so the bound check is a stable value the oracle asserts TRUE, the "
    "same graduated form as a14/a15/a16. lgConfigK=12 → rsd ~1.6%; the "
    "gate is 5%. The exact COUNT(DISTINCT) exists only as the "
    "verification anchor — at scale only the sketch side runs.",
)
def a20_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").alias("mo"),
    ).agg(F.hll_sketch_agg("o_custkey", F.lit(12)).alias("sk"))
    yearly = monthly.groupBy("yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = o.groupBy(F.year("o_orderdate").cast("bigint").alias("yr")).agg(
        F.count_distinct("o_custkey").alias("exact_customers")
    )
    return exact.join(yearly, "yr").select(
        "yr",
        "n_months",
        "exact_customers",
        (
            F.abs(F.col("est") - F.col("exact_customers"))
            <= F.col("exact_customers") * F.lit(0.05)
        ).alias("within_bound"),
    )


_BOOT_B = 16  # bootstrap replicates
# cumulative Poisson(1) pmf thresholds in ppm: P(0), P(<=1), P(<=2), P(<=3);
# weights cap at 4 (P(>=5) ~ 0.4% folds into the tail bucket)
_BOOT_T = (367_879, 735_759, 919_699, 981_012)


def _sql_boot_weight(b: int) -> str:
    u = (
        f"CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '_{b}'), 1, 8)) AS BIGINT)"
        f" % 1000000"
    )
    return (
        f"CASE WHEN {u} < {_BOOT_T[0]} THEN 0 WHEN {u} < {_BOOT_T[1]} THEN 1 "
        f"WHEN {u} < {_BOOT_T[2]} THEN 2 WHEN {u} < {_BOOT_T[3]} THEN 3 ELSE 4 END"
    )


def _sql_a21() -> str:
    sums = ", ".join(
        f"CAST(SUM({_sql_boot_weight(b)} * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s{b}, "
        f"CAST(SUM({_sql_boot_weight(b)}) AS DOUBLE) AS c{b}"
        for b in range(_BOOT_B)
    )
    # NULLIF guards c_b = 0 (empty events table; all-zero draws are
    # astronomically unlikely but covered too): s/NULLIF(c,0) is NULL —
    # never 0/0=NaN, which DuckDB's CAST(NaN AS BIGINT) would reject —
    # and COALESCE pins the empty-input contract to replicate mean 0,
    # hence boot_mean = boot_se = 0.0 on an empty table in both engines.
    means_u = ", ".join(
        f"COALESCE(CAST(FLOOR(s{b} / NULLIF(c{b}, 0) * 1000000) AS BIGINT), 0) AS m{b}"
        for b in range(_BOOT_B)
    )
    msum = " + ".join(f"m{b}" for b in range(_BOOT_B))
    m2sum = " + ".join(f"m{b} * m{b}" for b in range(_BOOT_B))
    B = _BOOT_B
    return f"""WITH agg AS (SELECT {sums} FROM events),
        mu AS (SELECT {means_u} FROM agg),
        st AS (SELECT ({msum}) AS ms, ({m2sum}) AS m2s FROM mu)
        SELECT CAST({B} AS BIGINT) AS n_replicates,
               ROUND(CAST(ms AS DOUBLE) / {B} / 1000000, 6) AS boot_mean,
               ROUND(SQRT(CAST({B} * m2s - ms * ms AS DOUBLE) / ({B} * ({B} - 1)))
                     / 1000000, 6) AS boot_se
        FROM st"""


@register(
    "a21_poisson_bootstrap",
    _sql_a21(),
    tags=("sketch", "statistics", "bootstrap", "headline"),
    doc="Poisson bootstrap standard error of the global mean — THE "
    "scalable bootstrap: instead of resampling n rows with replacement "
    "(impossible distributed), each row gets an independent "
    "Poisson(1)-distributed weight per replicate, realized here as a "
    "DETERMINISTIC per-(row, replicate) hash draw against the cumulative "
    "pmf — reruns and engines agree, unlike rand(). All 16 replicates "
    "are computed in ONE aggregation pass with NO row explosion (16 "
    "conditional-sum pairs in a single map-side-combining agg); the "
    "replicate means are quantized to integer micro-units so the "
    "across-replicate mean/variance arithmetic is exact in any order "
    "(sm5/t16/dq4 discipline), and the final sqrt is IEEE-identical "
    "cross-engine. Empty-input contract: a zero weight count (empty "
    "table) makes the replicate mean NULL via NULLIF, coalesced to 0 — "
    "boot_mean = boot_se = 0.0, never a 0/0 NaN (DuckDB would reject "
    "CAST(NaN AS BIGINT)). int64 headroom: B*m2s sums 16 squared "
    "micro-unit means, exact while |mean| < ~760 (m_b < 7.6e8 µ, "
    "m_b^2*16 < 2^63); fixture values cap at ~500. At 100 TB this is "
    "one scan + one 32-column partial agg — the cost of the statistic "
    "is the cost of a COUNT(*).",
)
def a21_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")

    def weight(b: int):
        u = F.conv(
            F.substring(F.md5(F.concat(F.col("event_id").cast("string"), F.lit(f"_{b}"))), 1, 8),
            16,
            10,
        ).cast("bigint") % 1_000_000
        return (
            F.when(u < _BOOT_T[0], 0)
            .when(u < _BOOT_T[1], 1)
            .when(u < _BOOT_T[2], 2)
            .when(u < _BOOT_T[3], 3)
            .otherwise(4)
        )

    aggs = []
    for b in range(_BOOT_B):
        w = weight(b)
        aggs.append(F.sum(w * v).cast("double").alias(f"s{b}"))
        aggs.append(F.sum(w).cast("double").alias(f"c{b}"))
    agg = ev.agg(*aggs)
    # NULLIF + COALESCE mirror the oracle's c_b = 0 guard exactly:
    # empty input → every replicate mean 0 → boot_mean = boot_se = 0.0.
    mu = agg.select(
        *[
            F.coalesce(
                F.floor(
                    F.col(f"s{b}") / F.nullif(F.col(f"c{b}"), F.lit(0.0)) * 1_000_000
                ).cast("bigint"),
                F.lit(0),
            ).alias(f"m{b}")
            for b in range(_BOOT_B)
        ]
    )
    ms = sum((F.col(f"m{b}") for b in range(1, _BOOT_B)), F.col("m0"))
    m2s = sum((F.col(f"m{b}") * F.col(f"m{b}") for b in range(1, _BOOT_B)), F.col("m0") * F.col("m0"))
    B = _BOOT_B
    return mu.select(ms.alias("ms"), m2s.alias("m2s")).select(
        F.lit(B).cast("bigint").alias("n_replicates"),
        F.round(F.col("ms").cast("double") / B / 1_000_000, 6).alias("boot_mean"),
        F.round(
            F.sqrt((B * F.col("m2s") - F.col("ms") * F.col("ms")).cast("double") / (B * (B - 1)))
            / 1_000_000,
            6,
        ).alias("boot_se"),
    )


# a22 count-min sketch: depth 4 pairwise-independent-ish hash rows over a
# Mersenne prime, width 256. Unlike HLL (a20, graduated via a bound
# check) the CMS is pure integer arithmetic — BOTH engines replay the
# sketch exactly, so the oracle is hash-exact, not a bound.
_CMS_P = 2_147_483_647  # 2^31 - 1
_CMS_W = 256
_CMS_ROWS = ((0, 1103515245, 12345), (1, 1140671485, 12820163),
             (2, 214013, 2531011), (3, 69069, 1234567))
_CMS_HH_FRAC = 128  # heavy hitter: estimated count >= total/128 (15/150 users at sf0.01)

_SQL_CMS_PARAMS = "(VALUES " + ", ".join(f"({d}, {a}, {b})" for d, a, b in _CMS_ROWS) + ") p(d, a, b)"


@register(
    "a22_countmin_heavy_hitters",
    f"""WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
        cells AS (
          SELECT p.d, ((p.a * ev.user_id + p.b) % {_CMS_P}) % {_CMS_W} AS cell,
                 COUNT(*) AS cnt
          FROM ev CROSS JOIN {_SQL_CMS_PARAMS}
          GROUP BY 1, 2),
        users AS (SELECT user_id, COUNT(*) AS exact_cnt FROM ev GROUP BY 1),
        est AS (
          SELECT u.user_id, u.exact_cnt, MIN(c.cnt) AS cms_est
          FROM users u
          CROSS JOIN {_SQL_CMS_PARAMS}
          JOIN cells c
            ON c.d = p.d
           AND c.cell = ((p.a * u.user_id + p.b) % {_CMS_P}) % {_CMS_W}
          GROUP BY 1, 2),
        tot AS (SELECT COUNT(*) AS n FROM ev)
        SELECT est.user_id,
               est.exact_cnt,
               CAST(est.cms_est AS BIGINT) AS cms_est,
               est.cms_est >= est.exact_cnt AS no_underestimate,
               est.exact_cnt * {_CMS_HH_FRAC} >= tot.n AS is_true_hh
        FROM est, tot
        WHERE est.cms_est * {_CMS_HH_FRAC} >= tot.n""",
    tags=("sketch", "mergeable", "heavy-hitters", "headline"),
    doc="Count-min-sketch heavy hitters (Cormode–Muthukrishnan): depth-4 "
    "width-256 counter array over ((a*key+b) mod 2^31-1) mod w hash "
    "rows, point estimate = min over rows, report keys the SKETCH "
    "claims exceed total/128 alongside their exact counts, the "
    "no-underestimate invariant (always true, by construction), and "
    "whether each is a TRUE heavy hitter (false positives are the "
    "sketch's documented failure mode; false negatives impossible). "
    "All-integer arithmetic → the oracle replays the sketch EXACTLY "
    "(vs a20's bound-check graduation). Scale shape: the sketch is a "
    "1024-row table built by one map-side-combinable aggregate (this "
    "IS the mergeable property — executor-local sketches sum), then "
    "BROADCAST to the distinct-key probe; the fact table never "
    "shuffles twice, and at 100 TB the probe side would be the "
    "candidate stream from the same partial agg",
)
def a22_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())

    def cms_cells():
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (((F.lit(a) * F.col("user_id") + F.lit(b)) % _CMS_P) % _CMS_W).alias(
                            "cell"
                        ),
                    )
                    for d, a, b in _CMS_ROWS
                ]
            )
        ).alias("h")

    cells = (
        ev.select(cms_cells())
        .groupBy("h.d", "h.cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = (
        users.select("user_id", "exact_cnt", cms_cells())
        .select("user_id", "exact_cnt", "h.d", "h.cell")
        .join(F.broadcast(cells), ["d", "cell"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    return (
        est.crossJoin(F.broadcast(tot))
        .where(F.col("cms_est") * _CMS_HH_FRAC >= F.col("n"))
        .select(
            "user_id",
            "exact_cnt",
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") >= F.col("exact_cnt")).alias("no_underestimate"),
            (F.col("exact_cnt") * _CMS_HH_FRAC >= F.col("n")).alias("is_true_hh"),
        )
    )


_A23_BIN_CENTS = 10_000  # $100 bins over extendedprice cents
_A23_PS = (250, 500, 750, 900)  # quantiles in parts-per-thousand


@register(
    "a23_histogram_quantiles",
    f"""WITH c AS (
          SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM lineitem),
        h AS (SELECT cents // {_A23_BIN_CENTS} AS bin, COUNT(*) AS cnt FROM c GROUP BY 1),
        cum AS (
          SELECT bin, cnt,
                 SUM(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
                 SUM(cnt) OVER () AS n
          FROM h),
        ps AS (SELECT unnest([{', '.join(str(p) for p in _A23_PS)}]) AS p_ppt),
        sel AS (
          SELECT ps.p_ppt, MIN(cum.bin) AS qbin, MAX(cum.n) AS n
          FROM cum, ps WHERE cum.cum * 1000 >= ps.p_ppt * cum.n
          GROUP BY ps.p_ppt),
        ex AS (
          SELECT unnest([{', '.join(str(p) for p in _A23_PS)}]) AS p_ppt,
                 unnest(quantile_cont(cents, [{', '.join(str(p / 1000.0) for p in _A23_PS)}]))
                     AS exact_cents
          FROM c)
        SELECT s.p_ppt,
               s.qbin * {_A23_BIN_CENTS} AS bin_lo_cents,
               (s.qbin + 1) * {_A23_BIN_CENTS} AS bin_hi_cents,
               ROUND(e.exact_cents, 6) AS exact_cents,
               CAST(s.n AS BIGINT) AS n
        FROM sel s JOIN ex e ON s.p_ppt = e.p_ppt""",
    tags=("sketch", "mergeable", "percentile", "headline"),
    doc="Histogram-based quantile estimation — the MERGEABLE percentile "
    "path (a13's exact median needs a full sort; a15's GK sketch is "
    "engine-specific): a fixed-width integer-bin histogram of price "
    "cents is built in one map-side-combinable aggregate (per-"
    "partition histograms SUM — that is the mergeable property), the "
    "quantile lands in the first bin whose cumulative count reaches "
    "ceil(p*n) (integer cross-multiplied as cum*1000 >= p_ppt*n — no "
    "float rank), and the answer is the bin's [lo, hi) edge pair with "
    "guaranteed error <= one bin width. Unlike HLL/GK the estimate is "
    "pure integer arithmetic, so the oracle replays it EXACTLY; the "
    "interpolated exact quantile (integer-cents lerp, the a15/a17 "
    "IEEE-identical trick) rides along as the verification anchor. "
    "The cumulative window runs over the BOUNDED bin table (price "
    "range / $100 ≈ thousands of rows post-agg), never the fact scan",
)
def a23_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    c = li.select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    # ONE fact scan instead of two: group to exact-cents value-domain
    # counts first (map-side-combinable; |distinct prices| rows out) and
    # derive BOTH the $100-bin histogram and the exact-anchor percentile
    # from it. percentile(col, ps, freq) over (value, count) pairs is the
    # identical order-statistics + lerp computation as over raw rows —
    # equal values lerp trivially — so exact_cents is bit-unchanged.
    vc = c.groupBy("cents").agg(F.count(F.lit(1)).alias("vcnt")).localCheckpoint()
    h = vc.groupBy((F.col("cents") / _A23_BIN_CENTS).cast("bigint").alias("bin")).agg(
        F.sum("vcnt").alias("cnt")
    )
    from pyspark.sql import Window as W

    cum = h.select(
        "bin",
        "cnt",
        F.sum("cnt").over(W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(W.partitionBy()).alias("n"),
    )
    ps = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _A23_PS])).alias("p_ppt")
    )
    sel = (
        cum.crossJoin(F.broadcast(ps))
        .where(F.col("cum") * 1000 >= F.col("p_ppt") * F.col("n"))
        .groupBy("p_ppt")
        .agg(F.min("bin").alias("qbin"), F.max("n").alias("n"))
    )
    ps_sql = ", ".join(str(p / 1000.0) for p in _A23_PS)
    ex = (
        vc.agg(F.expr(f"percentile(cents, array({ps_sql}), vcnt)").alias("q"))
        .select(F.posexplode("q").alias("pos", "exact_cents"))
        .select(
            F.element_at(
                F.array(*[F.lit(p) for p in _A23_PS]), F.col("pos") + 1
            ).alias("p_ppt"),
            "exact_cents",
        )
    )
    return sel.join(ex, "p_ppt").select(
        "p_ppt",
        (F.col("qbin") * _A23_BIN_CENTS).alias("bin_lo_cents"),
        ((F.col("qbin") + 1) * _A23_BIN_CENTS).alias("bin_hi_cents"),
        F.round("exact_cents", 6).alias("exact_cents"),
        F.col("n").cast("bigint").alias("n"),
    )


_A24_NOW_US = 1_706_745_600_000_000  # dq5's fixed audit instant (2024-02-01 UTC)
_A24_HALFLIFE_DAYS = 7


@register(
    "a24_decayed_counts",
    f"""WITH e AS (
         SELECT event_type,
                CAST(({_A24_NOW_US} - epoch_us(CAST(ts AS TIMESTAMP)))
                     // 86400000000 AS BIGINT) AS age_days
         FROM events WHERE ts IS NOT NULL),
        w AS (
         SELECT event_type, age_days,
                CAST(1000000 // POWER(2, age_days // {_A24_HALFLIFE_DAYS}) AS BIGINT)
                    AS w_ppm
         FROM e WHERE age_days >= 0)
       SELECT event_type,
              COUNT(*) AS n_events,
              CAST(SUM(w_ppm) AS BIGINT) AS decayed_score_ppm,
              CAST(MIN(age_days) AS BIGINT) AS newest_age_days
       FROM w GROUP BY event_type""",
    tags=("agg", "decay", "trending"),
    doc="Exponentially time-decayed event counts (trending/popularity "
    "scoring): each event contributes weight 2^-(age//7d) — a halving "
    "per whole half-life — summed per type against the fixed dq5 audit "
    "instant. The weight is INTEGER arithmetic (1e6 >> halvings as an "
    "integer divide), deliberately NOT fractional pow(): cross-engine "
    "pow is not correctly-rounded and a last-ulp divergence would break "
    "the hash verdict — the same reason sm5/t16 quantize to ppm. "
    "Whole-interval decay also makes the score MERGEABLE: partial sums "
    "from any partitioning add exactly. One scan-side projection + one "
    "hash agg; future-dated rows (age < 0) are excluded in both engines",
)
def a24_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    age_days = F.floor((F.lit(_A24_NOW_US) - F.unix_micros("ts")) / F.lit(86_400_000_000)).cast(
        "bigint"
    )
    e = ev.select("event_type", age_days.alias("age_days")).where(F.col("age_days") >= 0)
    w_ppm = F.floor(
        F.lit(1_000_000) / F.pow(F.lit(2.0), F.floor(F.col("age_days") / _A24_HALFLIFE_DAYS))
    ).cast("bigint")
    return (
        e.select("event_type", w_ppm.alias("w_ppm"), "age_days")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("w_ppm").cast("bigint").alias("decayed_score_ppm"),
            F.min("age_days").cast("bigint").alias("newest_age_days"),
        )
    )


# ---------------------------------------------------------------------------
# a25: KMV / theta-sketch set operations — the sketch family HLL can't be:
# a k-minimum-values sample supports INTERSECTION and DIFFERENCE estimates
# (theta-sketch algebra), not just union cardinality
# ---------------------------------------------------------------------------

_A25_K = 64
_A25_SCALE = 1 << 44  # 44-bit hash space (11 md5 hex chars)
_SQL_A25_H = (
    "CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 11)) AS BIGINT)"
)


def _a25_hash(c):
    """44-bit md5-prefix hash — identical arithmetic in both engines, and
    small enough that (K-1)·2^44 stays in signed BIGINT (no decimals)."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 11), 16, 10).cast("bigint")


@register(
    "a25_kmv_theta_setops",
    f"""WITH flags AS (
          SELECT h,
                 MAX(CASE WHEN early THEN 1 ELSE 0 END) AS in_a,
                 MAX(CASE WHEN early THEN 0 ELSE 1 END) AS in_b
          FROM (SELECT DISTINCT {_SQL_A25_H} AS h,
                       year(o_orderdate) <= 1997 AS early
                FROM orders)
          GROUP BY h),
        ska AS (SELECT h FROM flags WHERE in_a = 1 ORDER BY h LIMIT {_A25_K}),
        skb AS (SELECT h FROM flags WHERE in_b = 1 ORDER BY h LIMIT {_A25_K}),
        sku AS (SELECT h, in_a, in_b FROM flags ORDER BY h LIMIT {_A25_K}),
        agg_a AS (SELECT COUNT(*) AS n, MAX(h) AS hk FROM ska),
        agg_b AS (SELECT COUNT(*) AS n, MAX(h) AS hk FROM skb),
        agg_u AS (SELECT COUNT(*) AS n, MAX(h) AS hk FROM sku),
        csub AS (
          SELECT CAST(SUM(s.in_a * s.in_b) AS BIGINT) AS c_int,
                 CAST(SUM(s.in_a * (1 - s.in_b)) AS BIGINT) AS c_diff
          FROM sku s, agg_u u WHERE s.h < u.hk),
        exacts AS (
          SELECT CAST(SUM(in_a) AS BIGINT) AS ea,
                 CAST(SUM(in_b) AS BIGINT) AS eb,
                 CAST(COUNT(*) AS BIGINT) AS eu,
                 CAST(SUM(in_a * in_b) AS BIGINT) AS ei,
                 CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS ed
          FROM flags),
        one AS (SELECT * FROM csub, exacts)
        SELECT measure, est, exact FROM (
          SELECT 'distinct_a' AS measure,
                 CASE WHEN a.n < {_A25_K} THEN ea
                      ELSE ({_A25_K - 1} * {_A25_SCALE}) // a.hk END AS est,
                 ea AS exact FROM one, agg_a a
          UNION ALL
          SELECT 'distinct_b',
                 CASE WHEN b.n < {_A25_K} THEN eb
                      ELSE ({_A25_K - 1} * {_A25_SCALE}) // b.hk END, eb
          FROM one, agg_b b
          UNION ALL
          SELECT 'union',
                 CASE WHEN u.n < {_A25_K} THEN eu
                      ELSE ({_A25_K - 1} * {_A25_SCALE}) // u.hk END, eu
          FROM one, agg_u u
          UNION ALL
          SELECT 'intersection',
                 CASE WHEN u.n < {_A25_K} THEN ei
                      ELSE (c_int * {_A25_SCALE}) // u.hk END, ei
          FROM one, agg_u u
          UNION ALL
          SELECT 'a_minus_b',
                 CASE WHEN u.n < {_A25_K} THEN ed
                      ELSE (c_diff * {_A25_SCALE}) // u.hk END, ed
          FROM one, agg_u u)""",
    tags=("sketch", "kmv", "theta", "setops"),
    doc="KMV / theta-sketch set-operation estimates over two customer "
    "cohorts (ordered 1995-97 vs 1998-2001) — the sketch algebra HLL "
    "cannot do: a k-minimum-values sample (k=64 smallest 44-bit md5 "
    "hashes) estimates UNION, INTERSECTION, and DIFFERENCE cardinality "
    "from bounded state (Dasu/Beyer KMV; Apache DataSketches theta). "
    "Estimator, identical in both engines: theta = k-th smallest union "
    "hash; est(subset) = |{{sample < theta}} ∩ subset| · 2^44 DIV theta "
    "(pure BIGINT — 63·2^44 < 2^51, no decimals, no floats anywhere); "
    "sketches smaller than k fall back to their exact count. Output = "
    "(measure, est, exact) so the artifact itself shows sketch error. "
    "Plan: one distinct-agg on the 44-bit key (map-side combinable), "
    "then every sketch is a distributed top-k (TakeOrdered — partial "
    "per-partition top-64, driver merges 64-row sides; the exact shape "
    "DataSketches-on-Spark uses), and ALL downstream joins are between "
    "≤64-row bounded sides. At 100 TB the only data-sized stage is the "
    "first distinct; k is the accuracy dial (RSE ~ 1/sqrt(k-2)).",
)
def a25_kmv_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    K, SCALE = _A25_K, _A25_SCALE
    orders = load_table(spark, sf_dir, "orders").select(
        _a25_hash(F.col("o_custkey")).alias("h"),
        (F.year("o_orderdate") <= 1997).alias("early"),
    )
    # cached: the five sketch/exact branches below each re-read this
    # frame — without the cache the corpus-sized distinct recomputes per
    # branch (measured 18.4x at the 100x probe; the cache is
    # |distinct keys| rows, the same working set the distinct itself
    # materializes)
    flags = (
        orders.distinct()
        .groupBy("h")
        .agg(
            F.max(F.when(F.col("early"), 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("early"), 0).otherwise(1)).alias("in_b"),
        )
        .cache()
    )
    ska = flags.where(F.col("in_a") == 1).select("h").orderBy("h").limit(K)
    skb = flags.where(F.col("in_b") == 1).select("h").orderBy("h").limit(K)
    sku = flags.orderBy("h").limit(K)
    agg_a = ska.agg(F.count(F.lit(1)).alias("na"), F.max("h").alias("hka"))
    agg_b = skb.agg(F.count(F.lit(1)).alias("nb"), F.max("h").alias("hkb"))
    agg_u = sku.agg(F.count(F.lit(1)).alias("nu"), F.max("h").alias("hku"))
    csub = (
        sku.crossJoin(F.broadcast(agg_u))
        .where(F.col("h") < F.col("hku"))
        .agg(
            F.sum(F.col("in_a") * F.col("in_b")).alias("c_int"),
            F.sum(F.col("in_a") * (1 - F.col("in_b"))).alias("c_diff"),
        )
    )
    exacts = flags.agg(
        F.sum("in_a").alias("ea"),
        F.sum("in_b").alias("eb"),
        F.count(F.lit(1)).alias("eu"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("ei"),
        F.sum(F.col("in_a") * (1 - F.col("in_b"))).alias("ed"),
    )
    one = (
        agg_a.crossJoin(F.broadcast(agg_b))
        .crossJoin(F.broadcast(agg_u))
        .crossJoin(F.broadcast(csub))
        .crossJoin(F.broadcast(exacts))
    )

    def est(n, hk, c, exact):
        return F.when(F.col(n) < K, F.col(exact)).otherwise(
            F.expr(f"({c} * {SCALE}) div {hk}")
        )

    measures = F.array(
        F.struct(
            F.lit("distinct_a").alias("measure"),
            est("na", "hka", K - 1, "ea").alias("est"),
            F.col("ea").cast("long").alias("exact"),
        ),
        F.struct(
            F.lit("distinct_b").alias("measure"),
            est("nb", "hkb", K - 1, "eb").alias("est"),
            F.col("eb").cast("long").alias("exact"),
        ),
        F.struct(
            F.lit("union").alias("measure"),
            est("nu", "hku", K - 1, "eu").alias("est"),
            F.col("eu").cast("long").alias("exact"),
        ),
        F.struct(
            F.lit("intersection").alias("measure"),
            est("nu", "hku", "c_int", "ei").alias("est"),
            F.col("ei").cast("long").alias("exact"),
        ),
        F.struct(
            F.lit("a_minus_b").alias("measure"),
            est("nu", "hku", "c_diff", "ed").alias("est"),
            F.col("ed").cast("long").alias("exact"),
        ),
    )
    return one.select(F.explode(measures).alias("m")).select("m.*")
