"""Aggregation operators (SURVEY.md §2.5: A1–A13).

All of these compile to a single Catalyst hash aggregate (partial→final
split automatic, map-side combine for free), so they scale linearly with
input and shuffle only the group keys. The two non-obvious ones:

- ``pct_of_total`` (A6) needs a grand total next to per-group counts. An
  unpartitioned window (``sum().over(Window.partitionBy())``) funnels all
  rows through ONE task — fine on the already-aggregated (small) side,
  catastrophic if applied pre-aggregation. We aggregate first, then
  window over the tiny grouped result.
- ``histogram`` (A10) computes fixed-width bin ids with a min/max
  pre-pass; the binning itself is one narrow projection + hash agg.

Reference parity: the notebook's eager pandas aggregates
(``etl_analysis.ipynb cell8``) and ``validate.py`` checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_avg(df: DataFrame, key: str, value: str, *, alias: str = "avg_value", ndigits: int = 3) -> DataFrame:
    """A4 — group-by mean, rounded (``etl_analysis.ipynb cell8:10-14``).

    Spark groupBy keeps NULL keys, matching ``groupby(dropna=False)``.
    """
    return df.groupBy(key).agg(F.round(F.avg(value), ndigits).alias(alias))


def value_counts(df: DataFrame, col: str, *, count_alias: str = "cnt") -> DataFrame:
    """A5 — frequency table, descending (``etl_analysis.ipynb cell8:16-19``)."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias(count_alias)).orderBy(F.desc(count_alias), col)


def pct_of_total(df: DataFrame, col: str, *, ndigits: int = 2, count_alias: str = "cnt") -> DataFrame:
    """A6 — value counts plus percent-of-total (``etl_analysis.ipynb cell8:20-24``).

    The unpartitioned window runs over the post-aggregation result (one
    row per distinct value), so the single-task stage touches only a
    handful of rows regardless of input size.
    """
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias(count_alias))
    total = F.sum(count_alias).over(Window.partitionBy())
    return counts.withColumn("pct", F.round(F.col(count_alias) * 100.0 / total, ndigits)).orderBy(
        F.desc(count_alias), col
    )


def pivot_counts(df: DataFrame, row_key: str, pivot_key: str, pivot_values: Sequence) -> DataFrame:
    """A7 — 2-D contingency counts (``pd.crosstab``, ``etl_analysis.ipynb cell8:26-42``).

    Explicit ``pivot_values`` keeps the plan single-pass (no extra distinct
    job to discover pivot columns) and the output schema stable.
    """
    out = df.groupBy(row_key).pivot(pivot_key, list(pivot_values)).count()
    return out.na.fill(0, subset=[c for c in out.columns if c != row_key])


def churn_rate_over_pivot(
    df: DataFrame,
    row_key: str,
    flag_col: str,
    *,
    ndigits: int = 3,
) -> DataFrame:
    """A7+A8 — pivot on a 0/1 flag, then derive total + rate columns.

    Parity: ``pivot_churn_tenure.csv`` derivation (``etl_analysis.ipynb
    cell8:26-42``). Expressed as conditional aggregation (equivalent to the
    pivot but one hash agg, no pivot machinery).
    """
    churned = F.sum(F.when(F.col(flag_col) == 1, 1).otherwise(0))
    not_churned = F.sum(F.when(F.col(flag_col) == 0, 1).otherwise(0))
    return (
        df.groupBy(row_key)
        .agg(not_churned.alias("not_churned_count"), churned.alias("churned_count"))
        .withColumn("total", F.col("churned_count") + F.col("not_churned_count"))
        .withColumn("churn_rate_pct", F.round(F.col("churned_count") * 100.0 / F.col("total"), ndigits))
    )


def histogram(df: DataFrame, col: str, nbins: int = 40) -> DataFrame:
    """A10 — fixed-bin-count histogram → (bin_id, bin_start, bin_end, count).

    Two jobs: a min/max pre-pass (tiny), then one narrow projection + hash
    agg — no sort, no ``rdd.histogram`` (stays in Tungsten). The top edge
    is clamped into the last bin, matching matplotlib's inclusive-right
    final bin (``etl_analysis.ipynb cell10:15-17``).
    """
    lo, hi = df.agg(F.min(col), F.max(col)).collect()[0]
    width = (hi - lo) / nbins if hi > lo else 1.0
    bin_id = F.least(F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(nbins - 1))
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(bin_id.cast("int").alias("bin_id"))
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn("bin_start", F.round(F.lit(lo) + F.col("bin_id") * F.lit(width), 6))
        .withColumn("bin_end", F.round(F.lit(lo) + (F.col("bin_id") + 1) * F.lit(width), 6))
        .select("bin_id", "bin_start", "bin_end", "count")
        .orderBy("bin_id")
    )


def null_counts(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A11 — per-column NULL counts in one pass (``scripts/validate.py:70-73``)."""
    return df.agg(*[F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}_nulls") for c in cols])


def domain_values(df: DataFrame, col: str) -> DataFrame:
    """A12 — distinct value set as rows (``scripts/validate.py:94-118``).

    Returned as rows (not ``collect_set``) so the oracle comparison is a
    plain order-insensitive row compare.
    """
    return df.select(col).distinct()


def exact_median(df: DataFrame, col: str, *, alias: str = "median_value") -> DataFrame:
    """A13 — exact interpolating median (``scripts/transform.py:25``).

    Exact median sorts within the aggregation — fine up to ~10⁹ rows per
    group; at 100 TB switch call sites to ``percentile_approx`` (see
    ``median_fill(approx=True)``).
    """
    return df.agg(F.median(F.col(col)).alias(alias))
