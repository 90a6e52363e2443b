"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``etl_pipeline_telecom_spark.catalog`` — the engine's query
registry. Every operator from SURVEY.md §2 (plus the §7 extensions) is
registered there with its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_telecom_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The A4 group-avg analog of the reference's ``avg_monthly_by_contract``
    (etl_analysis.ipynb cell8:10-14): avg extended price by return flag.
    """
    return catalog.queries()["a4_group_avg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted → rows-only check)."""
    return catalog.oracle_sql()
