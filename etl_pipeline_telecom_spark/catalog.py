"""Query catalog: every implemented operator, with its DuckDB oracle SQL.

The driver contract (``__spark_entry__.py``) needs ``queries()`` →
callables and ``oracle_sql()`` → equivalent ANSI SQL. This module is the
single registry both are generated from; plan modules under ``plans/``
call :func:`register` at import time.

Oracle-hash discipline (the driver compares order-insensitive value
hashes, so floating-point results must be bit-identical between Spark and
DuckDB):

- **Sums of doubles are NOT reproducible across engines** (different
  accumulation order). Monetary columns are summed as ``DECIMAL(18,2)``
  (exact in both engines) and the final value cast to double.
- **Averages**: exact decimal sum ÷ count, divided as doubles — the same
  two operands in both engines → identical IEEE result — then rounded.
- Every computed column is aliased identically in the Spark plan and the
  SQL (driver hashes sort columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None → driver's weaker rows-only check
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None, *, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def dec_sum(col: Column | str, alias: str, *, scale: str = "decimal(18,2)") -> Column:
    """Oracle-safe sum: exact decimal accumulation, final cast to double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double").alias(alias)


def dec_avg(col: Column | str, alias: str, *, ndigits: int = 6, scale: str = "decimal(18,2)") -> Column:
    """Oracle-safe average: exact decimal sum ÷ count as one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(scale)).cast("double") / F.count(F.lit(1)), ndigits).alias(alias)


def sql_dec_sum(expr: str, alias: str, *, scale: str = "DECIMAL(18,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {scale})) AS DOUBLE) AS {alias}"


def sql_dec_avg(expr: str, alias: str, *, ndigits: int = 6, scale: str = "DECIMAL(18,2)") -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS {scale})) AS DOUBLE) / COUNT(*), {ndigits}) AS {alias}"


def _load_all_plans() -> None:
    """Import every plan module (each registers its queries on import)."""
    from .plans import (  # noqa: F401
        parity_aggregates,
        parity_transform,
        joins,
        windows,
        setops,
        text,
        dedup,
        similarity,
        eventtime,
        streaming,
        multimodal,
        quality,
        sketches,
        semistructured,
        pipeline,
        reshape,
    )


def queries() -> dict[str, QueryFn]:
    _load_all_plans()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all_plans()
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}


def specs() -> dict[str, QuerySpec]:
    _load_all_plans()
    return dict(REGISTRY)
