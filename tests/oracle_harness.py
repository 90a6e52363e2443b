"""Local mimic of the driver's DuckDB oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet fixtures, then compares row count, column names, and an
order-insensitive value multiset. Exact equality is required — the driver
hashes values, so "close" floats are failures here too.
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def _key(row):
    return tuple((x is None, str(type(x)), x) for x in row)


def _canon_spark_type(t: str) -> str:
    """Spark dtype string → canonical kind for cross-engine type parity."""
    t = t.lower()
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "i"
    if t in ("float", "double"):
        return "f"
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith("array") or t.startswith("map") or t.startswith("struct"):
        return "nested"
    if t in ("string", "varchar"):
        return "str"
    return t


def _canon_duck_type(t: str) -> str:
    """DuckDB logical type → canonical kind.

    HUGEINT and DECIMAL are kept distinct on purpose: the driver's value
    hash goes through Arrow, where HUGEINT→float64 and DECIMAL→decimal128
    diverge from Spark's int64/float64 even when the python cell values
    compare equal (round-1 a8/a11 failures)."""
    t = str(t).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER"):
        return "i"
    if t in ("FLOAT", "DOUBLE"):
        return "f"
    if t == "HUGEINT" or t == "UBIGINT":
        return "hugeint"
    if t.startswith("DECIMAL"):
        return "decimal"
    if "[]" in t or t.startswith("MAP") or t.startswith("STRUCT") or t.startswith("LIST"):
        return "nested"
    if t == "VARCHAR":
        return "str"
    return t.lower()


def compare(spark, sf_dir: str, fn, sql: str) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_types = {c: _canon_spark_type(t) for c, t in sdf.dtypes}
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_types = {c: _canon_duck_type(t) for c, t in zip(rel.columns, rel.types)}
    duck_rows = rel.fetchall()
    con.close()

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    type_diffs = {
        c: (spark_types[c], duck_types[c])
        for c in spark_cols
        if spark_types[c] != duck_types[c]
    }
    if type_diffs:
        return False, f"column TYPES differ (driver hash is type-sensitive): {type_diffs}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    duck_order = {c: i for i, c in enumerate(duck_cols)}
    s_norm = sorted(
        (tuple(_norm(r[i]) for i in order) for r in spark_rows), key=_key
    )
    d_norm = sorted(
        (tuple(_norm(r[duck_order[spark_cols[i]]]) for i in order) for r in duck_rows), key=_key
    )
    for idx, (a, b) in enumerate(zip(s_norm, d_norm)):
        if a != b:
            return False, f"first value mismatch at sorted-row {idx}: spark={a!r} duck={b!r}"
    return True, "ok"


def main() -> int:
    """CLI: run every oracle-backed catalog query against DuckDB.

    Usage: python -m tests.oracle_harness [sf_dir] [name_substring...]
    """
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from etl_pipeline_telecom_spark import catalog
    from etl_pipeline_telecom_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    filters = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark("oracle-harness")
    fails = 0
    for name, spec in sorted(catalog.specs().items()):
        if filters and not any(f in name for f in filters):
            continue
        if spec.sql is None:
            print(f"ROWS-ONLY {name}: {spec.fn(spark, sf_dir).count()} rows")
            continue
        ok, msg = compare(spark, sf_dir, spec.fn, spec.sql)
        print(("PASS " if ok else "FAIL ") + name + ("" if ok else f" :: {msg}"))
        fails += 0 if ok else 1
    print(f"FAILS: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
