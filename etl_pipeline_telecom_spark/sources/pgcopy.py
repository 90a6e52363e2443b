"""Live Postgres source/sink via the COPY protocol (Spark 4 Python DataSource).

The reference's remote table lives in Postgres (read via PostgREST —
``etl_analysis.ipynb cell4:6-10`` — and written with batched REST inserts,
``scripts/load.py:95-230``). The engine-native replacement is Spark's JDBC
source (``readers.read_jdbc`` / ``writers.write_jdbc``), but an
environment with no JDBC driver jar on the classpath cannot use it — this
module is the LIVE path for such environments: a Spark 4
``pyspark.sql.datasource`` implementation that speaks to a real Postgres
through ``psql``'s COPY streams.

Why COPY and not row-at-a-time SQL: COPY is Postgres's bulk path (one
process round-trip per partition, streaming text protocol, server-side
parsing) — the same reason ``write_jdbc`` batches inserts. Each Spark
partition maps to one ``COPY (SELECT ... WHERE <range>) TO STDOUT`` /
``COPY ... FROM STDIN``, so reads parallelize by a numeric partition
column exactly like ``spark.read.jdbc(partitionColumn=...)`` and writes
stream per-partition without driver materialization.

Scale notes: every executor shells one ``psql`` per partition — the
database, not Spark, is the bottleneck at high fan-in, which is the same
truth JDBC has; keep ``numPartitions`` matched to what the database can
serve. Requires ``psql`` on executors (true in local mode; a cluster
deployment would ship it or use the JDBC jar instead).

Usage::

    spark.dataSource.register(PostgresCopyDataSource)
    df = (spark.read.format("pgcopy")
          .option("host", "/tmp/pg").option("port", "5432")
          .option("user", "spark").option("dbname", "postgres")
          .option("table", "events")
          .option("tableSchema", "event_id bigint, value double")
          .load())
    df.write.format("pgcopy").mode("append").option(...).save()
"""

from __future__ import annotations

import subprocess
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

_PSQL_BASE = ("psql", "-X", "-q", "-v", "ON_ERROR_STOP=1")


def _conn_args(opts: dict) -> list[str]:
    args = []
    for opt, flag in (("host", "-h"), ("port", "-p"), ("user", "-U"), ("dbname", "-d")):
        if opts.get(opt):
            args += [flag, str(opts[opt])]
    return args


def _run_psql(opts: dict, sql: str, *, input_text: str | None = None) -> str:
    proc = subprocess.run(
        [*_PSQL_BASE, *_conn_args(opts), "-c", sql],
        input=input_text,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"psql failed ({sql[:120]}...): {proc.stderr.strip()}")
    return proc.stdout


def pg_scalar(opts: dict, sql: str) -> str:
    """One unaligned scalar (psql -tA) — the S4 count-only remote scan."""
    proc = subprocess.run(
        [*_PSQL_BASE, *_conn_args(opts), "-tA", "-c", sql],
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"psql failed: {proc.stderr.strip()}")
    return proc.stdout.strip()


def pg_count(opts: dict, table: str) -> int:
    """Count-only remote scan (S4 / ``validate.py:26-44``) — the live twin
    of ``readers.jdbc_count``; pushes COUNT(*) to the database."""
    return int(pg_scalar(opts, f"SELECT count(*) FROM {table}"))


# --- COPY text-format escaping (COPY TO emits \\ \n \r \t and \N) -------


def _unescape(field: str) -> str:
    out = []
    i = 0
    while i < len(field):
        c = field[i]
        if c == "\\" and i + 1 < len(field):
            nxt = field[i + 1]
            out.append({"\\": "\\", "n": "\n", "r": "\r", "t": "\t"}.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _escape(value: str) -> str:
    return (
        value.replace("\\", "\\\\")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def _parser(dt):
    """Text → python value for one Spark type (COPY text output formats)."""
    import datetime as _dt
    import decimal as _dec

    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return int
    if isinstance(dt, (FloatType, DoubleType)):
        return float
    if isinstance(dt, DecimalType):
        return _dec.Decimal
    if isinstance(dt, BooleanType):
        return lambda s: s == "t"
    if isinstance(dt, TimestampType):
        return lambda s: _dt.datetime.fromisoformat(s)
    if isinstance(dt, DateType):
        return lambda s: _dt.date.fromisoformat(s)
    if isinstance(dt, StringType):
        return _unescape
    raise ValueError(f"pgcopy: unsupported column type {dt}")


def _formatter(dt):
    """Python value → COPY text field."""
    if isinstance(dt, BooleanType):
        return lambda v: "t" if v else "f"
    if isinstance(dt, StringType):
        return _escape
    return str  # numerics, decimals, timestamps/dates (ISO str() is valid)


@dataclass
class _RangePartition(InputPartition):
    predicate: str | None


class PgCopyReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.options = options
        self.table = options.get("table") or f"({options['query']}) q"

    def partitions(self) -> list[InputPartition]:
        col = self.options.get("partitioncolumn")
        if not col:
            return [_RangePartition(None)]
        n = int(self.options["numpartitions"])
        lo = int(self.options["lowerbound"])
        hi = int(self.options["upperbound"])
        # same stride semantics as spark.read.jdbc: n half-open ranges with
        # open-ended first/last so no value outside [lo, hi) is lost
        step = max((hi - lo) // n, 1)
        bounds = [lo + i * step for i in range(1, n)]
        preds, prev = [], None
        for b in bounds + [None]:
            lo_p = f"{col} >= {prev}" if prev is not None else None
            hi_p = f"{col} < {b}" if b is not None else None
            preds.append(" AND ".join(p for p in (lo_p, hi_p) if p) or "TRUE")
            prev = b
        return [_RangePartition(p) for p in preds]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        cols = ", ".join(f.name for f in self.schema.fields)
        where = f" WHERE {partition.predicate}" if partition.predicate else ""
        sql = f"COPY (SELECT {cols} FROM {self.table}{where}) TO STDOUT"
        out = _run_psql(self.options, sql)
        parsers = [_parser(f.dataType) for f in self.schema.fields]
        for line in out.split("\n"):
            if not line:
                continue
            fields = line.split("\t")
            yield tuple(
                None if raw == "\\N" else parse(raw)
                for raw, parse in zip(fields, parsers)
            )


@dataclass
class _CopyCommit(WriterCommitMessage):
    rows: int


class PgCopyWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.options = options

    def write(self, rows: Iterator) -> _CopyCommit:
        table = self.options["table"]
        cols = ", ".join(f.name for f in self.schema.fields)
        fmts = [_formatter(f.dataType) for f in self.schema.fields]
        lines = []
        for row in rows:
            lines.append(
                "\t".join(
                    "\\N" if v is None else fmt(v) for v, fmt in zip(row, fmts)
                )
            )
        if lines:
            _run_psql(
                self.options,
                f"COPY {table} ({cols}) FROM STDIN",
                input_text="\n".join(lines) + "\n",
            )
        return _CopyCommit(rows=len(lines))

    def commit(self, messages) -> None:  # COPY is per-partition atomic; no 2PC
        pass

    def abort(self, messages) -> None:
        pass


class PostgresCopyDataSource(DataSource):
    """``format("pgcopy")`` — live Postgres scan/sink through psql COPY.

    Options: ``host``/``port``/``user``/``dbname`` (connection), ``table``
    or ``query`` (source), ``tableSchema`` (DDL string — REQUIRED: the
    reader will not guess types, matching S1's explicit-schema rule), and
    optional ``partitionColumn``/``numPartitions``/``lowerBound``/
    ``upperBound`` for parallel range reads (jdbc-style).
    """

    @classmethod
    def name(cls) -> str:
        return "pgcopy"

    def schema(self) -> str:
        try:
            return self.options["tableschema"]
        except KeyError:
            raise ValueError(
                "pgcopy requires a tableSchema option (explicit DDL schema)"
            ) from None

    def reader(self, schema: StructType) -> PgCopyReader:
        return PgCopyReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> PgCopyWriter:
        if overwrite:
            # driver-side, once, before executor COPYs (mode("overwrite"))
            _run_psql(dict(self.options), f"TRUNCATE TABLE {self.options['table']}")
        return PgCopyWriter(schema, dict(self.options))
