"""LIVE Postgres round-trip for the jar-less environment (VERDICT r3 item 6).

The sandbox has Postgres server binaries but no JDBC driver jar and no
python Postgres driver, so ``read_jdbc``/``write_jdbc`` stay
transport-injection tested — but the ``pgcopy`` Python DataSource speaks
to a REAL database through psql COPY. These tests boot an actual Postgres
(initdb + pg_ctl as an unprivileged user, unix socket only) and drive
write → read → validate end-to-end: the S2/S4/K3/V3 semantics against a
live server. Skipped automatically where the binaries are unavailable.
"""

from __future__ import annotations

import datetime
import shutil
import subprocess
import tempfile

import pytest

from etl_pipeline_telecom_spark.sources.pgcopy import (
    PostgresCopyDataSource,
    pg_count,
    pg_scalar,
)

_PORT = 54329


def _su_nobody(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "-s", "/bin/sh", "nobody", "-c", cmd], capture_output=True, text=True
    )


@pytest.fixture(scope="module")
def pg(spark):
    if not (shutil.which("psql") and shutil.which("initdb") and shutil.which("pg_ctl")):
        pytest.skip("no Postgres binaries in this environment")
    base = tempfile.mkdtemp(prefix="pgcopy_live_")
    subprocess.run(["chown", "nobody", base], check=True)
    r = _su_nobody(f"initdb -D {base}/data -A trust -U spark")
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"initdb failed: {r.stderr[-200:]}")
    r = _su_nobody(
        f"pg_ctl -D {base}/data -l {base}/log -w "
        f"-o '-k {base} -p {_PORT} -c listen_addresses=' start"
    )
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"pg_ctl start failed: {r.stderr[-200:]}")
    opts = {"host": base, "port": str(_PORT), "user": "spark", "dbname": "postgres"}
    spark.dataSource.register(PostgresCopyDataSource)
    yield opts
    _su_nobody(f"pg_ctl -D {base}/data -m immediate stop")
    shutil.rmtree(base, ignore_errors=True)


_SCHEMA = (
    "event_id bigint, user_id bigint, value double, note string, ok boolean, ts timestamp"
)


def _writer(df, opts, mode="append"):
    w = df.write.format("pgcopy").mode(mode).option("table", "events_live")
    for k, v in opts.items():
        w = w.option(k, v)
    return w


def _reader(spark, opts, **extra):
    r = (
        spark.read.format("pgcopy")
        .option("table", "events_live")
        .option("tableSchema", _SCHEMA)
    )
    for k, v in {**opts, **extra}.items():
        r = r.option(k, str(v))
    return r


@pytest.fixture(scope="module")
def seeded(spark, pg):
    """Create the table and push a tricky 200-row frame through the K3/K4
    live sink (COPY FROM STDIN per partition, batched by construction)."""
    pg_scalar(
        pg,
        "CREATE TABLE IF NOT EXISTS events_live ("
        "event_id bigint, user_id bigint, value double precision, "
        "note text, ok boolean, ts timestamp)",
    )
    rows = []
    for i in range(200):
        note = {
            0: None,
            1: "tab\there",
            2: "line\nbreak",
            3: "back\\slash",
            4: "",
        }.get(i % 5, f"note {i}")
        rows.append(
            (
                i,
                i % 7,
                None if i % 11 == 0 else i * 1.5,
                note,
                i % 2 == 0,
                datetime.datetime(2026, 1, 1) + datetime.timedelta(minutes=i),
            )
        )
    df = spark.createDataFrame(rows, schema=_SCHEMA).repartition(4)
    _writer(df, pg, mode="overwrite").save()
    return rows


def test_live_write_read_roundtrip(spark, pg, seeded):
    """K3 (DDL'd table) + K4 (bulk batched insert) + S2 (full scan) against
    a real server — values, NULLs, escapes, timestamps all survive."""
    got = _reader(spark, pg).load().collect()
    assert len(got) == len(seeded)
    assert {tuple(r) for r in got} == set(seeded)


def test_live_count_pushdown_and_v3_reconciliation(spark, pg, seeded):
    """S4: COUNT(*) runs in the database (no rows shipped); V3: the local
    frame reconciles against the live remote count."""
    from etl_pipeline_telecom_spark.validation import expect_counts_match, run_expectations

    n_remote = pg_count(pg, "events_live")
    assert n_remote == len(seeded)
    local = _reader(spark, pg).load()
    report = run_expectations(local, [expect_counts_match(n_remote)]).collect()
    assert all(r["passed"] for r in report)


def test_live_partitioned_read_covers_all_rows(spark, pg, seeded):
    """jdbc-style range partitioning: 4 psql COPYs over disjoint event_id
    ranges union to exactly the full table (open-ended first/last range)."""
    df = _reader(
        spark, pg,
        partitionColumn="event_id", numPartitions=4, lowerBound=50, upperBound=150,
    ).load()
    assert df.rdd.getNumPartitions() == 4
    assert {r["event_id"] for r in df.collect()} == set(range(200))


def test_live_overwrite_truncates(spark, pg, seeded):
    df = spark.createDataFrame(
        [(1000, 1, 2.0, "solo", True, datetime.datetime(2026, 2, 1))], schema=_SCHEMA
    )
    _writer(df, pg, mode="overwrite").save()
    assert pg_count(pg, "events_live") == 1
    # restore for other tests (module fixtures run once; keep state sane)
    rows = spark.createDataFrame(seeded, schema=_SCHEMA)
    _writer(rows, pg, mode="overwrite").save()
    assert pg_count(pg, "events_live") == len(seeded)


def test_live_fallback_chain_prefers_live_then_local(spark, pg, seeded, sf_dir):
    """S3 with a REAL failing remote: a pgcopy read against a dead socket
    raises inside the chain and falls back to the parquet fixture."""
    from etl_pipeline_telecom_spark.sources.readers import load_table, load_with_fallback

    dead = dict(pg, host="/nonexistent-socket-dir")
    df = load_with_fallback(
        [
            lambda: _reader(spark, dead).load().filter("event_id >= 0").localCheckpoint(),
            lambda: load_table(spark, sf_dir, "events"),
        ]
    )
    assert df.count() > 0
