"""Crafted-edge pins for window FRAME semantics (VERDICT r5 item 1).

Random fixtures order every w-family window by a key whose tiebreak
column is unique, so ROWS- vs RANGE-frame divergence is unreachable:
Spark's DEFAULT frame for an ``orderBy``-only window is RANGE UNBOUNDED
PRECEDING → CURRENT ROW, which includes ALL PEERS of the current order
key — identical to the ROWS frame exactly when order keys are unique.
The one bug class r5 proved random data cannot catch (session touching
bounds, as-of same-µs ties) lives at duplicate keys, so these tests
craft them directly:

- w3: three orders with IDENTICAL (o_orderdate, o_orderkey) and equal
  prices. The registered ROWS frame yields running sums {100,200,300}
  in any processing order; a RANGE default would yield {300,300,300}.
  Equal prices make the ROWS multiset processing-order-invariant, so
  the assertion is deterministic cross-engine.
- w2: duplicate (ts, event_id) with equal values — lag deltas must be
  the same multiset in both engines (0.0 for the second peer).
- w4: equal balances within a nation — dense_rank shares the rank and
  does not skip.
- w8: duplicate (p_retailprice, p_partkey) rows — percent_rank uses
  rank() semantics (peers share), cume_dist counts peers inclusively;
  both pinned by hand-computed values.
- w9: a tie group straddling an ntile boundary — ntile splits peers
  positionally, so the per-tile aggregate (count/min/max) is the
  deterministic observable.

Every pin ALSO round-trips through ``oracle_harness.compare`` on the
crafted parquet — the same hash-style comparison the driver runs — so a
frame regression fails both against the hand answer and the oracle.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from etl_pipeline_telecom_spark import catalog

from .oracle_harness import compare


def _write(tmp_path, name: str, table: pa.Table) -> str:
    d = str(tmp_path)
    pq.write_table(table, os.path.join(d, f"{name}.parquet"))
    return d


def _spec(name: str):
    return catalog.specs()[name]


def _orders(rows) -> pa.Table:
    import datetime as dt  # noqa: F401

    return pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array([r[5] for r in rows], pa.string()),
        }
    )


def test_w3_rows_frame_at_duplicate_order_keys(spark, tmp_path):
    import datetime as dt

    day = dt.datetime(2026, 5, 1)
    rows = [
        # customer 1: THREE rows with the SAME full order key (date, orderkey)
        # and equal prices — ROWS gives {100, 200, 300}; RANGE (the default
        # frame if .rowsBetween were dropped) treats them as one peer group
        # and gives {300, 300, 300}
        (7, 1, "O", 100.0, day, "1-URGENT"),
        (7, 1, "O", 100.0, day, "1-URGENT"),
        (7, 1, "O", 100.0, day, "1-URGENT"),
        # customer 2: duplicate DATE, distinct orderkey tiebreak — the
        # total-order path random fixtures do exercise; sanity anchor
        (1, 2, "O", 10.0, day, "2-HIGH"),
        (2, 2, "O", 20.0, day, "2-HIGH"),
    ]
    d = _write(tmp_path, "orders", _orders(rows))
    spec = _spec("w3_running_sum")
    got = sorted(
        (r["o_custkey"], r["running_spend"]) for r in spec.fn(spark, d).collect()
    )
    assert got == [
        (1, 100.0), (1, 200.0), (1, 300.0),   # ROWS, not RANGE
        (2, 10.0), (2, 30.0),
    ]
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, msg


def test_w2_lag_delta_at_duplicate_order_keys(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2026, 5, 1, 12, 0, 0)
    rows = [
        # user 1: two events at the SAME (ts, event_id) with equal values —
        # whichever peer goes first, the delta multiset is {None, 0.0}
        (5, t0, 1, "click", 2.5, "{}"),
        (5, t0, 1, "click", 2.5, "{}"),
        # user 2: normal strictly-ordered pair
        (6, t0, 2, "view", 1.0, "{}"),
        (7, t0 + dt.timedelta(seconds=1), 2, "view", 4.0, "{}"),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    d = _write(tmp_path, "events", table)
    spec = _spec("w2_lag_delta")
    got = sorted(
        ((r["user_id"], r["delta"]) for r in spec.fn(spark, d).collect()),
        key=lambda t: (t[0], t[1] is not None, t[1] or 0.0),
    )
    assert got == [(1, None), (1, 0.0), (2, None), (2, 3.0)]
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, msg


def test_w4_dense_rank_shares_at_equal_balances(spark, tmp_path):
    rows = [
        # nation 1: balances 900, 500, 500, 100 → dense ranks 1, 2, 2, 3
        (11, 1, 900.0),
        (12, 1, 500.0),
        (13, 1, 500.0),
        (14, 1, 100.0),
    ]
    table = pa.table(
        {
            "s_suppkey": pa.array([r[0] for r in rows], pa.int64()),
            "s_name": pa.array([f"s{r[0]}" for r in rows], pa.string()),
            "s_nationkey": pa.array([r[1] for r in rows], pa.int32()),
            "s_acctbal": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    d = _write(tmp_path, "supplier", table)
    spec = _spec("w4_dense_rank")
    got = {(r["s_suppkey"], r["bal_rank"]) for r in spec.fn(spark, d).collect()}
    assert got == {(11, 1), (12, 2), (13, 2), (14, 3)}
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, msg


def test_w8_pct_rank_cume_dist_at_duplicate_keys(spark, tmp_path):
    rows = [
        # two rows with the SAME (price, partkey) — true peers under the
        # full order key; then a distinct third and fourth
        (1, 5.0),
        (1, 5.0),
        (2, 5.0),
        (3, 7.0),
    ]
    table = pa.table(
        {
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "p_name": pa.array([f"p{r[0]}" for r in rows], pa.string()),
            "p_brand": pa.array(["B"] * len(rows), pa.string()),
            "p_type": pa.array(["T"] * len(rows), pa.string()),
            "p_size": pa.array([1] * len(rows), pa.int32()),
            "p_retailprice": pa.array([r[1] for r in rows], pa.float64()),
        }
    )
    d = _write(tmp_path, "part", table)
    spec = _spec("w8_pct_rank_cume")
    got = sorted(
        (r["p_partkey"], r["price_pct_rank"], r["price_cume_dist"])
        for r in spec.fn(spark, d).collect()
    )
    # order: (5,1) (5,1) | (5,2) | (7,3); n=4
    # percent_rank = (rank-1)/(n-1): ranks 1,1,3,4 → 0, 0, 2/3, 1
    # cume_dist = peers_at_or_before/n: 2/4, 2/4, 3/4, 4/4
    assert got == [
        (1, 0.0, 0.5),
        (1, 0.0, 0.5),
        (2, round(2 / 3, 9), 0.75),
        (3, 1.0, 1.0),
    ]
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, msg


def test_w9_ntile_tie_straddling_bucket_boundary(spark, tmp_path):
    rows = [
        # segment A: balances DESC are 9, 7, 7, 7, 3 → ntile(4) sizes
        # [2,1,1,1]; the three tied 7s straddle tiles 1, 2 and 3 — ntile
        # is positional, peers are interchangeable, so the per-tile
        # aggregate is deterministic even though each 7's tile is not
        (1, "A", 9.0),
        (2, "A", 7.0),
        (3, "A", 7.0),
        (4, "A", 7.0),
        (5, "A", 3.0),
        # segment B: 6 rows → sizes [2,2,1,1] with a tie WHOLLY INSIDE
        # tile 2 (contrast case: tie that does not straddle)
        (6, "B", 8.0),
        (7, "B", 8.0),
        (8, "B", 6.0),
        (9, "B", 6.0),
        (10, "B", 2.0),
        (11, "B", 1.0),
    ]
    table = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "c_nationkey": pa.array([0] * len(rows), pa.int32()),
            "c_acctbal": pa.array([r[2] for r in rows], pa.float64()),
            "c_mktsegment": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    d = _write(tmp_path, "customer", table)
    spec = _spec("w9_ntile_buckets")
    got = {
        (r["c_mktsegment"], r["tile"], r["n_customers"], r["min_bal"], r["max_bal"])
        for r in spec.fn(spark, d).collect()
    }
    assert got == {
        ("A", 1, 2, 7.0, 9.0),
        ("A", 2, 1, 7.0, 7.0),
        ("A", 3, 1, 7.0, 7.0),
        ("A", 4, 1, 3.0, 3.0),
        ("B", 1, 2, 8.0, 8.0),
        ("B", 2, 2, 6.0, 6.0),
        ("B", 3, 1, 2.0, 2.0),
        ("B", 4, 1, 1.0, 1.0),
    }
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, msg


# ---------------------------------------------------------------------------
# Null order keys: Spark's ASC default is NULLS FIRST, DuckDB/Postgres sort
# nulls LAST — on the null-free fixtures the engines agree by luck. The
# w-family pins asc_nulls_last explicitly; these tests stage null-bearing
# copies of the real fixtures and run the FULL oracle comparison on them.
# ---------------------------------------------------------------------------


def _stage_with_nulls(tmp_path, table: str, mutate) -> str:
    """Copy the sf0.001 fixture with nulls injected, as a single parquet
    FILE (duckdb's read_parquet sees the same bytes Spark reads)."""
    src = f"/root/testdata/sf0.001/{table}.parquet"
    orig = pq.read_table(src)
    df = orig.to_pandas()
    mutate(df)
    d = tmp_path / "nullfix"
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(df, schema=orig.schema, preserve_index=False),
        str(d / f"{table}.parquet"),
    )
    return str(d)


def test_w8_percent_rank_with_null_prices_matches_oracle(spark, tmp_path):
    from .oracle_harness import compare

    def mutate(df):
        df.loc[df["p_partkey"] % 7 == 0, "p_retailprice"] = None

    d = _stage_with_nulls(tmp_path, "part", mutate)
    spec = catalog.REGISTRY["w8_pct_rank_cume"]
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, msg


def test_w2_lag_with_null_ts_and_values_matches_oracle(spark, tmp_path):
    from .oracle_harness import compare

    def mutate(df):
        df.loc[df["event_id"] % 11 == 0, "ts"] = None
        df.loc[df["event_id"] % 13 == 0, "value"] = None

    d = _stage_with_nulls(tmp_path, "events", mutate)
    spec = catalog.REGISTRY["w2_lag_delta"]
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, msg


def test_w3_running_sum_with_null_dates_matches_oracle(spark, tmp_path):
    from .oracle_harness import compare

    def mutate(df):
        df.loc[df["o_orderkey"] % 5 == 0, "o_orderdate"] = None

    d = _stage_with_nulls(tmp_path, "orders", mutate)
    spec = catalog.REGISTRY["w3_running_sum"]
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, msg


def test_w1_w9_desc_with_null_balances_match_oracle(spark, tmp_path):
    """DESC order keys: Spark's desc default is already NULLS LAST (same
    as DuckDB) — pin that the agreement holds on actual nulls."""
    from .oracle_harness import compare

    def mutate(df):
        df.loc[df["c_custkey"] % 9 == 0, "c_acctbal"] = None

    d = _stage_with_nulls(tmp_path, "customer", mutate)
    for name in ("w1_rank_topk_per_group", "w9_ntile_buckets"):
        spec = catalog.REGISTRY[name]
        ok, msg = compare(spark, d, spec.fn, spec.sql)
        assert ok, f"{name}: {msg}"
