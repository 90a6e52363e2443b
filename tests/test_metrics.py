"""StageMetricsTracker + bench_diff classifier (VERDICT r8 item 1)."""

from __future__ import annotations

import json

from etl_pipeline_telecom_spark.metrics import StageMetricsTracker, metric_channels

from tests.bench_diff import diff


def test_tracker_attributes_serial_queries(spark):
    tracker = StageMetricsTracker(spark)
    tracker.delta()  # drain whatever earlier tests ran

    n = 100_000
    spark.range(n).selectExpr("id % 7 as k").groupBy("k").count().count()
    m1 = tracker.delta()
    # the scan read exactly n rows and the groupBy shuffled exactly
    # 7 partial rows per map task — both deterministic plan facts
    assert m1["rows_read"] == n
    assert m1["shuffle_write_bytes"] > 0
    assert m1["shuffle_write_records"] == m1["shuffle_read_records"] > 0
    assert m1["executor_cpu_ms"] >= 0

    # second identical query gets its OWN delta, same record channels
    spark.range(n).selectExpr("id % 7 as k").groupBy("k").count().count()
    m2 = tracker.delta()
    assert m2["rows_read"] == n
    assert m2["shuffle_write_records"] == m1["shuffle_write_records"]

    # no work → all-zero delta (nothing double-counted)
    m3 = tracker.delta()
    assert all(v == 0 for v in m3.values())


def test_tracker_sees_broadcast_thread_jobs(spark):
    """Broadcast exchanges submit jobs from a separate driver thread —
    the snapshot-delta design must still attribute their scan."""
    tracker = StageMetricsTracker(spark)
    tracker.delta()
    big = spark.range(50_000).selectExpr("id as k", "id * 2 as v")
    small = spark.range(64).selectExpr("id as k", "id as w")
    from pyspark.sql.functions import broadcast

    big.join(broadcast(small), "k").count()
    m = tracker.delta()
    # 50k probe rows + 64 build rows, all attributed to this delta
    assert m["rows_read"] == 50_064


def test_metric_channels_stable():
    assert metric_channels() == (
        "input_bytes",
        "rows_read",
        "output_bytes",
        "rows_written",
        "shuffle_read_bytes",
        "shuffle_read_records",
        "shuffle_write_bytes",
        "shuffle_write_records",
        "executor_run_ms",
        "executor_cpu_ms",
        "stage_id_gaps",
    )


def _artifact(tmp_path, name, queries, metrics=None):
    p = tmp_path / name
    payload = {"queries": queries}
    if metrics is not None:
        payload["metrics"] = metrics
    p.write_text(json.dumps(payload))
    return str(p)


def test_bench_diff_classifies(tmp_path):
    base_m = {
        "rows_read": 1000, "rows_written": 0,
        "shuffle_read_records": 50, "shuffle_write_records": 50,
        "input_bytes": 10_000_000, "output_bytes": 0,
        "shuffle_read_bytes": 5_000_000, "shuffle_write_bytes": 5_000_000,
        "executor_run_ms": 100, "executor_cpu_ms": 90,
    }
    drifted = dict(base_m)  # identical channels, wall moved → host drift
    regressed = dict(base_m, shuffle_write_records=500, shuffle_read_records=500)
    wobble = dict(base_m, shuffle_write_bytes=5_030_000)  # <2% bytes → noise

    prev = _artifact(
        tmp_path, "prev.json",
        {"q_drift": 1.0, "q_regress": 1.0, "q_wobble": 1.0, "q_same": 1.0},
        {"q_drift": base_m, "q_regress": base_m, "q_wobble": base_m, "q_same": base_m},
    )
    cur = _artifact(
        tmp_path, "cur.json",
        {"q_drift": 1.5, "q_regress": 1.5, "q_wobble": 1.0, "q_same": 1.02, "q_new": 0.5},
        {"q_drift": drifted, "q_regress": regressed, "q_wobble": wobble,
         "q_same": base_m, "q_new": base_m},
    )
    d = diff(prev, cur)
    assert d["added"] == ["q_new"]
    assert list(d["metric_moved"]) == ["q_regress"]
    assert "shuffle_write_records 50→500" in d["metric_moved"]["q_regress"]["channels"]
    assert list(d["wall_only_moved"]) == ["q_drift"]
    assert "host drift" in d["wall_only_moved"]["q_drift"]["verdict"]
    assert "q_wobble" not in d["metric_moved"] and "q_wobble" not in d["wall_only_moved"]
    assert "q_same" not in d["wall_only_moved"]


def test_bench_diff_no_prev_metrics(tmp_path):
    prev = _artifact(tmp_path, "p.json", {"q": 1.0})
    cur = _artifact(tmp_path, "c.json", {"q": 2.0}, {"q": {"rows_read": 1}})
    d = diff(prev, cur)
    assert not d["prev_has_metrics"]
    assert "PLAN_MANIFEST" in d["wall_only_moved"]["q"]["verdict"]


def test_tracker_drain_keeps_warm_runs_out_of_next_query(spark):
    """The bench_full loop discipline (r10 fix): a query's warm re-runs
    must be DRAINED before the next query's delta, or each query's
    metrics become cold(self) + warm(previous) — order-sensitive, the
    exact false signal the channel exists to rule out."""
    tracker = StageMetricsTracker(spark)
    tracker.delta()

    n1, n2 = 40_000, 70_000
    # query 1: cold + metrics, then two warm runs, then DRAIN
    spark.range(n1).selectExpr("id % 5 as k").groupBy("k").count().count()
    m1 = tracker.delta()
    assert m1["rows_read"] == n1
    for _ in range(2):
        spark.range(n1).selectExpr("id % 5 as k").groupBy("k").count().count()
    tracker.delta()  # drain — warm stages belong to query 1

    # query 2's delta must now contain ONLY its own cold pass
    spark.range(n2).selectExpr("id % 5 as k").groupBy("k").count().count()
    m2 = tracker.delta()
    assert m2["rows_read"] == n2, m2


def test_bench_stdout_line_fits_recorder_window():
    """r10: the driver records only the LAST 2000 chars of bench.py stdout
    and r9's non-JSON tail prefix alone measured ~120 chars — the 69-query
    r10 line hit 1980 chars after the first two shedding stages and would
    have truncated from the front (the exact BENCH_r05 failure). Pin the
    third stage: shortest-unique-prefix query keys keep the line far under
    the window at worst-case digit widths, keys stay collision-free over
    the whole catalog, and the one known collision pair (d12_*) resolves
    at two segments."""
    import bench
    from etl_pipeline_telecom_spark import catalog

    names = list(catalog.specs())
    short = bench._short_keys(names)
    assert len(set(short.values())) == len(names)  # injective
    assert short["a4_group_avg"] == "a4"
    assert short["d12_persisted_lsh_probe"] == "d12_persisted"
    assert short["d12_index_build"] == "d12_index"

    # worst case: every headline query at a 6-char 2dp value ("999.99")
    bench_set = [
        n for n in bench.HEADLINE if n in names
    ] + [n for n, s in catalog.specs().items() if "headline" in s.tags and n not in bench.HEADLINE]
    compact = {
        "metric": f"headline_queries_total_wall_warm_min5_{len(bench_set)}q",
        "value": 9999.999,
        "unit": "sec",
        "n_queries": len(bench_set),
        "value_20q_r3_compat": 9999.999,
        "value_compat_frozen": 9999.999,
        "compat_digest": "17c34a09",
        "compat_n": 47,
        "queries": {short[n]: 999.99 for n in bench_set},
        "sf": 0.1,
        "shuffle_mb": 99999.9,
        "rows_read_m": 99999.99,
        "std_in_side_file": 1,
        "q_2dp": 1,
        "q_keys": "uniq_prefix",
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= 1800, (len(line), "headline set grew past the window again")


def test_bench_compat_basket_frozen():
    """r14 (VERDICT r13 finding 1): the gate-metric basket is membership-
    by-INCLUSION now — the old post_r3 exclusion list silently leaked
    every r8-r13 headline joiner into the compat sum. Pin the frozen
    basket: exactly the 47 names the r13 judge verified like-for-like
    (26.144 s r12 / 28.294 s r13), every member still registered and
    headline-tagged (a member dropped from the headline set would shrink
    the sum silently), and no bench-set newcomer can join it."""
    import hashlib

    from bench import main as _  # noqa: F401 — import side check only
    import bench
    from etl_pipeline_telecom_spark import catalog

    src = open(bench.__file__).read()
    assert "COMPAT_FROZEN" in src and "post_r3" not in src
    # the basket is a function-local literal; re-derive it by executing
    # the frozenset expression out of the source text
    import ast, re

    m = re.search(r"COMPAT_FROZEN = frozenset\((\{[^}]+\})\)", src, re.S)
    frozen = frozenset(ast.literal_eval(m.group(1)))
    assert len(frozen) == 47
    # membership digest: any edit to the basket must be a deliberate,
    # reviewed change (update this hash together with a NOTES entry)
    digest = hashlib.md5(",".join(sorted(frozen)).encode()).hexdigest()
    assert digest == "17c34a095315869a6c2f62857c31b912", digest
    # ADVICE r14: the artifact must carry the versioned canonical key and
    # the basket digest so cross-round consumers never compare different
    # baskets under one name
    assert "value_compat_frozen" in src and "compat_digest" in src
    specs = catalog.specs()
    bench_set = set(bench.HEADLINE) | {
        n for n, s in specs.items() if "headline" in s.tags
    }
    for n in sorted(frozen):
        assert n in specs, n
        assert n in bench_set, (n, "left the bench set")
