"""Full-catalog warm-timing artifact → BENCH_full_r{N}.json (VERDICT r7 #5).

The headline bench (bench.py) times 60 of the catalog's queries;
regressions in the other ~100 previously surfaced only through the
sf0.01 correctness sweep's gross wall time. This records ONE warm
timing per catalog query at sf0.1 (cold run first, then min of two
timed warm runs) so rounds can diff the full surface.

Streaming entries execute their bounded replay harness — their numbers
include replay staging and are comparable round-over-round, not with
batch queries.

Usage: python -m tests.bench_full [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    from etl_pipeline_telecom_spark import catalog
    from etl_pipeline_telecom_spark.session import get_spark

    from etl_pipeline_telecom_spark.metrics import StageMetricsTracker

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "BENCH_full_r9.json"
    spark = get_spark("bench-full")
    # warm python workers once (mapInPandas spin-up is ~1-2s for 32 workers)
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    timings: dict[str, float] = {}
    metrics: dict[str, dict[str, int]] = {}
    tracker = StageMetricsTracker(spark)
    tracker.delta()  # drain warm-up stages
    t_start = time.perf_counter()
    for name, spec in catalog.specs().items():
        spec.fn(spark, sf_dir).count()  # cold
        # plan-metric channel (VERDICT r8 item 1): captured on the cold
        # run — bytes/records are plan+data functions, immune to host
        # drift; the round-over-round diff keys on these, not wall
        metrics[name] = tracker.delta()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        # drain the WARM runs' stages so they are never attributed to
        # the NEXT query's delta. Without this (r9's artifact), each
        # query's metrics were cold(self) + 2×warm(previous) — i.e.
        # ORDER-SENSITIVE: the r10 catalog reordering moved dozens of
        # byte/record channels with ZERO plan drift, which is exactly
        # the false signal the channel exists to rule out.
        tracker.delta()
        m = metrics[name]
        print(
            f"{name:32s} {best:7.3f}s  sw={m['shuffle_write_bytes']/1e6:8.2f}MB "
            f"rows_read={m['rows_read']:>10d} cpu={m['executor_cpu_ms']/1e3:7.2f}s",
            flush=True,
        )
    payload = {
        "metric": "full_catalog_warm_min2_per_query",
        "sf_dir": sf_dir,
        "n_queries": len(timings),
        "total_warm_sec": round(sum(timings.values()), 3),
        "wall_sec": round(time.perf_counter() - t_start, 3),
        "queries": timings,
        "metrics": metrics,
    }
    with open(os.path.join(REPO, out), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"{len(timings)} queries, {payload['total_warm_sec']}s warm total -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
