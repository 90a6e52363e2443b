"""Round-over-round BENCH_full diff keyed on plan metrics, not wall time.

``python -m tests.bench_diff BENCH_full_rPREV.json BENCH_full_rCUR.json``

Classifies every query present in both artifacts:

- **metric-moved**: any plan-metric channel (shuffle bytes/records, rows
  read/written) differs beyond tolerance → a REAL plan or data change;
  wall delta is reported as its consequence.
- **wall-moved, metrics-identical**: wall moved >15% and >0.25 s but every
  byte/record channel is identical → host drift by construction; listed
  separately so nobody chases it.
- When the PREV artifact predates the metric channel (r8 and earlier),
  falls back to wall-only classification and says so — the caller must
  then clear movers against PLAN_MANIFEST.json, the pre-r9 procedure.

CPU time (``executor_cpu_ms``) is reported but never used to classify:
it is more stable than wall yet still load-sensitive (cache contention).

Iterative/streaming-tagged queries get their own bucket
(``metric_moved_nondeterministic_channel``): their byte/record channels
are NOT deterministic functions of (plan, data) — proven r11 by running
the same code twice in fresh sessions: d8's ``limit(1)`` convergence
probes read a scheduling-dependent record count (81460 vs 82137, the
exact pair of values the r10/r11 artifacts recorded), and st7's
foreachBatch bloom build shuffles a partition-count-dependent bitset
volume (123771 vs 116771 same-code) with cache-state-dependent
rows_read. A mover there still prints every channel, but the verdict
directs the reader to PLAN_MANIFEST drift, not the byte diff.
"""

from __future__ import annotations

import json
import sys

_EXACT = ("rows_read", "rows_written", "shuffle_read_records", "shuffle_write_records")
_BYTES = ("input_bytes", "output_bytes", "shuffle_read_bytes", "shuffle_write_bytes")


def _nondeterministic_channel_queries() -> set[str]:
    """Queries whose metric channel is not a pure (plan, data) function:
    iterative fixpoints (limit(1) convergence probes read a
    scheduling-dependent amount) and streaming replays (micro-batch
    partition counts move the per-batch shuffle volumes)."""
    from etl_pipeline_telecom_spark import catalog

    return {
        n
        for n, s in catalog.specs().items()
        if "iterative" in s.tags or "streaming" in s.tags
    }


def _metric_moved(prev: dict, cur: dict) -> list[str]:
    moved = []
    for k in _EXACT:
        if prev.get(k, 0) != cur.get(k, 0):
            moved.append(f"{k} {prev.get(k, 0)}→{cur.get(k, 0)}")
    for k in _BYTES:
        p, c = prev.get(k, 0), cur.get(k, 0)
        # bytes can wobble ~1% run-to-run (compression block boundaries,
        # AQE coalesce grouping); records cannot
        if abs(c - p) > max(0.02 * max(p, c), 4096):
            moved.append(f"{k} {p / 1e6:.2f}MB→{c / 1e6:.2f}MB")
    return moved


def diff(prev_path: str, cur_path: str) -> dict:
    with open(prev_path) as f:
        prev = json.load(f)
    with open(cur_path) as f:
        cur = json.load(f)
    pq, cq = prev["queries"], cur["queries"]
    pm, cm = prev.get("metrics", {}), cur.get("metrics", {})
    common = sorted(set(pq) & set(cq))
    out = {
        "prev": prev_path,
        "cur": cur_path,
        "n_common": len(common),
        "added": sorted(set(cq) - set(pq)),
        "removed": sorted(set(pq) - set(cq)),
        "prev_has_metrics": bool(pm),
        "metric_moved": {},
        "metric_moved_nondeterministic_channel": {},
        "wall_only_moved": {},
    }
    nondet = _nondeterministic_channel_queries()
    for name in common:
        wall_d = cq[name] - pq[name]
        wall_big = abs(wall_d) > 0.25 and abs(wall_d) > 0.15 * max(pq[name], 0.001)
        if pm and cm and name in pm and name in cm:
            moved = _metric_moved(pm[name], cm[name])
            if moved and name in nondet:
                out["metric_moved_nondeterministic_channel"][name] = {
                    "wall": f"{pq[name]}→{cq[name]}",
                    "channels": moved,
                    "verdict": "iterative/streaming channel — nondeterministic "
                    "by construction (limit-probe / micro-batch volumes); "
                    "judge by PLAN_MANIFEST drift",
                }
            elif moved:
                out["metric_moved"][name] = {
                    "wall": f"{pq[name]}→{cq[name]}",
                    "channels": moved,
                }
            elif wall_big:
                out["wall_only_moved"][name] = {
                    "wall": f"{pq[name]}→{cq[name]}",
                    "verdict": "host drift (all byte/record channels identical)",
                }
        elif wall_big:
            out["wall_only_moved"][name] = {
                "wall": f"{pq[name]}→{cq[name]}",
                "verdict": "no metric channel in prev artifact — clear against PLAN_MANIFEST.json",
            }
    return out


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    result = diff(sys.argv[1], sys.argv[2])
    print(json.dumps(result, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
