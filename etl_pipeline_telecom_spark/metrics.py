"""Per-query physical plan metrics from the JVM AppStatusStore.

The bench artifacts (BENCH_r{N} / BENCH_full_r{N}) historically carried
wall time only, so separating shared-host drift from a real plan
regression required manually cross-checking PLAN_MANIFEST.json (the r8
"+5.6%" investigation). This module adds the missing channel: per-query
**shuffle bytes/records, rows read, and executor CPU time** summed over
the Spark stages each query executed. Bytes and record counts are a
function of the PLAN and the DATA — they do not move when a noisy
neighbor steals cores — so a round-over-round diff keyed on them is a
regression detector that wall time can never be.

Mechanism: ``SparkContext.statusStore`` (the store that backs the UI and
the REST API) is populated by ``AppStatusListener`` regardless of
``spark.ui.enabled``; py4j can call it because Scala ``private[spark]``
compiles to public bytecode. Queries run serially in the bench, so every
stage that NEWLY appears in the store between two ``delta()`` calls
belongs to the query that just ran — including broadcast-exchange jobs
submitted from separate driver threads, which a job-group approach would
miss. Stage eviction (``spark.ui.retainedStages``, default 1000) only
drops the OLDEST stages, so per-query polling is safe while a single
query stays under the retention limit. A query that creates MORE stages
than the limit between two ``delta()`` calls (e.g. an iterative op at
large SF) would silently undercount — so ``delta()`` also reports
``stage_id_gaps``: stage ids are allocated contiguously per
SparkContext, so any id below the store's oldest retained stage that no
``delta()`` ever observed was evicted unseen, and the artifact carries
the count instead of pretending completeness (ADVICE r9).

Caveats, by design:
- ``executor_cpu_ms``/``executor_run_ms`` include speculative/failed task
  time; on the quiet bench host these are zero.
- A ``.cache()``-reusing query reports the metrics of whatever actually
  executed (cold = build + probe; warm = probe only). Bench captures the
  COLD pass, i.e. fresh-session semantics.
- SKIPPED stages (shuffle reuse) report zeros — correct: nothing ran.
- ``stage_id_gaps`` can FALSE-POSITIVE (ADVICE r10): the gap check
  assumes every id below the oldest retained one belonged to a stage
  that completed, but Spark also burns ids on stages that never run —
  a cancelled job, or a stage dropped before reaching the status store.
  Those ids are flagged as "evicted unseen" even though no metrics were
  lost. The channel is therefore ADVISORY (an undercount UPPER bound):
  a nonzero value says "inspect this query's stage volume", never
  "metrics are wrong by N stages".
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: StageData accessor -> (artifact key, unit divisor applied at read time)
_FIELDS = (
    ("inputBytes", "input_bytes"),
    ("inputRecords", "rows_read"),
    ("outputBytes", "output_bytes"),
    ("outputRecords", "rows_written"),
    ("shuffleReadBytes", "shuffle_read_bytes"),
    ("shuffleReadRecords", "shuffle_read_records"),
    ("shuffleWriteBytes", "shuffle_write_bytes"),
    ("shuffleWriteRecords", "shuffle_write_records"),
    ("executorRunTime", "executor_run_ms"),
    ("executorCpuTime", "executor_cpu_ns"),
)


class StageMetricsTracker:
    """Attribute stage metrics to serially-executed queries via deltas.

    Usage::

        tracker = StageMetricsTracker(spark)
        tracker.delta()          # drain warm-up stages
        df.count()
        m = tracker.delta()      # metrics for that action (+ its AQE/broadcast jobs)
    """

    def __init__(self, spark: SparkSession) -> None:
        sc = spark.sparkContext
        self._store = sc._jsc.sc().statusStore()
        self._gw = sc._gateway
        self._seen: set[tuple[int, int]] = set()
        self._seen_ids: set[int] = set()
        self._gap_flagged: set[int] = set()

    def _stage_list(self):
        # stageList(statuses: JList|null, details, withSummaries, quantiles, taskStatus)
        empty_quantiles = self._gw.new_array(self._gw.jvm.double, 0)
        return self._store.stageList(None, False, False, empty_quantiles, None)

    def delta(self) -> dict[str, int]:
        """Sum metrics over stages that completed since the last call.

        ``stage_id_gaps`` counts stage ids evicted from the store before
        ANY ``delta()`` observed them (retainedStages overflow within one
        query) — nonzero means this delta's sums are an UNDERCOUNT and
        the artifact says so rather than silently reporting partial
        metrics. Each missed id is flagged once.
        """
        out = {key: 0 for _, key in _FIELDS}
        stages = self._stage_list()
        ids_now: list[int] = []
        for i in range(stages.size()):
            s = stages.apply(i)
            ids_now.append(int(s.stageId()))
            status = str(s.status())
            if status in ("ACTIVE", "PENDING"):
                continue  # not finished — attribute to whichever delta() sees it done
            ident = (s.stageId(), s.attemptId())
            self._seen_ids.add(int(s.stageId()))
            if ident in self._seen:
                continue
            self._seen.add(ident)
            for accessor, key in _FIELDS:
                out[key] += int(getattr(s, accessor)())
        # eviction check: ids are contiguous per SparkContext, so every id
        # below the oldest RETAINED one must have been seen by some delta
        if ids_now:
            oldest_retained = min(ids_now)
            gaps = {
                i
                for i in range(oldest_retained)
                if i not in self._seen_ids and i not in self._gap_flagged
            }
            self._gap_flagged |= gaps
            out["stage_id_gaps"] = len(gaps)
        else:
            out["stage_id_gaps"] = 0
        # ns -> ms for the artifact (keeps every channel integer-valued)
        out["executor_cpu_ms"] = out.pop("executor_cpu_ns") // 1_000_000
        return out


def metric_channels() -> tuple[str, ...]:
    """Artifact key order (stable, for docs/tests)."""
    keys = [key for _, key in _FIELDS if key != "executor_cpu_ns"]
    keys.append("executor_cpu_ms")
    keys.append("stage_id_gaps")
    return tuple(keys)
