"""REST-batched sink: the reference's Supabase loader re-expressed as a
distributed ``foreachPartition`` sink (SURVEY.md §2.2 K4).

``scripts/load.py:95-230`` slices the table into 200-row batches,
converts NaN→None, POSTs each batch with an initial attempt plus up to
``max_retries`` retries (4 total tries at the default 3), sleeping
``backoff ** attempt`` seconds with ``attempt`` counting from 1
(2s, 4s, 8s at backoff 2.0 — ``load.py:196-199,223-226``), SKIPS the
batch once retries are exhausted, and aborts to a local copy on a remote
schema error. Here each EXECUTOR partition streams its rows into batches
and posts them — the driver never materializes the table — with the
reference's exact retry/backoff/skip semantics by default;
``on_exhausted="raise"`` opts into stricter fail-the-job behavior for
pipelines where silent batch loss is unacceptable.

The transport is injected as a factory (called once per partition, on the
executor) so the sink is testable without a network and swappable between
HTTP clients. For plain Postgres, prefer ``writers.write_jdbc`` — this
sink exists for REST-only endpoints like PostgREST.
"""

from __future__ import annotations

import math
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


class RestSchemaError(RuntimeError):
    """Remote schema mismatch — not retryable (``load.py:186-193``)."""


#: transport: callable(batch: list[dict]) -> None, raising on failure
TransportFactory = Callable[[], Callable[[list[dict]], None]]


def _clean(record: dict) -> dict:
    """NaN→None, mirroring ``load.py:164`` (JSON has no NaN)."""
    return {
        k: (None if isinstance(v, float) and math.isnan(v) else v)
        for k, v in record.items()
    }


def _post_with_retry(
    transport: Callable[[list[dict]], None],
    batch: list[dict],
    *,
    max_retries: int,
    backoff: float,
    sleep: Callable[[float], None],
    on_exhausted: str = "skip",
) -> bool:
    """One initial attempt + up to ``max_retries`` retries (load.py:175-226).

    Returns True if the batch was posted, False if it was skipped after
    exhausting retries (the reference prints and moves on — load.py:196-198).
    """
    attempt = 0
    while True:
        try:
            transport(batch)
            return True
        except RestSchemaError:
            raise  # schema errors abort immediately (load.py:186-193)
        except Exception:
            attempt += 1
            if attempt > max_retries:
                if on_exhausted == "raise":
                    raise
                return False  # skip this batch, keep loading (load.py:196-198,223-226)
            sleep(backoff**attempt)  # 2s, 4s, 8s… (load.py:199,225)


def write_rest_batched(
    df: DataFrame,
    transport_factory: TransportFactory,
    *,
    batch_size: int = 200,
    max_retries: int = 3,
    backoff: float = 2.0,
    sleep: Callable[[float], None] = time.sleep,
    on_exhausted: str = "skip",
) -> dict[str, int]:
    """Stream every partition into ``batch_size`` POSTs with retry/backoff.

    Runs as one Spark action; per-partition state is a ≤``batch_size`` row
    buffer, so memory is O(batch), independent of table size.
    ``on_exhausted``: "skip" drops a batch whose retries are exhausted
    (reference behavior); "raise" fails the job instead.

    Returns ``{"batches_posted": n, "batches_skipped": n, "rows_skipped": n}``
    aggregated across executors via Spark accumulators — skipped batches are
    never silent: each one is also logged from the executor (the reference
    prints "Skipping batch" — load.py:196-198), and callers that cannot
    tolerate loss should check ``batches_skipped`` or pass
    ``on_exhausted="raise"``.

    Delivery semantics: AT-LEAST-ONCE, and the counts are per SUCCESSFUL
    task attempt. If Spark retries a failed task, POSTs the failed attempt
    already sent are not rolled back and not counted — ``batches_posted``
    can therefore UNDERCOUNT actual deliveries (duplicates possible on
    retry). Treat the stats as a progress signal, not a delivery ledger;
    exactly-once needs an idempotent endpoint (upsert on a key).
    """
    sc = df.sparkSession.sparkContext
    acc_posted = sc.accumulator(0)
    acc_skipped = sc.accumulator(0)
    acc_rows_skipped = sc.accumulator(0)

    def send_partition(rows: Iterator) -> None:
        import sys

        transport = transport_factory()
        buf: list[dict] = []

        def flush() -> None:
            if buf:
                posted = _post_with_retry(
                    transport,
                    buf,
                    max_retries=max_retries,
                    backoff=backoff,
                    sleep=sleep,
                    on_exhausted=on_exhausted,
                )
                if posted:
                    acc_posted.add(1)
                else:
                    acc_skipped.add(1)
                    acc_rows_skipped.add(len(buf))
                    print(
                        f"Skipping batch of {len(buf)} rows after "
                        f"{max_retries} retries",
                        file=sys.stderr,
                    )
                buf.clear()

        for row in rows:
            buf.append(_clean(row.asDict(recursive=True)))
            if len(buf) >= batch_size:
                flush()
        flush()

    df.foreachPartition(send_partition)
    return {
        "batches_posted": acc_posted.value,
        "batches_skipped": acc_skipped.value,
        "rows_skipped": acc_rows_skipped.value,
    }
