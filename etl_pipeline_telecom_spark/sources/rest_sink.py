"""REST-batched sink: the reference's Supabase loader re-expressed as a
distributed ``foreachPartition`` sink (SURVEY.md §2.2 K4).

``scripts/load.py:95-230`` slices the table into 200-row batches,
converts NaN→None, POSTs each batch, retries ≤3 times with exponential
backoff ``2.0**attempt`` seconds, and aborts to a local copy on a remote
schema error. Here each EXECUTOR partition streams its rows into batches
and posts them — the driver never materializes the table — while batch
size, retry count, backoff base, and the schema-error abort keep the
reference's exact semantics.

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
) -> None:
    for attempt in range(max_retries):
        try:
            transport(batch)
            return
        except RestSchemaError:
            raise  # schema errors abort immediately (load.py:186-193)
        except Exception:
            if attempt == max_retries - 1:
                raise
            sleep(backoff**attempt)  # 1s, 2s, 4s… (load.py:199,225)


def write_rest_batched(
    df: DataFrame,
    transport_factory: TransportFactory,
    *,
    batch_size: int = 200,
    max_retries: int = 3,
    backoff: float = 2.0,
    sleep: Callable[[float], None] = time.sleep,
) -> None:
    """Stream every partition into ``batch_size`` POSTs with retry/backoff.

    Runs as one Spark action; per-partition state is a ≤``batch_size`` row
    buffer, so memory is O(batch), independent of table size.
    """

    def send_partition(rows: Iterator) -> None:
        transport = transport_factory()
        buf: list[dict] = []

        def flush() -> None:
            if buf:
                _post_with_retry(
                    transport, buf, max_retries=max_retries, backoff=backoff, sleep=sleep
                )
                buf.clear()

        for row in rows:
            buf.append(_clean(row.asDict(recursive=True)))
            if len(buf) >= batch_size:
                flush()
        flush()

    df.foreachPartition(send_partition)
