"""Bounded retry for stream-server probes racing index maintenance.

``compact_partitioned``'s directory swap has a brief window where the
live partition directory is absent (two HDFS renames cannot be one
atomic operation); a foreachBatch probe landing inside that window
fails with a missing-path error. That failure is TRANSIENT — the swap
completes in milliseconds — so the servers retry the batch body a
bounded number of times, attempting ``recover_partitioned`` between
tries in case the compaction actually crashed mid-swap rather than
merely being in flight. Re-running the batch body (probe + sink) is
within the Structured Streaming contract: foreachBatch sinks must be
idempotent on ``batch_id`` anyway, because the engine itself re-runs
batches after failures.

Only missing-path errors are retried; anything else (bad schema,
analysis errors, executor failures) surfaces immediately.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

_MISSING_PATH_MARKERS = (
    "PATH_NOT_FOUND",
    "Path does not exist",
    "FileNotFoundException",
    "No such file or directory",
)


def _is_missing_path(exc: Exception) -> bool:
    msg = str(exc)
    return any(m in msg for m in _MISSING_PATH_MARKERS)


def run_with_maintenance_retry(
    spark,
    body: Callable[[], None],
    watched_dirs: Sequence[str],
    retries: int = 4,
    wait_s: float = 0.5,
) -> None:
    """Run ``body`` (probe construction + sink materialization),
    retrying up to ``retries`` extra times when it fails with a
    missing-path error on a directory a concurrent compaction may be
    swapping. Between tries, ``recover_partitioned`` repairs a
    crashed-mid-swap compaction on each watched directory (a no-op
    when the dir is healthy or merely mid-swap)."""
    from sgdnet_spark.operators.maintenance import recover_partitioned

    attempt = 0
    while True:
        try:
            body()
            return
        except Exception as exc:  # noqa: BLE001 — filtered below
            if attempt >= retries or not _is_missing_path(exc):
                raise
            attempt += 1
            time.sleep(wait_s)
            # only repair from the SECOND retry on: the first failure is
            # usually an IN-FLIGHT swap that completes by itself within
            # the wait — recovering too eagerly races the compactor's
            # install rename (which now detects the race and aborts,
            # but aborting a healthy compaction helps nobody)
            if attempt < 2:
                continue
            for d in watched_dirs:
                try:
                    recover_partitioned(spark, d)
                except Exception:  # noqa: BLE001 — best-effort repair
                    pass
