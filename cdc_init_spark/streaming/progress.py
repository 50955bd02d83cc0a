"""Progress metering + admin-op retry (reference A22 / A15).

- ``ProgressMeter``: the 2%-threshold conflated emitter used by the
  driver-side seeding loop (reference: core.clj:158-175 — first emission
  at 0, then whenever count-last ≥ total*0.02, none when total==0).
- ``job_progress``: bulk-write progress — while a Spark action runs, a
  poller thread reads the StatusTracker's task counts and feeds scaled
  row estimates through a ProgressMeter (batch-granular, the documented
  weaker form of the reference's per-record metering).
- ``retry_with_backoff``: the reference's cubic-backoff poll loop for
  eventually-consistent admin operations (topic_store.clj:21-27,72-82):
  delay(n) = max(2, 2·round(n³/2)) seconds, default 10 attempts.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from contextlib import contextmanager
from typing import Any

from pyspark.sql import SparkSession


class ProgressMeter:
    """Conflated [count, total] emitter (A22 semantics)."""

    def __init__(self, total: int, emit: Callable[[int, int], None]):
        self.total = total
        self.emit = emit
        self.two_pcnt = total * 0.02
        self.last: int | None = None

    def update(self, count: int) -> bool:
        """Report a new absolute count; emits if the 2% threshold passed.
        No emissions at all when total == 0 (core.clj:166)."""
        if self.total <= 0:
            return False
        if self.last is None or (count - self.last) >= self.two_pcnt:
            self.emit(count, self.total)
            self.last = count
            return True
        return False


@contextmanager
def job_progress(
    spark: SparkSession,
    total_rows: int,
    emit: Callable[[int, int], None],
    poll_interval: float = 0.25,
):
    """Meter a bulk Spark action: estimates rows ≈ total × completed/total
    tasks across active stages. Enter the context, run the action inside."""
    meter = ProgressMeter(total_rows, emit)
    stop = threading.Event()
    tracker = spark.sparkContext.statusTracker()

    def poll() -> None:
        meter.update(0)
        while not stop.is_set():
            try:
                done = tot = 0
                for sid in tracker.getActiveStageIds():
                    info = tracker.getStageInfo(sid)
                    if info:
                        done += info.numCompletedTasks
                        tot += info.numTasks
                if tot > 0:
                    meter.update(int(total_rows * done / tot))
            except Exception:  # noqa: BLE001 — metering must never kill the job
                pass
            stop.wait(poll_interval)

    t = threading.Thread(target=poll, daemon=True)
    t.start()
    try:
        yield meter
    finally:
        stop.set()
        t.join(timeout=2)
        if total_rows > 0:
            meter.emit(total_rows, total_rows)


def cubic_backoff(attempt: int) -> float:
    """topic_store.clj:21-27: max(2, 2·round(n³/2)) seconds for attempt n
    (1-based): 2, 8, 28, 64, 126, ... Half-up rounding to match the JVM's
    Math/round (Python's round() is banker's)."""
    import math

    return float(max(2, 2 * math.floor(attempt**3 / 2 + 0.5)))


def retry_with_backoff(
    check: Callable[[], bool],
    attempts: int = 10,
    backoff: Callable[[int], float] = cubic_backoff,
    sleep: Callable[[float], None] = time.sleep,
) -> bool:
    """Poll ``check`` until truthy or the attempt budget runs out
    (topic_store.clj:72-82's delete-poll-recreate loop). Returns success."""
    for n in range(1, attempts + 1):
        if check():
            return True
        if n < attempts:
            sleep(backoff(n))
    return bool(check())
