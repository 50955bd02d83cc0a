"""The two control-plane pipelines: ``prepare`` and ``initialize``.

Faithful port of the reference's semantics (reference:
src/cdc_init/core.clj:34-182), with Python generators playing the role of
the reference's core.async channels: each yielded CCD is a status event the
caller forwards to the control topic (the reference pipes them via
pipe-ret-last, initializer.clj:57-67).

Semantics preserved exactly:
- prepare order: trigger → queue → topic; exists → disable/clear (no
  event), missing → create + event; any exception → terminal :error
  (core.clj:82-100).
- initialize: enable trigger FIRST (capture overlaps snapshot — duplicates
  tolerated because the topic is compacted and messages are keyed by PK,
  core.clj:161), then count, then stream seeds with 2%-conflated progress
  (emit when c - last >= total*0.02, first at 0, none when total == 0,
  core.clj:158-175), final :active; on ANY error best-effort
  disable-trigger then :error (core.clj:176-179).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone
from typing import Any, Callable

from cdc_init_spark.streaming.model import (
    CCD,
    STATUS_ACTIVE,
    STATUS_ERROR,
    STATUS_PREPARED,
    STATUS_QUEUE_CREATED,
    STATUS_SEEDING,
    STATUS_TOPIC_CREATED,
    STATUS_TRIGGER_CREATED,
)
from cdc_init_spark.streaming.stores import ChangeDataStore, SeedStore, TopicStore

Clock = Callable[[], datetime]


def _utcnow() -> datetime:
    return datetime.now(timezone.utc)


def error_attrs(e: Exception) -> dict[str, Any]:
    return {"error": {"message": str(e) or type(e).__name__, "info": type(e).__name__}}


def prepare(
    ccd: CCD,
    db: ChangeDataStore,
    ts: TopicStore,
    clock: Clock = _utcnow,
) -> Iterator[CCD]:
    """Idempotent ensure-exists of trigger → queue → topic
    (core.clj:34-101). Yields intermediate states (:trigger-created,
    :queue-created, :topic-created) for objects actually created, then
    :prepared — or :error with the captured exception."""
    try:
        if db.trigger_exists(ccd.table):
            db.disable_trigger(ccd.table)
        else:
            db.create_trigger(ccd.table, ccd.queue, ccd.table_alias)
            yield ccd.with_status(STATUS_TRIGGER_CREATED, clock())
        if db.queue_exists(ccd.queue):
            db.clear_queue(ccd.queue, ccd.queue_table)
        else:
            db.create_queue(ccd.queue, ccd.queue_table)
            yield ccd.with_status(STATUS_QUEUE_CREATED, clock())
        if ts.topic_exists(ccd.queue):
            ts.clear_topic(ccd.queue)
        else:
            ts.create_topic(ccd.queue)
            yield ccd.with_status(STATUS_TOPIC_CREATED, clock())
        yield ccd.with_status(STATUS_PREPARED, clock())
    except Exception as e:  # noqa: BLE001 — error becomes data (A25)
        yield ccd.with_status(STATUS_ERROR, clock(), **error_attrs(e))


def initialize(
    ccd: CCD,
    ts: TopicStore,
    ss: SeedStore,
    db: ChangeDataStore,
    clock: Clock = _utcnow,
) -> Iterator[CCD]:
    """Seed the change-capture topic and activate the trigger
    (core.clj:103-182). Yields :seeding progress states (conflated to
    every ≥2% of total) and the terminal :active / :error state."""
    try:
        db.enable_trigger(ccd.table)
        total = ss.record_count(ccd.table)
        two_pcnt = total * 0.02
        last_report: int | None = None
        if total > 0:
            c = 0
            seeds = iter(ss.seeds(ccd.table, ccd.table_alias))
            while True:
                if last_report is None or (c - last_report) >= two_pcnt:
                    yield ccd.with_status(
                        STATUS_SEEDING, clock(), progress=(c, total)
                    )
                    last_report = c
                kv = next(seeds, None)
                if kv is None:
                    break
                if isinstance(kv, dict) and kv.get("key") and kv.get("value"):
                    ts.send(ccd.queue, kv["value"], key=kv["key"])
                else:
                    ts.send(ccd.queue, kv)
                c += 1
        yield ccd.with_status(STATUS_ACTIVE, clock())
    except Exception as e:  # noqa: BLE001
        try:
            db.disable_trigger(ccd.table)
        except Exception:  # noqa: BLE001 — best-effort compensation
            pass
        yield ccd.with_status(STATUS_ERROR, clock(), **error_attrs(e))
