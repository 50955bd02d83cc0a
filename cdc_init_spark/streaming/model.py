"""The CCD (Change Capture Definition) — the engine's unit of control.

Reference shape: a map with :table, :queue, :queue-table, optional
:table-alias plus lifecycle fields :status, :timestamp, :progress, :error
(reference: src/cdc_init/core.clj:38-56,140-151; README.md:25-36). Status
vocabulary per README.md and core.clj: submitted, trigger-created,
queue-created, topic-created, prepared, seeding, active, error.

Here it is schema-first: a frozen dataclass plus a Spark StructType for the
control-topic wire format (JSON), so control messages flow through the same
typed DataFrame machinery as data.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace
from datetime import datetime, timezone
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Lifecycle statuses (reference: README.md:25-36, core.clj docstrings).
STATUS_SUBMITTED = "submitted"
STATUS_TRIGGER_CREATED = "trigger-created"
STATUS_QUEUE_CREATED = "queue-created"
STATUS_TOPIC_CREATED = "topic-created"
STATUS_PREPARED = "prepared"
STATUS_SEEDING = "seeding"
STATUS_ACTIVE = "active"
STATUS_ERROR = "error"

ALL_STATUSES = frozenset(
    {
        STATUS_SUBMITTED,
        STATUS_TRIGGER_CREATED,
        STATUS_QUEUE_CREATED,
        STATUS_TOPIC_CREATED,
        STATUS_PREPARED,
        STATUS_SEEDING,
        STATUS_ACTIVE,
        STATUS_ERROR,
    }
)

# CCDs whose last-known state means "nothing to do" on catch-up
# (reference: components/initializer.clj:21-22).
NON_INITIALIZABLE_STATUSES = frozenset({STATUS_ACTIVE, STATUS_ERROR})

# Oracle object-name budget that forces a :table-alias
# (reference: core.clj prepare docstring, "longer than 22 characters").
MAX_UNALIASED_TABLE_NAME = 22

CCD_SCHEMA = StructType(
    [
        StructField("table", StringType()),
        StructField("queue", StringType()),
        StructField("queue_table", StringType()),
        StructField("table_alias", StringType()),
        StructField("status", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("progress", ArrayType(LongType())),
        StructField(
            "error",
            StructType(
                [
                    StructField("message", StringType()),
                    StructField("info", StringType()),
                ]
            ),
        ),
    ]
)


@dataclass(frozen=True)
class CCD:
    table: str
    queue: str
    queue_table: str | None = None
    table_alias: str | None = None
    status: str = STATUS_SUBMITTED
    timestamp: datetime | None = None
    progress: tuple[int, int] | None = None
    error: dict[str, Any] | None = None

    def with_status(
        self, new_status: str, now: datetime | None = None, **attrs: Any
    ) -> "CCD":
        """Reference `update-status` (core.clj:9-20): merge extra attrs,
        set status, stamp a fresh timestamp."""
        return replace(
            self,
            status=new_status,
            timestamp=now or datetime.now(timezone.utc),
            **attrs,
        )

    def to_json(self) -> str:
        d: dict[str, Any] = {
            "table": self.table,
            "queue": self.queue,
            "queue_table": self.queue_table,
            "table_alias": self.table_alias,
            "status": self.status,
            "timestamp": self.timestamp.isoformat() if self.timestamp else None,
            "progress": list(self.progress) if self.progress else None,
            "error": self.error,
        }
        return json.dumps(d, separators=(",", ":"), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "CCD":
        d = json.loads(s)
        ts = d.get("timestamp")
        err = d.get("error")
        if isinstance(err, str):
            err = {"message": err, "info": None}
        return cls(
            table=d["table"],
            queue=d["queue"],
            queue_table=d.get("queue_table"),
            table_alias=d.get("table_alias"),
            status=d.get("status", STATUS_SUBMITTED),
            timestamp=datetime.fromisoformat(ts) if ts else None,
            progress=tuple(d["progress"]) if d.get("progress") else None,
            error=err,
        )


def check_ccd(ccd: CCD) -> dict[str, Any] | None:
    """Validation gate (reference A6: cdc-util `check-ccd` called at
    initializer.clj:51-56 — behavior reconstructed from its call sites and
    the prepare/initialize docstring contracts, core.clj:40-56).

    Returns None when valid, else an info dict describing the failure.
    """
    from cdc_init_spark.functions.identifiers import split_table_ref, strip_schema

    problems: dict[str, Any] = {}
    for fld in ("table", "queue", "queue_table"):
        if not getattr(ccd, fld, None):
            problems[fld] = "missing"
    if "table" not in problems:
        try:
            split_table_ref(ccd.table)
        except ValueError as e:
            problems["table"] = str(e)
        else:
            bare = strip_schema(ccd.table).strip('"')
            if len(bare) > MAX_UNALIASED_TABLE_NAME and not ccd.table_alias:
                problems["table_alias"] = (
                    f"required: table name {bare!r} exceeds "
                    f"{MAX_UNALIASED_TABLE_NAME} characters"
                )
    return problems or None
