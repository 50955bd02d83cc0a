"""The initializer — the control loop that drives CCDs through
prepare → initialize.

Reference: components/initializer.clj — on start it (a) ensures the control
topic exists, (b) catch-up-scans it into a backlog of initializable CCDs
sorted by timestamp, (c) processes the backlog and any live `submitted`
messages sequentially on a single worker, and (d) synchronously publishes
every intermediate status back to the control topic (initializer.clj:76-115).

Spark mapping: catch-up is a batch compaction job (control_log.
ccds_to_initialize); the live tail is a Structured Streaming query whose
foreachBatch drives the same sequential processor (ordering preserved —
the log is single-partition/totally ordered, and each micro-batch is
processed in offset order by a single driver-side worker, matching the
reference's one-consumer queue at initializer.clj:87-110).
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import SparkSession

from cdc_init_spark.streaming import core
from cdc_init_spark.streaming.control_log import ControlLog, ccds_to_initialize
from cdc_init_spark.streaming.model import (
    CCD,
    STATUS_ERROR,
    STATUS_SUBMITTED,
    check_ccd,
)
from cdc_init_spark.streaming.stores import ChangeDataStore, SeedStore, TopicStore

log = logging.getLogger(__name__)


def row_to_ccd(row: Any) -> CCD:
    d = row.asDict(recursive=True) if hasattr(row, "asDict") else dict(row)
    err = d.get("error")
    return CCD(
        table=d["table"],
        queue=d["queue"],
        queue_table=d.get("queue_table"),
        table_alias=d.get("table_alias"),
        status=d.get("status") or STATUS_SUBMITTED,
        timestamp=d.get("timestamp"),
        progress=tuple(d["progress"]) if d.get("progress") else None,
        error=dict(err) if err else None,
    )


class Initializer:
    """Sequential CCD processor (initializer.clj:41-68 initialize-ccd-loop)."""

    def __init__(
        self,
        control_log: ControlLog,
        db: ChangeDataStore,
        seed_store: SeedStore,
        topic_store: TopicStore,
        clock=core._utcnow,
    ) -> None:
        self.control_log = control_log
        self.db = db
        self.seed_store = seed_store
        self.topic_store = topic_store
        self.clock = clock
        self._query = None
        self._caught_up_to: int | None = None

    # -- the per-CCD state machine ---------------------------------------

    def process_ccd(self, ccd: CCD) -> CCD:
        """Validate → prepare → (unless error) initialize, forwarding every
        intermediate state to the control log (initializer.clj:44-67).
        Returns the terminal state."""
        err = check_ccd(ccd)
        if err is not None:
            final = ccd.with_status(
                STATUS_ERROR,
                self.clock(),
                error={"message": "invalid specification", "info": str(err)},
            )
            self.control_log.append(final)
            return final
        last = ccd
        for state in core.prepare(ccd, self.db, self.topic_store, self.clock):
            self.control_log.append(state)
            last = state
        if last.status == STATUS_ERROR:
            return last
        for state in core.initialize(
            ccd, self.topic_store, self.seed_store, self.db, self.clock
        ):
            self.control_log.append(state)
            last = state
        return last

    # -- catch-up (A1/A2/A3) ---------------------------------------------

    def backlog(self, spark: SparkSession) -> list[CCD]:
        """Initializable CCDs from the full control log, oldest first."""
        df = ccds_to_initialize(self.control_log.read(spark))
        return [row_to_ccd(r) for r in df.drop("offset").collect()]

    def catch_up(self, spark: SparkSession) -> list[CCD]:
        """Process the whole backlog sequentially; returns terminal states.
        Records the max offset read, so a subsequent tail starts after it —
        the reference's reset-consumer-offset-to-max-read behavior
        (initializer.clj:27-39)."""
        from pyspark.sql import functions as F

        log_df = self.control_log.read(spark)
        mx = log_df.agg(F.max("offset")).first()[0]
        self._caught_up_to = -1 if mx is None else int(mx)
        results = []
        for ccd in self.backlog(spark):
            log.info("processing CCD for %s", ccd.table)
            results.append(self.process_ccd(ccd))
        return results

    # -- live tail (A4/A8) -----------------------------------------------

    def start_tail(
        self, spark: SparkSession, checkpoint_dir: str, poll_interval: str = "1 second"
    ):
        """Tail the control log for new `submitted` CCDs and process them
        in arrival order. foreachBatch keeps processing on one driver-side
        worker — the reference's single-consumer queue semantics."""
        stream = (
            self.control_log.read_stream(spark)
            .filter(f"status = '{STATUS_SUBMITTED}'")
        )
        if self._caught_up_to is not None:
            # don't re-process what catch_up already handled
            stream = stream.filter(f"offset > {self._caught_up_to}")

        def handle_batch(batch_df, batch_id: int) -> None:
            rows = batch_df.orderBy("offset").collect()
            for row in rows:
                self.process_ccd(row_to_ccd(row))

        self._query = (
            stream.writeStream.foreachBatch(handle_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=poll_interval)
            .start()
        )
        return self._query

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None
