"""The control topic — an ordered, replayable log of CCD state events.

Reference: a single-partition compacted Kafka topic named
`change-data-capture`, read from offset 0 at startup then tailed
(reference: components/initializer.clj:27-39,84-104; topic config at
components/topic_store.clj:13-16). Single partition ⇒ total order; log
compaction ⇒ last-state-per-key wins.

Engine equivalents behind one interface:
- ``FileControlLog``: a JSON-lines directory with an explicit monotonically
  increasing ``offset`` column — batch-readable and streaming-readable via
  Spark's file source (the test/deploy-without-Kafka path).
- ``KafkaControlLog``: the same contract on a Kafka topic (requires the
  spark-sql-kafka connector on the classpath; constructed lazily so local
  environments without the connector still import cleanly).

Compaction and backlog selection are Spark jobs (A1/A2/A3), not driver
loops — at millions of control messages this is one shuffle on the CCD key.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_init_spark.streaming.model import (
    CCD,
    CCD_SCHEMA,
    NON_INITIALIZABLE_STATUSES,
)

DEFAULT_CONTROL_TOPIC = "change-data-capture"


class ControlLog(ABC):
    @abstractmethod
    def append(self, ccd: CCD) -> None: ...

    @abstractmethod
    def read(self, spark: SparkSession) -> DataFrame:
        """Batch read of the whole log: CCD_SCHEMA columns + `offset`."""
        ...

    @abstractmethod
    def read_stream(self, spark: SparkSession) -> DataFrame:
        """Streaming tail with the same schema."""
        ...


def last_known_states(log_df: DataFrame) -> DataFrame:
    """A2 — log-compaction semantics as a batch job: latest state per CCD
    key (the table reference). One hash shuffle on the key; max_by keeps a
    single struct per key (no sort of the full log)."""
    cols = [c for c in log_df.columns if c != "offset"]
    return (
        log_df.groupBy("table")
        .agg(F.max_by(F.struct(*cols), F.col("offset")).alias("s"))
        .select("s.*")
    )


def ccds_to_initialize(log_df: DataFrame) -> DataFrame:
    """A1+A2+A3: compact, drop non-initializable statuses, order the
    backlog by submission timestamp (initializer.clj:27-39,97)."""
    return (
        last_known_states(log_df)
        .filter(~F.col("status").isin(*sorted(NON_INITIALIZABLE_STATUSES)))
        .orderBy("timestamp")
    )


class FileControlLog(ControlLog):
    """JSON-lines directory log. Each append writes one small file named
    by zero-padded offset (lexicographic order == offset order, which also
    gives the file streaming source deterministic pickup order)."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._lock = threading.Lock()
        self._next = self._scan_next_offset()

    def _scan_next_offset(self) -> int:
        mx = -1
        for f in os.listdir(self.path):
            if f.endswith(".jsonl"):
                try:
                    mx = max(mx, int(f.split("-")[0]))
                except ValueError:
                    continue
        return mx + 1

    def append(self, ccd: CCD) -> None:
        with self._lock:
            off = self._next
            self._next += 1
        rec = json.loads(ccd.to_json())
        rec["offset"] = off
        # unique suffix so concurrent writers can't collide on a name
        name = f"{off:020d}-{uuid.uuid4().hex[:8]}.jsonl"
        tmp = os.path.join(self.path, f".{name}.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(json.dumps(rec, separators=(",", ":")) + "\n")
        os.rename(tmp, os.path.join(self.path, name))

    def _schema_with_offset(self):
        from pyspark.sql.types import LongType, StructField, StructType

        return StructType(
            list(CCD_SCHEMA.fields) + [StructField("offset", LongType())]
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(self._schema_with_offset()).json(self.path)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return (
            spark.readStream.schema(self._schema_with_offset())
            .option("maxFilesPerTrigger", 64)
            .json(self.path)
        )

    def compact(self, spark: SparkSession) -> int:
        """Log-compaction maintenance (the file-based analog of the
        reference's `cleanup.policy=compact` topic config,
        topic_store.clj:15-16): rewrite the log keeping only the latest
        state per CCD key, preserving each survivor's offset. Returns the
        number of records removed.

        Safe to run between processing cycles (not concurrently with an
        active tail — the file source would re-read survivors as new
        files)."""
        import glob

        # latest state per key, offset preserved (last_known_states drops
        # the offset column, so inline the same max_by keeping all columns)
        log_df = self.read(spark)
        latest = (
            log_df.groupBy("table")
            .agg(F.max_by(F.struct(*log_df.columns), F.col("offset")).alias("s"))
            .select("s.*")
        )
        rows = latest.collect()
        removed = sum(1 for _ in glob.glob(os.path.join(self.path, "*.jsonl"))) - len(
            rows
        )
        for f in glob.glob(os.path.join(self.path, "*.jsonl")):
            os.remove(f)
        for r in rows:
            rec = {k: r[k] for k in r.asDict()}
            if rec.get("timestamp") is not None:
                rec["timestamp"] = rec["timestamp"].isoformat()
            if rec.get("error") is not None:
                rec["error"] = dict(rec["error"].asDict())
            if rec.get("progress") is not None:
                rec["progress"] = list(rec["progress"])
            off = rec["offset"]
            name = f"{off:020d}-{uuid.uuid4().hex[:8]}.jsonl"
            with open(os.path.join(self.path, name), "w", encoding="utf-8") as fh:
                fh.write(json.dumps(rec, separators=(",", ":")) + "\n")
        return removed


class KafkaControlLog(ControlLog):
    """Kafka-backed control log (the reference's deployment shape:
    1 partition, cleanup.policy=compact — topic_store.clj:13-16).
    Value = CCD JSON; key = table reference; offset = Kafka offset."""

    def __init__(self, bootstrap_servers: str, topic: str = DEFAULT_CONTROL_TOPIC):
        self.bootstrap = bootstrap_servers
        self.topic = topic
        self._producer_df_session: SparkSession | None = None

    def append(self, ccd: CCD) -> None:
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("KafkaControlLog.append requires an active session")
        df = spark.createDataFrame(
            [(ccd.table, ccd.to_json())], ["key", "value"]
        )
        (
            df.write.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("topic", self.topic)
            .save()
        )

    def _decode(self, raw: DataFrame) -> DataFrame:
        return raw.select(
            F.from_json(F.col("value").cast("string"), CCD_SCHEMA).alias("c"),
            F.col("offset"),
        ).select("c.*", "offset")

    def read(self, spark: SparkSession) -> DataFrame:
        raw = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("subscribe", self.topic)
            .option("startingOffsets", "earliest")
            .load()
        )
        return self._decode(raw)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("subscribe", self.topic)
            .option("startingOffsets", "earliest")
            .load()
        )
        return self._decode(raw)
