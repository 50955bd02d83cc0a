"""File-backed store implementations.

The reference's queue/trigger DDL is Oracle PL/SQL and its topics are
Kafka (reference: components/change_data_store.clj, components/
topic_store.clj); both are environment, not engine. These implementations
realize the same protocols on a filesystem so the whole control plane runs
(and is tested) without external services — and they are honest Spark
citizens: topic contents are JSON-lines directories Spark can scan or tail,
and bulk sends are DataFrame writes.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import uuid
from typing import Any

from pyspark.sql import DataFrame

from cdc_init_spark.streaming.stores import ChangeDataStore, TopicStore


class FileTopicStore(TopicStore):
    """Topics as JSON-lines directories (protocols.clj:16-22).

    Driver-side ``send`` appends one record file (the control-plane path —
    low rate, per-record ack like the reference's deref'd future,
    core.clj:173-174). Bulk data-plane writes go through ``send_frame``:
    a parquet/json append of a (key, value) DataFrame — batch-atomic,
    the documented weaker-ack equivalent at scale."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._lock = threading.Lock()
        self._seq = 0

    def _dir(self, topic: str) -> str:
        return os.path.join(self.root, topic)

    def topic_exists(self, topic: str) -> bool:
        return os.path.isdir(self._dir(topic))

    def create_topic(self, topic: str) -> None:
        os.makedirs(self._dir(topic), exist_ok=True)

    def clear_topic(self, topic: str) -> None:
        if self.topic_exists(topic):
            shutil.rmtree(self._dir(topic))
            os.makedirs(self._dir(topic), exist_ok=True)

    def send(self, topic: str, value: Any, key: Any | None = None) -> None:
        if not self.topic_exists(topic):
            raise ValueError(f"invalid topic {topic}")
        with self._lock:
            seq = self._seq
            self._seq += 1
        rec = {"key": key, "value": value}
        name = f"{seq:020d}-{uuid.uuid4().hex[:8]}.jsonl"
        path = os.path.join(self._dir(topic), name)
        with open(path + ".tmp", "w", encoding="utf-8") as fh:
            fh.write(json.dumps(rec, separators=(",", ":")) + "\n")
        os.rename(path + ".tmp", path)

    def send_frame(self, topic: str, frame: DataFrame) -> None:
        """Bulk keyed write — the 100 TB path (every executor writes its
        partitions directly; no driver involvement)."""
        if not self.topic_exists(topic):
            raise ValueError(f"invalid topic {topic}")
        frame.write.mode("append").json(self._dir(topic))

    def read_messages(self, topic: str) -> list[dict[str, Any]]:
        """Test/inspection helper: all messages in append order."""
        out = []
        d = self._dir(topic)
        for name in sorted(os.listdir(d)):
            if name.endswith(".tmp") or name.startswith(("_", ".")):
                continue
            with open(os.path.join(d, name), encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        out.append(json.loads(line))
        return out


class FileChangeDataStore(ChangeDataStore):
    """Queue/trigger lifecycle as a JSON state file + staging directories
    (protocols.clj:6-14).

    In a Spark-native deployment the "trigger" is the upstream change feed
    (e.g. a Debezium topic or a Delta CDF) and enable/disable maps to
    starting/stopping its StreamingQuery; this store tracks that lifecycle
    state durably, and "queues" are staging directories a feed can land in
    (the reference's mq_ tables, sql/util.clj:36-46)."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._state_path = os.path.join(root, "_triggers.json")
        self._lock = threading.Lock()

    def _load(self) -> dict[str, Any]:
        if not os.path.exists(self._state_path):
            return {}
        with open(self._state_path, encoding="utf-8") as fh:
            return json.load(fh)

    def _save(self, state: dict[str, Any]) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(state, fh, indent=1, sort_keys=True)
        os.rename(tmp, self._state_path)

    def _queue_dir(self, queue: str) -> str:
        return os.path.join(self.root, "queues", queue)

    def queue_exists(self, queue: str) -> bool:
        return os.path.isdir(self._queue_dir(queue))

    def create_queue(self, queue: str, queue_table: str) -> None:
        os.makedirs(self._queue_dir(queue), exist_ok=True)

    def clear_queue(self, queue: str, queue_table: str) -> None:
        if self.queue_exists(queue):
            shutil.rmtree(self._queue_dir(queue))
            os.makedirs(self._queue_dir(queue), exist_ok=True)

    def trigger_exists(self, table: str) -> bool:
        return table in self._load()

    def trigger_enabled(self, table: str) -> bool:
        return bool(self._load().get(table, {}).get("enabled", False))

    def create_trigger(
        self, table: str, queue: str, table_alias: str | None = None
    ) -> None:
        with self._lock:
            state = self._load()
            if table not in state:
                state[table] = {
                    "queue": queue,
                    "table_alias": table_alias,
                    "enabled": False,
                }
                self._save(state)

    def _set_enabled(self, table: str, enabled: bool) -> None:
        with self._lock:
            state = self._load()
            if table in state:
                state[table]["enabled"] = enabled
                self._save(state)

    def enable_trigger(self, table: str) -> None:
        self._set_enabled(table, True)

    def disable_trigger(self, table: str) -> None:
        self._set_enabled(table, False)
