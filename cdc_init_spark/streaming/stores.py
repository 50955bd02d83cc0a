"""The three storage protocols at the edges of the control plane.

Port of the reference's protocols (reference: src/cdc_init/protocols.clj:6-27):
ChangeDataStore (trigger/queue DDL), TopicStore (topic admin + keyed send),
SeedStore (snapshot count + record stream). The Oracle PL/SQL implementations
are environment, not engine — here the engine ships Spark-native
implementations (parquet/Delta staging, Kafka or file-backed topics,
DataFrame seed scans) plus in-memory fakes for the property suite
(tests/fakes.py, port of test/cdc_init/test_dummies.clj).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Iterator
from typing import Any


class ChangeDataStore(ABC):
    """Trigger + queue lifecycle (protocols.clj:6-14). In a Spark-native
    deployment the "trigger" is a change-feed StreamingQuery and the
    "queue" is its staging sink; enable/disable = start/stop."""

    @abstractmethod
    def queue_exists(self, queue: str) -> bool: ...

    @abstractmethod
    def create_queue(self, queue: str, queue_table: str) -> None: ...

    @abstractmethod
    def clear_queue(self, queue: str, queue_table: str) -> None: ...

    @abstractmethod
    def trigger_exists(self, table: str) -> bool: ...

    @abstractmethod
    def trigger_enabled(self, table: str) -> bool: ...

    @abstractmethod
    def create_trigger(
        self, table: str, queue: str, table_alias: str | None = None
    ) -> None: ...

    @abstractmethod
    def enable_trigger(self, table: str) -> None: ...

    @abstractmethod
    def disable_trigger(self, table: str) -> None: ...


class TopicStore(ABC):
    """Topic admin + message send (protocols.clj:16-22). The reference
    sends one message at a time and derefs the future (core.clj:173-174);
    a Spark sink acks per batch — send() here is synchronous-per-call for
    the driver-side loop, and bulk DataFrame writes go through send_frame
    with batch-atomic semantics (documented weaker guarantee)."""

    @abstractmethod
    def topic_exists(self, topic: str) -> bool: ...

    @abstractmethod
    def create_topic(self, topic: str) -> None: ...

    @abstractmethod
    def clear_topic(self, topic: str) -> None: ...

    @abstractmethod
    def send(self, topic: str, value: Any, key: Any | None = None) -> None: ...


class SeedStore(ABC):
    """Snapshot seeding (protocols.clj:24-27)."""

    @abstractmethod
    def record_count(self, table: str) -> int: ...

    @abstractmethod
    def seeds(self, table: str, table_alias: str | None = None) -> Iterator[Any]:
        """Yield seed messages ({'key':..., 'value':...} maps, or any
        truthy value for unkeyed sends) until the snapshot is exhausted
        (the reference's to-chan, seed_store.clj:98-115)."""
        ...
