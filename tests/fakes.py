"""In-memory protocol fakes with fault injection.

Port of the reference's test dummies (reference:
test/cdc_init/test_dummies.clj:8-142): each fake implements its protocol
over plain dicts and exposes ``error_on(event, fn)`` — the registered fn is
called at the named event and may raise to interrupt processing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Callable

from cdc_init_spark.streaming.stores import ChangeDataStore, SeedStore, TopicStore


class GeneratedTestError(Exception):
    pass


def _default_error(*_args: Any) -> None:
    raise GeneratedTestError("generated test error")


class ErrorGenerator:
    def __init__(self) -> None:
        self._errors: dict[str, Callable[..., None]] = {}

    def error_on(self, event: str, fn: Callable[..., None] | None = None) -> None:
        self._errors[event] = fn or _default_error

    def reset_errors(self, event: str | None = None) -> None:
        if event is None:
            self._errors.clear()
        else:
            self._errors.pop(event, None)

    def _maybe_error(self, event: str, *args: Any) -> None:
        fn = self._errors.get(event)
        if fn is not None:
            fn(*args)


class FakeDatabase(ErrorGenerator, ChangeDataStore):
    """test_dummies.clj:37-69 — queues: name→list, triggers: table→enabled."""

    def __init__(self) -> None:
        super().__init__()
        self.queues: dict[str, list[Any]] = {}
        self.triggers: dict[str, bool] = {}

    def queue_exists(self, queue: str) -> bool:
        return queue in self.queues

    def create_queue(self, queue: str, queue_table: str) -> None:
        if not self.queue_exists(queue):
            self._maybe_error("create-queue", queue, self.queues)
            self.queues[queue] = []

    def clear_queue(self, queue: str, queue_table: str) -> None:
        if self.queue_exists(queue):
            self.queues[queue] = []

    def trigger_exists(self, table: str) -> bool:
        return table in self.triggers

    def trigger_enabled(self, table: str) -> bool:
        return self.triggers.get(table, False)

    def create_trigger(
        self, table: str, queue: str, table_alias: str | None = None
    ) -> None:
        if not self.trigger_exists(table):
            self._maybe_error("create-trigger", table, self.triggers)
            self.triggers[table] = False

    def enable_trigger(self, table: str) -> None:
        if self.trigger_exists(table):
            self.triggers[table] = True

    def disable_trigger(self, table: str) -> None:
        if self.trigger_exists(table):
            self.triggers[table] = False


class FakeKafka(ErrorGenerator, TopicStore):
    """test_dummies.clj:108-142 — topics: name→list of {key,value}."""

    def __init__(self) -> None:
        super().__init__()
        self.topics: dict[str, list[dict[str, Any]]] = {}

    def topic_exists(self, topic: str) -> bool:
        return topic in self.topics

    def create_topic(self, topic: str) -> None:
        if not self.topic_exists(topic):
            self._maybe_error("create-topic", topic, self.topics)
            self.topics[topic] = []

    def clear_topic(self, topic: str) -> None:
        if self.topic_exists(topic):
            self.topics[topic] = []

    def send(self, topic: str, value: Any, key: Any | None = None) -> None:
        if not self.topic_exists(topic):
            raise GeneratedTestError(f"invalid topic {topic}")
        self._maybe_error("send", topic, key, value, self.topics[topic])
        self.topics[topic].append({"key": key, "value": value})


class FakeSeedStore(ErrorGenerator, SeedStore):
    """test_dummies.clj:85-106 — seeds: table→list of seed messages."""

    def __init__(self) -> None:
        super().__init__()
        self.seed_data: dict[str, list[Any]] = {}

    def record_count(self, table: str) -> int:
        return len(self.seed_data.get(table, []))

    def seeds(self, table: str, table_alias: str | None = None) -> Iterator[Any]:
        self._maybe_error("to-chan", table, self.seed_data)
        yield from self.seed_data.get(table, [])
