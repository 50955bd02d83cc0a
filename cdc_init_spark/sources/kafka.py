"""Kafka-backed TopicStore (reference A14/A15/A21 — components/
topic_store.clj).

Deployment-shape implementation of the TopicStore protocol on Kafka:
- create_topic with the reference's config: 1 partition (total order per
  captured table), cleanup.policy=compact + min.cleanable.dirty.ratio=0.75
  (last-value-wins per PK key), replication min(3, #brokers)
  (topic_store.clj:13-16,29-33);
- clear_topic as delete → poll-for-disappearance with cubic backoff →
  recreate (topic_store.clj:72-82);
- send via Spark's Kafka sink; bulk ``send_frame`` for the data plane.

Admin operations use the JVM Kafka AdminClient through py4j — available
whenever the spark-sql-kafka connector (which bundles kafka-clients) is on
the classpath. Constructing the store without it raises a clear error, so
connector-less local environments never break at import time.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from cdc_init_spark.streaming.progress import retry_with_backoff
from cdc_init_spark.streaming.stores import TopicStore

CONTROL_TOPIC_CONFIG = {
    "cleanup.policy": "compact",
    "min.cleanable.dirty.ratio": "0.75",
}


class KafkaTopicStore(TopicStore):
    def __init__(
        self,
        spark: SparkSession,
        bootstrap_servers: str,
        partitions: int = 1,
        replication: int | None = None,
    ) -> None:
        self.spark = spark
        self.bootstrap = bootstrap_servers
        self.partitions = partitions
        self._replication = replication
        self._admin = self._make_admin()

    # -- JVM admin client plumbing ----------------------------------------

    def _make_admin(self) -> Any:
        jvm = self.spark.sparkContext._jvm
        try:
            props = jvm.java.util.Properties()
            props.setProperty("bootstrap.servers", self.bootstrap)
            return jvm.org.apache.kafka.clients.admin.AdminClient.create(props)
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                "Kafka admin client unavailable — the spark-sql-kafka "
                "connector (and kafka-clients) must be on the Spark "
                "classpath; use FileTopicStore for connector-less runs"
            ) from e

    def _broker_count(self) -> int:
        nodes = self._admin.describeCluster().nodes().get()
        return nodes.size()

    def replication_factor(self) -> int:
        """min(3, #brokers) — topic_store.clj:29-33."""
        if self._replication is not None:
            return self._replication
        return min(3, self._broker_count())

    # -- TopicStore protocol ----------------------------------------------

    def topic_exists(self, topic: str) -> bool:
        names = self._admin.listTopics().names().get()
        return names.contains(topic)

    def create_topic(self, topic: str) -> None:
        jvm = self.spark.sparkContext._jvm
        new_topic = jvm.org.apache.kafka.clients.admin.NewTopic(
            topic, self.partitions, self.replication_factor()
        )
        cfg = jvm.java.util.HashMap()
        for k, v in CONTROL_TOPIC_CONFIG.items():
            cfg.put(k, v)
        new_topic.configs(cfg)
        topics = jvm.java.util.Collections.singletonList(new_topic)
        self._admin.createTopics(topics).all().get()

    def clear_topic(self, topic: str) -> None:
        """Delete → poll until gone (cubic backoff, ≤10 attempts,
        topic_store.clj:72-82) → recreate."""
        jvm = self.spark.sparkContext._jvm
        names = jvm.java.util.Collections.singletonList(topic)
        self._admin.deleteTopics(names).all().get()
        if not retry_with_backoff(lambda: not self.topic_exists(topic)):
            raise TimeoutError(f"topic {topic!r} did not disappear after delete")
        self.create_topic(topic)

    def send(self, topic: str, value: Any, key: Any | None = None) -> None:
        df = self.spark.createDataFrame(
            [(None if key is None else str(key), str(value))],
            "key string, value string",  # explicit: null keys are legal
        )
        self.send_frame(topic, df)

    def send_frame(self, topic: str, frame: DataFrame) -> None:
        """Bulk keyed write — executors produce directly to the brokers;
        acks are batch-atomic (the documented weaker form of the
        reference's per-record future deref, core.clj:173-174)."""
        (
            frame.write.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("topic", topic)
            .save()
        )
