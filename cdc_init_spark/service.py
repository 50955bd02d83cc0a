"""Service wiring + lifecycle — the reference's system/main
(reference: src/cdc_init/system.clj:15-25, src/cdc_init/main.clj:42-45):
build the component graph from environment config, start catch-up then the
live tail, stop everything on shutdown.

Spark-native composition: the "database" is a SparkSession; the stores are
file- or Kafka-backed per config; the initializer is the sequential CCD
processor over the control log. A shutdown hook stops the streaming query
gracefully (main.clj's `component/stop` hook equivalent).

Environment (mirroring the reference's environ-style config,
README.md:67-86):
  CDC_SPARK_MASTER      spark master (default local[*])
  CDC_CONTROL_LOG       control-log location: dir path (file log) or
                        kafka://bootstrap/topic
  CDC_TOPIC_ROOT        file topic-store root (ignored for kafka://)
  CDC_STORE_ROOT        change-data-store state root
  CDC_CHECKPOINT_DIR    streaming checkpoint dir
  CDC_SOURCE_ROOT       directory of <table>.parquet snapshot sources
  CDC_SOURCE_PKS        comma list of table=pk1+pk2 primary-key specs
"""

from __future__ import annotations

import atexit
import logging
import os
import signal
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from cdc_init_spark.session import get_spark
from cdc_init_spark.sources.local import FileChangeDataStore, FileTopicStore
from cdc_init_spark.streaming.control_log import (
    DEFAULT_CONTROL_TOPIC,
    ControlLog,
    FileControlLog,
    KafkaControlLog,
)
from cdc_init_spark.streaming.initializer import Initializer
from cdc_init_spark.streaming.snapshot import SparkSeedStore

log = logging.getLogger(__name__)


@dataclass
class ServiceConfig:
    master: str = "local[*]"
    control_log: str = "/tmp/cdc-init-spark/control"
    topic_root: str = "/tmp/cdc-init-spark/topics"
    store_root: str = "/tmp/cdc-init-spark/store"
    checkpoint_dir: str = "/tmp/cdc-init-spark/checkpoints"
    source_root: str = "/tmp/cdc-init-spark/sources"
    source_pks: dict[str, list[str]] = field(default_factory=dict)

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "ServiceConfig":
        e = dict(os.environ if env is None else env)
        pks: dict[str, list[str]] = {}
        for spec in filter(None, e.get("CDC_SOURCE_PKS", "").split(",")):
            table, _, cols = spec.partition("=")
            pks[table.strip()] = [c for c in cols.split("+") if c]
        return cls(
            master=e.get("CDC_SPARK_MASTER", cls.master),
            control_log=e.get("CDC_CONTROL_LOG", cls.control_log),
            topic_root=e.get("CDC_TOPIC_ROOT", cls.topic_root),
            store_root=e.get("CDC_STORE_ROOT", cls.store_root),
            checkpoint_dir=e.get("CDC_CHECKPOINT_DIR", cls.checkpoint_dir),
            source_root=e.get("CDC_SOURCE_ROOT", cls.source_root),
            source_pks=pks,
        )


class Service:
    """The running system (system.clj's component map)."""

    def __init__(self, config: ServiceConfig, spark: SparkSession | None = None):
        self.config = config
        self.spark = spark or get_spark(
            app_name="cdc-init-spark-service", master=config.master
        )
        self.control_log = self._make_control_log(config)
        self.topic_store = FileTopicStore(config.topic_root)
        self.change_data_store = FileChangeDataStore(config.store_root)
        self.seed_store = SparkSeedStore(
            resolve=self._resolve_source, pk_resolver=self._resolve_pks
        )
        self.initializer = Initializer(
            self.control_log,
            self.change_data_store,
            self.seed_store,
            self.topic_store,
        )
        self._started = False

    def _make_control_log(self, config: ServiceConfig) -> ControlLog:
        if config.control_log.startswith("kafka://"):
            rest = config.control_log[len("kafka://"):]
            bootstrap, _, topic = rest.partition("/")
            return KafkaControlLog(bootstrap, topic or DEFAULT_CONTROL_TOPIC)
        return FileControlLog(config.control_log)

    def _resolve_source(self, table: str) -> DataFrame:
        """`schema.table` → parquet under source_root by bare table name."""
        from cdc_init_spark.functions.identifiers import strip_schema

        bare = strip_schema(table).strip('"').lower()
        return self.spark.read.parquet(
            os.path.join(self.config.source_root, f"{bare}.parquet")
        )

    def _resolve_pks(self, table: str) -> list[str]:
        from cdc_init_spark.functions.identifiers import strip_schema

        bare = strip_schema(table).strip('"').lower()
        try:
            return self.config.source_pks[bare]
        except KeyError:
            raise KeyError(
                f"no primary-key spec for {table!r}; set CDC_SOURCE_PKS"
            ) from None

    # -- lifecycle (main.clj:42-45) ---------------------------------------

    def start(self):
        """Catch up on the backlog, then tail live submissions."""
        results = self.initializer.catch_up(self.spark)
        log.info("catch-up processed %d CCDs", len(results))
        self.initializer.start_tail(self.spark, self.config.checkpoint_dir)
        self._started = True
        return results

    def stop(self) -> None:
        if self._started:
            self.initializer.stop()
            self._started = False

    def install_shutdown_hook(self) -> "threading.Event":
        """Register SIGTERM/SIGINT + atexit. The signal handler ONLY sets
        an event — calling into py4j from a signal frame while the main
        thread blocks in awaitTermination corrupts the gateway stream
        (reentrant read). run_forever polls the event and stops cleanly."""
        import threading

        stop_requested = threading.Event()
        atexit.register(self.stop)
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, lambda *_: stop_requested.set())
            except ValueError:  # non-main thread
                pass
        self._stop_requested = stop_requested
        return stop_requested

    def run_forever(self, poll_seconds: float = 1.0) -> None:
        """Block until the tail dies or a shutdown signal arrives, then
        stop gracefully (main.clj's started-system + shutdown hook)."""
        ev = getattr(self, "_stop_requested", None) or self.install_shutdown_hook()
        q = self.initializer._query
        while not ev.is_set():
            if q.awaitTermination(poll_seconds):
                break
        self.stop()


def main() -> None:  # pragma: no cover — exercised by the smoke test
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)-5s [%(name)s] %(message)s"
    )
    svc = Service(ServiceConfig.from_env())
    svc.install_shutdown_hook()
    svc.start()
    svc.run_forever()


if __name__ == "__main__":
    main()
