"""External-system integration contracts (VERDICT r5 "Next round" item 6).

The S3/S4/S5/S7 rows of SURVEY §2 are exercised against mocks and file
twins in this sandbox because it has no broker and no network database.
This module makes those claims FALSIFIABLE instead of merely asserted:

- **Derby-embedded JDBC (runs HERE, always)** — pyspark bundles Apache
  Derby, a real JDBC engine running embedded in the local JVM, so the S3
  partitioned-scan contract executes for real in this sandbox: write a
  table over JDBC, read it back with ``read_jdbc_partitioned`` and
  assert content equality, the requested parallelism, and range-predicate
  pushdown into the per-partition queries.

- **Kafka (skipif-gated on ``KAFKA_BOOTSTRAP``)** — the
  create→configs→send-keyed→read-earliest→clear lifecycle mirroring
  ``components/topic_store.clj:29-88`` (compact cleanup policy,
  min(3, brokers) replication, delete→poll→recreate), the batch scan
  (S4), the streaming source (S5) and the keyed sink framing (S7).
  These skip in this sandbox forever; the point is the contract is
  executable the day an environment exists
  (``KAFKA_BOOTSTRAP=host:9092 pytest tests/test_integration_external.py``).

- **Network JDBC (skipif-gated on ``JDBC_URL``)** — the same S3
  partitioned read against a real server-mode database
  (``JDBC_URL='jdbc:postgresql://...' JDBC_TABLE=t JDBC_PART_COL=id``).
"""

from __future__ import annotations

import os

import pytest

KAFKA = os.environ.get("KAFKA_BOOTSTRAP")
JDBC_URL = os.environ.get("JDBC_URL")


# --------------------------------------------------------------------------
# Derby embedded: the S3 contract, executable in this sandbox
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """A real JDBC database (Apache Derby, embedded in the Spark JVM)
    seeded with a 1000-row table via Spark's own JDBC writer."""
    db = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db};create=true"
    rows = [(i, f"name-{i:04d}", float(i) * 1.5) for i in range(1000)]
    df = spark.createDataFrame(rows, "id INT, name STRING, score DOUBLE")
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "people")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_partitioned_read_derby(spark, derby_url):
    """S3 against a real JDBC engine: content round-trips exactly and
    the scan fans out into the requested number of range partitions."""
    from cdc_init_spark.sources.files import read_jdbc_partitioned

    got = read_jdbc_partitioned(
        spark,
        derby_url,
        "people",
        partition_column="id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    # the requested parallelism is real: 4 concurrent range cursors
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 1000
    back = {(r.id, r.name, r.score) for r in got.collect()}
    assert len(back) == 1000
    assert (42, "name-0042", 63.0) in back


def test_jdbc_partitioned_read_pushes_filter(spark, derby_url):
    """A post-read filter must reach the database as a pushed predicate
    (PushedFilters in the JDBC relation), not a Spark-side scan+drop."""
    from pyspark.sql import functions as F

    from cdc_init_spark.sources.files import read_jdbc_partitioned

    got = read_jdbc_partitioned(
        spark,
        derby_url,
        "people",
        partition_column="id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    ).filter(F.col("score") > 1200.0)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "score" in plan.lower(), plan
    assert got.count() == 199  # ids 801..999


def test_jdbc_partitioned_read_skewed_bounds_still_complete(spark, derby_url):
    """Bounds narrower than the data must NOT lose rows: Spark's first
    and last range partitions are unbounded (WHERE id < lo+stride OR
    id IS NULL / id >= hi-stride), the documented JDBC semantics the
    operator's docstring leans on."""
    from cdc_init_spark.sources.files import read_jdbc_partitioned

    got = read_jdbc_partitioned(
        spark,
        derby_url,
        "people",
        partition_column="id",
        lower_bound=400,
        upper_bound=600,
        num_partitions=3,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    assert got.count() == 1000


# --------------------------------------------------------------------------
# Kafka: executable the day a broker exists (skips cleanly here)
# --------------------------------------------------------------------------

kafka_gate = pytest.mark.skipif(
    not KAFKA,
    reason="no broker in this environment — set KAFKA_BOOTSTRAP=host:9092 "
    "to run the S4/S5/S7 + topic_store.clj lifecycle contract",
)


def _require_connector(spark):
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.kafka.clients.admin.AdminClient"
        )
    except Exception:  # noqa: BLE001
        pytest.skip(
            "KAFKA_BOOTSTRAP is set but the spark-sql-kafka connector is "
            "not on the classpath (add --packages org.apache.spark:"
            "spark-sql-kafka-0-10_2.13:<spark-version>)"
        )


@kafka_gate
def test_kafka_topic_lifecycle(spark):
    """A10-A15 against a real broker: create (compact config,
    min(3, brokers) replication), exists, clear (delete → poll-for-gone
    with cubic backoff → recreate) — topic_store.clj:29-88."""
    _require_connector(spark)
    from cdc_init_spark.sources.kafka import KafkaTopicStore

    store = KafkaTopicStore(spark, KAFKA)
    topic = "cdc_init_it_lifecycle"
    if store.topic_exists(topic):
        store.clear_topic(topic)
    else:
        store.create_topic(topic)
    assert store.topic_exists(topic)
    assert 1 <= store.replication_factor() <= 3
    # config contract: compaction on, the reference's dirty ratio
    jvm = spark.sparkContext._jvm
    res = jvm.org.apache.kafka.clients.admin.ConfigResource(
        jvm.org.apache.kafka.clients.admin.ConfigResource.Type.TOPIC, topic
    )
    cfg = (
        store._admin.describeConfigs(
            jvm.java.util.Collections.singletonList(res)
        )
        .all()
        .get()
        .get(res)
    )
    assert cfg.get("cleanup.policy").value() == "compact"
    assert cfg.get("min.cleanable.dirty.ratio").value() == "0.75"
    store.clear_topic(topic)
    assert store.topic_exists(topic)  # recreated empty


@kafka_gate
def test_kafka_keyed_send_and_batch_read(spark):
    """S7 sink framing + S4 batch scan: keyed records written through
    the store come back from startingOffsets=earliest with key/value
    preserved (the seed snapshot's keyed-sink contract,
    seed_store.clj:38-55)."""
    _require_connector(spark)
    from pyspark.sql import functions as F

    from cdc_init_spark.sources.kafka import KafkaTopicStore

    store = KafkaTopicStore(spark, KAFKA)
    topic = "cdc_init_it_roundtrip"
    if store.topic_exists(topic):
        store.clear_topic(topic)
    else:
        store.create_topic(topic)
    frame = spark.createDataFrame(
        [("k1", "v1"), ("k2", "v2"), ("k1", "v1b")], ["key", "value"]
    )
    store.send_frame(topic, frame)
    got = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(
            F.col("key").cast("string"), F.col("value").cast("string"), "offset"
        )
    )
    rows = {(r.key, r.value) for r in got.collect()}
    assert rows == {("k1", "v1"), ("k2", "v2"), ("k1", "v1b")}


@kafka_gate
def test_kafka_stream_source(spark, tmp_path):
    """S5: the same topic as a Structured Streaming source — earliest
    offsets drain into a memory sink via the control-log decode path."""
    _require_connector(spark)
    from cdc_init_spark.streaming.control_log import KafkaControlLog
    from cdc_init_spark.streaming.model import CCD

    log = KafkaControlLog(KAFKA, topic="cdc_init_it_stream")
    log.append(CCD(table="it.t1", queue="q", trigger="trg", status="prepared"))
    q = (
        log.read_stream(spark)
        .writeStream.format("memory")
        .queryName("it_kafka_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT table FROM it_kafka_stream").collect()
        assert any(r.table == "it.t1" for r in got)
    finally:
        q.stop()


# --------------------------------------------------------------------------
# Network JDBC: executable the day a database exists (skips cleanly here)
# --------------------------------------------------------------------------


@pytest.mark.skipif(
    not JDBC_URL,
    reason="no network database in this environment — set JDBC_URL (plus "
    "JDBC_TABLE/JDBC_PART_COL/JDBC_LO/JDBC_HI) to run the S3 contract "
    "against a real server; the Derby-embedded tests above cover the "
    "same operator in-process",
)
def test_jdbc_partitioned_read_network(spark):
    from cdc_init_spark.sources.files import read_jdbc_partitioned

    got = read_jdbc_partitioned(
        spark,
        JDBC_URL,
        os.environ["JDBC_TABLE"],
        partition_column=os.environ["JDBC_PART_COL"],
        lower_bound=int(os.environ.get("JDBC_LO", "0")),
        upper_bound=int(os.environ.get("JDBC_HI", "1000000")),
        num_partitions=int(os.environ.get("JDBC_PARTS", "8")),
    )
    assert got.rdd.getNumPartitions() == int(os.environ.get("JDBC_PARTS", "8"))
    assert got.count() >= 0  # contract: the partitioned scan completes
