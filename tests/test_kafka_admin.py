"""KafkaTopicStore admin-path parity tests against a mocked py4j surface
(VERDICT r1, "Next round" item 6): no broker exists in the sandbox, so the
reference behaviors of components/topic_store.clj:29-88 — create config
(compact, 1 partition, replication min(3, brokers)), the delete → poll →
recreate sequence with cubic backoff, and keyed send framing — are
asserted against fakes that mimic exactly the JVM calls the store makes.
"""

from __future__ import annotations

import pytest

from cdc_init_spark.sources import kafka as kafka_mod
from cdc_init_spark.sources.kafka import CONTROL_TOPIC_CONFIG, KafkaTopicStore


class _Future:
    def __init__(self, value=None):
        self._value = value

    def get(self):
        return self._value


class _Nodes:
    def __init__(self, n):
        self._n = n

    def size(self):
        return self._n


class _Names:
    def __init__(self, names):
        self._names = names

    def contains(self, t):
        return t in self._names


class _Wrap:
    """Mimics admin.listTopics()/describeCluster()/createTopics().all()."""

    def __init__(self, **attrs):
        self.__dict__.update(attrs)

    def __getattr__(self, item):  # .all(), .names(), .nodes() chains
        raise AttributeError(item)


class FakeAdmin:
    """Pure-Python stand-in for org.apache.kafka.clients.admin.AdminClient
    exposing only the calls KafkaTopicStore makes."""

    def __init__(self, brokers=5, delete_lag=0):
        self.brokers = brokers
        self.topics: dict[str, object] = {}
        self.created: list[object] = []
        self.deleted: list[str] = []
        # number of topic_exists polls a deleted topic stays visible for
        self.delete_lag = delete_lag
        self._lagging: dict[str, int] = {}

    def describeCluster(self):
        return _Wrap(nodes=lambda: _Future(_Nodes(self.brokers)))

    def listTopics(self):
        visible = set(self.topics)
        done = []
        for t, remaining in self._lagging.items():
            if remaining > 0:
                visible.add(t)
                self._lagging[t] = remaining - 1
            else:
                done.append(t)
        for t in done:
            del self._lagging[t]
        return _Wrap(names=lambda: _Future(_Names(visible)))

    def createTopics(self, topics):
        for nt in topics:
            self.created.append(nt)
            self.topics[nt.name] = nt
        return _Wrap(all=lambda: _Future(None))

    def deleteTopics(self, names):
        for t in names:
            self.deleted.append(t)
            self.topics.pop(t, None)
            if self.delete_lag:
                self._lagging[t] = self.delete_lag
        return _Wrap(all=lambda: _Future(None))


class FakeNewTopic:
    def __init__(self, name, partitions, replication):
        self.name = name
        self.partitions = partitions
        self.replication = replication
        self.config: dict[str, str] = {}

    def configs(self, cfg):
        self.config = dict(cfg)


class FakeJvm:
    """Attribute-path fake of the py4j JVM view for the classes the store
    touches (java.util.*, kafka admin)."""

    def __init__(self, admin):
        java_util = _Wrap(
            Properties=_Props,
            HashMap=_HashMap,
            Collections=_Wrap(singletonList=lambda x: [x]),
        )
        kafka_admin = _Wrap(
            AdminClient=_Wrap(create=lambda props: admin),
            NewTopic=FakeNewTopic,
        )
        self.java = _Wrap(util=java_util)
        self.org = _Wrap(
            apache=_Wrap(kafka=_Wrap(clients=_Wrap(admin=kafka_admin)))
        )


class _Props(dict):
    def setProperty(self, k, v):
        self[k] = v


class _HashMap(dict):
    def put(self, k, v):
        self[k] = v


class FakeSpark:
    def __init__(self, jvm):
        self.sparkContext = _Wrap(_jvm=jvm)


def make_store(admin, **kw) -> KafkaTopicStore:
    return KafkaTopicStore(FakeSpark(FakeJvm(admin)), "broker:9092", **kw)


def test_create_topic_reference_config():
    """topic_store.clj:13-16,29-33 — 1 partition, compact cleanup with
    dirty ratio 0.75, replication = min(3, #brokers)."""
    admin = FakeAdmin(brokers=5)
    store = make_store(admin)
    store.create_topic("change-data-capture")
    (nt,) = admin.created
    assert nt.name == "change-data-capture"
    assert nt.partitions == 1
    assert nt.replication == 3  # min(3, 5 brokers)
    assert nt.config == CONTROL_TOPIC_CONFIG
    assert nt.config["cleanup.policy"] == "compact"
    assert nt.config["min.cleanable.dirty.ratio"] == "0.75"


def test_replication_follows_small_clusters():
    assert make_store(FakeAdmin(brokers=1)).replication_factor() == 1
    assert make_store(FakeAdmin(brokers=2)).replication_factor() == 2
    assert make_store(FakeAdmin(brokers=9)).replication_factor() == 3
    assert make_store(FakeAdmin(), replication=7).replication_factor() == 7


def test_clear_topic_delete_poll_recreate(monkeypatch):
    """topic_store.clj:72-82 — delete, poll for disappearance under the
    cubic backoff schedule, then recreate with the same config."""
    admin = FakeAdmin(brokers=3, delete_lag=2)
    store = make_store(admin)
    store.create_topic("t1")
    admin.created.clear()

    slept: list[float] = []
    real = kafka_mod.retry_with_backoff

    def capturing(check, **kw):
        return real(check, sleep=slept.append)

    monkeypatch.setattr(kafka_mod, "retry_with_backoff", capturing)
    store.clear_topic("t1")
    assert admin.deleted == ["t1"]
    (nt,) = admin.created  # recreated after disappearance
    assert nt.name == "t1" and nt.config == CONTROL_TOPIC_CONFIG
    # two visible polls before disappearance → backoff(1), backoff(2):
    # max(2, 2*round(n^3/2)) = 2, 8 (topic_store.clj:21-27)
    assert slept == [2, 8]


def test_clear_topic_times_out_if_never_deleted(monkeypatch):
    from cdc_init_spark.streaming.progress import retry_with_backoff

    admin = FakeAdmin(delete_lag=10_000)
    store = make_store(admin)
    store.create_topic("t2")
    monkeypatch.setattr(
        kafka_mod,
        "retry_with_backoff",
        lambda check, **kw: retry_with_backoff(check, sleep=lambda s: None),
    )
    with pytest.raises(TimeoutError):
        store.clear_topic("t2")


def test_send_builds_keyed_frame(spark):
    """A21 (topic_store.clj:83-88): map seeds with key+value become keyed
    records; the frame shipped to the Kafka sink is (key, value) strings."""
    admin = FakeAdmin()
    store = make_store(admin)
    store.spark = spark  # real session for createDataFrame
    captured: dict = {}
    store.send_frame = lambda topic, frame: captured.update(
        topic=topic, rows=frame.collect(), cols=frame.columns
    )
    store.send("change-data-capture", '{"status":"seeding"}', key="[1,2]")
    assert captured["topic"] == "change-data-capture"
    assert captured["cols"] == ["key", "value"]
    assert captured["rows"][0]["key"] == "[1,2]"
    assert captured["rows"][0]["value"] == '{"status":"seeding"}'
    # unkeyed send → null key (reference's non-map seed path)
    store.send("change-data-capture", "v2")
    assert captured["rows"][0]["key"] is None
