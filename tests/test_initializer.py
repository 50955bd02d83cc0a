"""End-to-end control-plane tests: catch-up compaction, sequential
processing, status emission to the control log, and the streaming tail.

Covers reference behaviors A1-A8 (initializer.clj:27-110) over the
file-backed implementations — a full Kafka-less run of the service loop.
"""

from __future__ import annotations

import json
import time
from datetime import datetime, timedelta, timezone

import pytest

from cdc_init_spark.streaming.control_log import (
    FileControlLog,
    ccds_to_initialize,
    last_known_states,
)
from cdc_init_spark.streaming.initializer import Initializer
from cdc_init_spark.streaming.model import CCD, STATUS_SUBMITTED
from cdc_init_spark.streaming.snapshot import SparkSeedStore
from cdc_init_spark.sources.local import FileChangeDataStore, FileTopicStore
from tests.fakes import FakeDatabase, FakeKafka, FakeSeedStore

T0 = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _ccd(i: int, status: str = STATUS_SUBMITTED, minute: int = 0) -> CCD:
    return CCD(
        table=f"s.table_{i}",
        queue=f"queue_{i}",
        queue_table=f"qt_{i}",
        status=status,
        timestamp=T0 + timedelta(minutes=minute),
    )


def test_catchup_compaction_and_filter(spark, tmp_path):
    """A1+A2+A3: latest state per key wins; active/error keys dropped;
    backlog sorted by timestamp (initializer.clj:27-39,97)."""
    log = FileControlLog(str(tmp_path / "control"))
    # table_1: submitted → active (must be dropped)
    log.append(_ccd(1, "submitted", 0))
    log.append(_ccd(1, "active", 1))
    # table_2: submitted later than table_3 (sort check)
    log.append(_ccd(2, "submitted", 10))
    log.append(_ccd(3, "submitted", 5))
    # table_4: error (dropped)
    log.append(_ccd(4, "error", 2))
    # table_5: submitted → prepared (stays, latest state is prepared)
    log.append(_ccd(5, "submitted", 3))
    log.append(_ccd(5, "prepared", 4))

    compacted = last_known_states(log.read(spark))
    assert compacted.count() == 5  # one row per table

    backlog = ccds_to_initialize(log.read(spark)).collect()
    tables = [r["table"] for r in backlog]
    assert tables == ["s.table_5", "s.table_3", "s.table_2"]


def test_initializer_catch_up_with_fakes(spark, tmp_path):
    """Full backlog run: terminal active states, per-step statuses
    appended to the control log, seeds landed in the topic."""
    log = FileControlLog(str(tmp_path / "control"))
    db, kafka, ss = FakeDatabase(), FakeKafka(), FakeSeedStore()
    ss.seed_data["s.table_1"] = [{"key": "k1", "value": "v1"}]
    log.append(_ccd(1))
    ini = Initializer(log, db, ss, kafka)
    results = ini.catch_up(spark)
    assert [r.status for r in results] == ["active"]
    assert kafka.topics["queue_1"] == [{"key": "k1", "value": "v1"}]
    # every intermediate state was published back (A24)
    statuses = [m["status"] for m in _log_statuses(log)]
    assert statuses[0] == "submitted"
    assert "prepared" in statuses and statuses[-1] == "active"
    # re-running catch_up is a no-op: the key's last state is active now
    assert ini.catch_up(spark) == []


def test_initializer_invalid_ccd_goes_to_error(spark, tmp_path):
    """A6 (initializer.clj:51-56): invalid spec → error status with
    message 'invalid specification'."""
    log = FileControlLog(str(tmp_path / "control"))
    db, kafka, ss = FakeDatabase(), FakeKafka(), FakeSeedStore()
    bad = CCD(table="unqualified", queue="q", queue_table="qt",
              status=STATUS_SUBMITTED, timestamp=T0)
    log.append(bad)
    ini = Initializer(log, db, ss, kafka)
    results = ini.catch_up(spark)
    assert results[0].status == "error"
    assert results[0].error["message"] == "invalid specification"


def test_initializer_end_to_end_file_stores(spark, tmp_path):
    """The whole service loop against file-backed stores and a real
    Spark seed scan of a fixture table."""
    from cdc_init_spark.tables import load_table

    log = FileControlLog(str(tmp_path / "control"))
    db = FileChangeDataStore(str(tmp_path / "cdstore"))
    topics = FileTopicStore(str(tmp_path / "topics"))
    ss = SparkSeedStore(
        resolve=lambda t: load_table(spark, "/root/testdata/sf0.001", "nation"),
        pk_resolver=lambda t: ["n_nationkey"],
    )
    ccd = CCD(table="s.nation", queue="nation_q", queue_table="nation_qt",
              status=STATUS_SUBMITTED, timestamp=T0)
    log.append(ccd)
    ini = Initializer(log, db, ss, topics)
    results = ini.catch_up(spark)
    assert results[0].status == "active"
    assert db.trigger_enabled("s.nation")
    msgs = topics.read_messages("nation_q")
    assert len(msgs) == 25
    parsed = json.loads(msgs[0]["value"])
    assert parsed["type"] == "insert" and parsed["table"] == "s.nation"
    assert msgs[0]["key"].startswith('["n_nationkey",')
    # progress states were recorded on the control log (A22)
    seeding = [m for m in _log_statuses(log) if m["status"] == "seeding"]
    assert seeding and seeding[0]["progress"] == [0, 25]


def test_control_log_compaction(spark, tmp_path):
    """File-log compaction keeps exactly the latest state per key and the
    backlog computed afterwards is unchanged."""
    log = FileControlLog(str(tmp_path / "control"))
    log.append(_ccd(1, "submitted", 0))
    log.append(_ccd(1, "prepared", 1))
    log.append(_ccd(1, "active", 2))
    log.append(_ccd(2, "submitted", 3))
    before = ccds_to_initialize(log.read(spark)).collect()
    removed = log.compact(spark)
    assert removed == 2  # table_1's two superseded states
    after_df = log.read(spark)
    assert after_df.count() == 2
    after = ccds_to_initialize(after_df).collect()
    assert [r["table"] for r in before] == [r["table"] for r in after]
    # appends continue past the surviving max offset
    log.append(_ccd(3, "submitted", 4))
    offs = [r["offset"] for r in log.read(spark).collect()]
    assert len(offs) == len(set(offs))


@pytest.mark.slow
def test_streaming_tail_processes_new_submissions(spark, tmp_path):
    """A4/A8: the live tail picks up new `submitted` CCDs, skips
    everything already caught up, and processes in order."""
    log = FileControlLog(str(tmp_path / "control"))
    db, kafka, ss = FakeDatabase(), FakeKafka(), FakeSeedStore()
    # pre-existing, already-active CCD — must NOT be reprocessed by tail
    log.append(_ccd(1, "active", 0))
    ini = Initializer(log, db, ss, kafka)
    ini.catch_up(spark)
    q = ini.start_tail(spark, str(tmp_path / "chk"), poll_interval="250 milliseconds")
    try:
        ss.seed_data["s.table_7"] = [{"key": "a", "value": "b"}]
        log.append(_ccd(7, "submitted", 20))
        deadline = time.time() + 30
        while time.time() < deadline:
            q.processAllAvailable()
            if "queue_7" in kafka.topics and kafka.topics["queue_7"]:
                break
            time.sleep(0.2)
        assert kafka.topics.get("queue_7") == [{"key": "a", "value": "b"}]
        assert db.trigger_enabled("s.table_7")
        assert "queue_1" not in kafka.topics  # active CCD untouched
    finally:
        ini.stop()


@pytest.mark.slow
def test_streaming_tail_restart_no_reprocess(spark, tmp_path):
    """Restarting the tail from its checkpoint does not re-seed CCDs the
    previous incarnation already processed (at-least-once emission into a
    compacted log = the reference's restart behavior, initializer.clj:27-39)."""
    log = FileControlLog(str(tmp_path / "control"))
    db, kafka, ss = FakeDatabase(), FakeKafka(), FakeSeedStore()
    chk = str(tmp_path / "chk")
    ini = Initializer(log, db, ss, kafka)
    ini.catch_up(spark)
    q = ini.start_tail(spark, chk, poll_interval="200 milliseconds")
    ss.seed_data["s.table_9"] = [{"key": "k", "value": "v"}]
    log.append(_ccd(9, "submitted", 1))
    q.processAllAvailable()
    ini.stop()
    assert kafka.topics["queue_9"] == [{"key": "k", "value": "v"}]
    # restart from the same checkpoint: nothing new → no duplicate seeding
    ini2 = Initializer(log, db, ss, kafka)
    ini2._caught_up_to = ini._caught_up_to
    q2 = ini2.start_tail(spark, chk, poll_interval="200 milliseconds")
    q2.processAllAvailable()
    ini2.stop()
    assert kafka.topics["queue_9"] == [{"key": "k", "value": "v"}]


def _log_statuses(log: FileControlLog):
    import glob
    import json as _json

    out = []
    for path in sorted(glob.glob(log.path + "/*.jsonl")):
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                if line.strip():
                    out.append(_json.loads(line))
    return out
