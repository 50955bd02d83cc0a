"""Property + example tests of the prepare/initialize pipelines.

Port of the reference's suite (reference: test/cdc_init/core_test.clj:1-249)
to pytest + hypothesis over the in-memory fakes (tests/fakes.py).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_init_spark.streaming.core import initialize, prepare
from cdc_init_spark.streaming.model import CCD, check_ccd
from tests.fakes import FakeDatabase, FakeKafka, FakeSeedStore

SETTLE = settings(
    max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

# -- generators (mirroring cdc-util's gen-change-capture-def and
#    gen-seeds, as exercised by core_test.clj) ---------------------------

ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12
).filter(lambda s: not s.startswith("_"))


@st.composite
def ccds(draw):
    schema = draw(ident)
    table = draw(ident)
    return CCD(
        table=f"{schema}.{table}",
        queue=draw(ident),
        queue_table=draw(ident),
        table_alias=None,
        status="submitted",
        timestamp=datetime.now(timezone.utc),
    )


seed_values = st.one_of(
    st.none(), st.booleans(), st.text(max_size=8), st.integers(-1000, 1000)
)
seed_maps = st.fixed_dictionaries(
    {"key": st.text(min_size=1, max_size=8), "value": st.text(min_size=1, max_size=8)}
)
seeds_lists = st.lists(seed_maps, max_size=30)


def run_all(gen):
    return list(gen)


PREPARATION_STATES = sorted(
    ["prepared", "queue-created", "topic-created", "trigger-created"]
)


# -- prepare (core_test.clj:49-124) --------------------------------------

@SETTLE
@given(ccd=ccds())
def test_preparation(ccd):
    """core_test.clj:49-61: preparation creates all objects, ends
    :prepared, stamps a fresh timestamp."""
    db, kafka = FakeDatabase(), FakeKafka()
    start = datetime.now(timezone.utc)
    states = run_all(prepare(ccd, db, kafka))
    last = states[-1]
    assert db.queue_exists(ccd.queue)
    assert db.trigger_exists(ccd.table)
    assert kafka.topic_exists(ccd.queue)
    assert last.status == "prepared"
    assert start <= last.timestamp <= datetime.now(timezone.utc)


def test_preparation_records_actions():
    """core_test.clj:63-66: every creation step emits its event."""
    db, kafka = FakeDatabase(), FakeKafka()
    ccd = CCD(table="s.t", queue="q", queue_table="qt")
    states = run_all(prepare(ccd, db, kafka))
    assert sorted(s.status for s in states) == PREPARATION_STATES


@SETTLE
@given(ccd=ccds(), existing=st.sampled_from(["queue", "trigger", "topic"]))
def test_preparation_only_records_required_actions(ccd, existing):
    """core_test.clj:68-79: pre-existing objects don't re-emit creation."""
    db, kafka = FakeDatabase(), FakeKafka()
    if existing == "queue":
        db.create_queue(ccd.queue, ccd.queue_table)
    elif existing == "trigger":
        db.create_trigger(ccd.table, ccd.queue, ccd.table_alias)
    else:
        kafka.create_topic(ccd.queue)
    exp = sorted(s for s in PREPARATION_STATES if not s.startswith(existing))
    states = run_all(prepare(ccd, db, kafka))
    assert sorted(s.status for s in states) == exp


def test_preparation_clears_queue():
    """core_test.clj:81-92."""
    db, kafka = FakeDatabase(), FakeKafka()
    ccd = CCD(table="s.t", queue="q", queue_table="qt")
    db.create_queue(ccd.queue, ccd.queue_table)
    db.queues[ccd.queue] = [1, 2, 3]
    last = run_all(prepare(ccd, db, kafka))[-1]
    assert last.status == "prepared"
    assert db.queue_exists(ccd.queue)
    assert db.queues[ccd.queue] == []


def test_preparation_clears_topic():
    """core_test.clj:94-105."""
    db, kafka = FakeDatabase(), FakeKafka()
    ccd = CCD(table="s.t", queue="q", queue_table="qt")
    kafka.create_topic(ccd.queue)
    kafka.topics[ccd.queue] = [1, 2, 3]
    last = run_all(prepare(ccd, db, kafka))[-1]
    assert last.status == "prepared"
    assert kafka.topic_exists(ccd.queue)
    assert kafka.topics[ccd.queue] == []


def test_preparation_disables_trigger():
    """core_test.clj:107-116."""
    db, kafka = FakeDatabase(), FakeKafka()
    ccd = CCD(table="s.t", queue="q", queue_table="qt")
    db.create_trigger(ccd.table, ccd.queue)
    db.enable_trigger(ccd.table)
    last = run_all(prepare(ccd, db, kafka))[-1]
    assert last.status == "prepared"
    assert db.trigger_exists(ccd.table)
    assert db.triggers[ccd.table] is False


@SETTLE
@given(
    ccd=ccds(),
    evt=st.sampled_from(["create-queue", "create-trigger", "create-topic"]),
)
def test_preparation_captures_errors(ccd, evt):
    """core_test.clj:118-124: any step failure → terminal :error state."""
    db, kafka = FakeDatabase(), FakeKafka()
    (kafka if evt == "create-topic" else db).error_on(evt)
    last = run_all(prepare(ccd, db, kafka))[-1]
    assert last.status == "error"
    assert last.error is not None and last.error["message"]


# -- initialize (core_test.clj:129-249) ----------------------------------

def _prepared(ccd, db, kafka):
    run_all(prepare(ccd, db, kafka))


@SETTLE
@given(ccd=ccds(), seeds=seeds_lists)
def test_initialize_fills_topic_with_seeds(ccd, seeds):
    """core_test.clj:129-139: seeds land in the topic exactly, in order."""
    db, kafka, ss = FakeDatabase(), FakeKafka(), FakeSeedStore()
    ss.seed_data[ccd.table] = seeds
    _prepared(ccd, db, kafka)
    run_all(initialize(ccd, kafka, ss, db))
    assert kafka.topics[ccd.queue] == seeds


@SETTLE
@given(
    ccd=ccds(),
    seeds=st.lists(st.one_of(seed_maps, st.text(min_size=1, max_size=8)), max_size=20),
)
def test_initialize_handles_map_and_non_map_seeds(ccd, seeds):
    """core_test.clj:141-155: non-map seeds are sent unkeyed."""
    db, kafka, ss = FakeDatabase(), FakeKafka(), FakeSeedStore()
    ss.seed_data[ccd.table] = seeds
    _prepared(ccd, db, kafka)
    run_all(initialize(ccd, kafka, ss, db))
    exp = [s if isinstance(s, dict) else {"key": None, "value": s} for s in seeds]
    assert kafka.topics[ccd.queue] == exp


@SETTLE
@given(ccd=ccds(), seeds=seeds_lists)
def test_initialize_ends_in_active_status(ccd, seeds):
    """core_test.clj:157-169."""
    db, kafka, ss = FakeDatabase(), FakeKafka(), FakeSeedStore()
    ss.seed_data[ccd.table] = seeds
    _prepared(ccd, db, kafka)
    assert run_all(initialize(ccd, kafka, ss, db))[-1].status == "active"


@SETTLE
@given(ccd=ccds())
def test_initialize_enables_trigger(ccd):
    """core_test.clj:171-179."""
    db, kafka, ss = FakeDatabase(), FakeKafka(), FakeSeedStore()
    _prepared(ccd, db, kafka)
    run_all(initialize(ccd, kafka, ss, db))
    assert db.trigger_enabled(ccd.table)


def test_initialize_disables_trigger_on_error():
    """core_test.clj:181-186: compensation on seed failure."""
    db, kafka, ss = FakeDatabase(), FakeKafka(), FakeSeedStore()
    ccd = CCD(table="s.t", queue="q", queue_table="qt")
    _prepared(ccd, db, kafka)
    ss.error_on("to-chan")
    ss.seed_data[ccd.table] = [{"key": "k", "value": "v"}]
    run_all(initialize(ccd, kafka, ss, db))
    assert not db.trigger_enabled(ccd.table)


@SETTLE
@given(ccd=ccds(), seeds=st.lists(seed_maps, min_size=1, max_size=20), data=st.data())
def test_initialize_captures_send_errors(ccd, seeds, data):
    """core_test.clj:188-203: mid-stream send failure → :error terminal."""
    i = data.draw(st.integers(0, max(0, len(seeds) - 1)))
    db, kafka, ss = FakeDatabase(), FakeKafka(), FakeSeedStore()
    _prepared(ccd, db, kafka)
    ss.seed_data[ccd.table] = seeds

    def fail_when_full(_topic, _key, _value, contents):
        if len(contents) >= i:
            raise RuntimeError("topic full")

    kafka.error_on("send", fail_when_full)
    last = run_all(initialize(ccd, kafka, ss, db))[-1]
    assert last.status == "error"
    assert last.error is not None


# -- progress contract (core_test.clj:205-249) ---------------------------

def _seeding_states(n_seeds):
    db, kafka, ss = FakeDatabase(), FakeKafka(), FakeSeedStore()
    ccd = CCD(table="s.t", queue="q", queue_table="qt")
    ss.seed_data[ccd.table] = [
        {"key": f"k{i}", "value": f"v{i}"} for i in range(n_seeds)
    ]
    _prepared(ccd, db, kafka)
    return run_all(initialize(ccd, kafka, ss, db))


def test_initialize_reports_seeding_progress():
    """core_test.clj:205-232: seeding states precede :active, have the
    right total, strictly increasing counts, at least one positive."""
    states = _seeding_states(100)
    seeding = states[:-1]
    assert len(seeding) > 0
    assert all(s.status == "seeding" for s in seeding)
    assert all(s.progress is not None and s.progress[1] == 100 for s in seeding)
    counts = [s.progress[0] for s in seeding]
    assert any(c > 0 for c in counts)
    assert all(x < y for x, y in zip(counts, counts[1:]))


def test_initialize_from_no_seeds_reports_no_progress():
    """core_test.clj:234-239."""
    states = _seeding_states(0)
    assert all(s.status != "seeding" for s in states)


def test_initialize_reports_progress_every_two_pcnt_at_most():
    """core_test.clj:241-249: ≤50 positive-count updates for 1000 rows."""
    states = _seeding_states(1000)
    positive = [
        s for s in states[:-1] if s.progress is not None and s.progress[0] > 0
    ]
    assert len(positive) <= 50


# -- validation gate (A6) ------------------------------------------------

def test_check_ccd_valid():
    assert check_ccd(CCD(table="s.good_table", queue="q", queue_table="qt")) is None


def test_check_ccd_missing_fields():
    err = check_ccd(CCD(table="", queue="", queue_table=None))
    assert err is not None and {"table", "queue", "queue_table"} <= set(err)


def test_check_ccd_unqualified_table():
    err = check_ccd(CCD(table="no_schema", queue="q", queue_table="qt"))
    assert err is not None and "table" in err


def test_check_ccd_alias_rule():
    """core.clj:50-54: alias required when table name > 22 chars."""
    long_name = "s." + "x" * 23
    assert check_ccd(CCD(table=long_name, queue="q", queue_table="qt")) is not None
    assert (
        check_ccd(
            CCD(table=long_name, queue="q", queue_table="qt", table_alias="short")
        )
        is None
    )
