"""CDC apply semantics: last-change-wins merge of DML messages onto a
snapshot (streaming/apply)."""

from __future__ import annotations

from datetime import datetime

from cdc_init_spark.streaming.apply import apply_changes, compact_changes


def _ts(minute):
    return datetime(2026, 1, 1, 12, minute)


def test_apply_changes_full_vocabulary(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "name", "bal"]
    )
    changes = spark.createDataFrame(
        [
            # key 1: update then delete → gone
            (1, _ts(1), "update", "a2", 11.0),
            (1, _ts(2), "delete", None, None),
            # key 2: delete then update → resurrected with new values
            (2, _ts(1), "delete", None, None),
            (2, _ts(2), "update", "b2", 22.0),
            # key 4: pure insert of a new key
            (4, _ts(1), "insert", "d", 40.0),
        ],
        ["id", "ts", "type", "name", "bal"],
    )
    got = {
        r["id"]: (r["name"], r["bal"])
        for r in apply_changes(base, changes, ["id"]).collect()
    }
    assert got == {2: ("b2", 22.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_apply_changes_idempotent_replay(spark):
    """Replaying the same change set produces the same state (the
    compacted-topic property the reference relies on, core.clj:161)."""
    base = spark.createDataFrame([(1, 1.0)], ["id", "v"])
    changes = spark.createDataFrame(
        [(1, _ts(1), "update", 2.0), (2, _ts(1), "insert", 9.0)],
        ["id", "ts", "type", "v"],
    )
    once = apply_changes(base, changes, ["id"])
    twice = apply_changes(once, changes, ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_compact_changes_latest_wins(spark):
    changes = spark.createDataFrame(
        [(1, _ts(1), "update", 1.0), (1, _ts(3), "update", 3.0), (1, _ts(2), "update", 2.0)],
        ["id", "ts", "type", "v"],
    )
    rows = compact_changes(changes, ["id"], "ts").collect()
    assert len(rows) == 1 and rows[0]["v"] == 3.0
