"""Column-mapping schema evolution for DeltaLogFormat (VERDICT r8
item 2) — the Delta `columnMapping.mode=name` / Iceberg field-ID shape.

The invariant under test everywhere: a column's PHYSICAL (on-disk)
name is fixed at first write and NEVER reused, so

- RENAME is a metadata-only commit: zero bytes move, every
  already-written data/dv/cdc file stays readable, old versions time
  travel under their own mapping (read-after-rename ≡ read-before
  modulo the name);
- DROP retires the physical name: old versions still show the column,
  and a later re-add of the same logical name mints a FRESH physical
  name, so the retired bytes can never resurrect under it;
- file-skipping stats, partition directories, deletion-vector keys and
  change-data files all live in physical space and are rename-proof.
"""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cdc_init_spark.sources.delta_log import DeltaLogFormat


def _ts(minute):
    return datetime(2026, 1, 1, 12, minute)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _data_inodes(fmt, table):
    out = {}
    tdir = os.path.join(fmt.data_dir, table)
    for dirpath, _dirs, names in os.walk(tdir):
        for n in names:
            p = os.path.join(dirpath, n)
            out[os.path.relpath(p, tdir)] = os.stat(p).st_ino
    return out


def _mk(spark, tmp_path, **fmt_kwargs):
    fmt = DeltaLogFormat(str(tmp_path / "t"), **fmt_kwargs)
    fmt.init(
        {
            "acct": spark.createDataFrame(
                [(i, f"n{i}", float(i)) for i in range(1, 9)],
                "id long, name string, v double",
            )
        }
    )
    return fmt


def test_rename_is_metadata_only_and_reads_equal(spark, tmp_path):
    """The core law: rename moves ZERO bytes (every data file keeps its
    inode) and read-after ≡ read-before modulo the column name; time
    travel below the rename still shows the old name."""
    fmt = _mk(spark, tmp_path)
    fmt.append(
        "acct",
        spark.createDataFrame([(9, "n9", 9.0)], "id long, name string, v double"),
    )
    before_rows = _rows(fmt.read(spark, "acct"))
    before_inodes = _data_inodes(fmt, "acct")
    v = fmt.rename_column("acct", "name", "customer_name")
    assert fmt.latest_version() == v
    assert _data_inodes(fmt, "acct") == before_inodes  # zero bytes moved
    after = fmt.read(spark, "acct")
    assert after.columns == ["id", "customer_name", "v"]
    assert _rows(after) == before_rows
    # time travel: each version reads under ITS OWN mapping
    old = fmt.read(spark, "acct", version=v - 1)
    assert old.columns == ["id", "name", "v"]
    assert _rows(old) == before_rows


def test_writes_after_rename_and_double_rename(spark, tmp_path):
    """Appends and merges address the NEW logical name; a second rename
    (including back to the original) keeps everything consistent."""
    fmt = _mk(spark, tmp_path)
    fmt.rename_column("acct", "name", "nm")
    fmt.append(
        "acct",
        spark.createDataFrame([(9, "n9", 9.0)], "id long, nm string, v double"),
    )
    ch = spark.createDataFrame(
        [(1, _ts(1), "update", "N1", 11.0), (2, _ts(1), "delete", None, None)],
        "id long, ts timestamp, type string, nm string, v double",
    )
    fmt.merge(spark, "acct", ch, ["id"])
    got = {r["id"]: r["nm"] for r in fmt.read(spark, "acct").collect()}
    assert got[1] == "N1" and 2 not in got and got[9] == "n9"
    # rename back: physical name unchanged, logical returns to 'name'
    fmt.rename_column("acct", "nm", "name")
    df = fmt.read(spark, "acct")
    assert df.columns == ["id", "name", "v"]
    assert {r["id"]: r["name"] for r in df.collect()}[1] == "N1"
    # appending under the OLD logical name now fails loudly
    with pytest.raises(ValueError, match="rename/drop/retype"):
        fmt.append(
            "acct",
            spark.createDataFrame(
                [(10, "x", 1.0)], "id long, nm string, v double"
            ),
        )


def test_file_skipping_survives_rename(spark, tmp_path):
    """Footer stats are physical-named: range scans, merges and
    predicate DML keep pruning after the column is renamed."""
    fmt = DeltaLogFormat(str(tmp_path / "t"))

    def chunk(lo, hi):
        return spark.createDataFrame(
            [(i, float(i)) for i in range(lo, hi)], "id long, v double"
        ).coalesce(1)

    fmt.init({"acct": chunk(1, 11)})
    for lo in (11, 21, 31):
        fmt.append("acct", chunk(lo, lo + 10))
    fmt.rename_column("acct", "id", "account_id")
    df, total, read = fmt.read_where(spark, "acct", "account_id", 12, 15)
    assert (total, read) == (4, 1)  # pruned down to the one range file
    assert _rows(df) == [(i, float(i)) for i in range(12, 16)]
    # merge file-skip: one key touches exactly one file
    ch = spark.createDataFrame(
        [(13, _ts(1), "update", 130.0)],
        "account_id long, ts timestamp, type string, v double",
    )
    fmt.merge(spark, "acct", ch, ["account_id"])
    assert fmt.last_merge_stats["candidates"] == 1
    assert fmt.last_merge_stats["touched"] == 1
    # where-only DELETE still derives pruning ranges under the new name
    fmt.delete(spark, "acct", {}, where="account_id = 35")
    assert fmt.last_rewrite_stats["candidates"] == 1
    assert 35 not in {r[0] for r in fmt.read(spark, "acct").collect()}


def test_rename_partition_column(spark, tmp_path):
    """Partition directories are physical-named, so a partition column
    renames freely; the spec follows the logical name and partition
    values still materialize (and prune) correctly."""
    fmt = DeltaLogFormat(str(tmp_path / "t"))
    fmt.init(
        {
            "ev": spark.createDataFrame(
                [(i, i % 3, float(i)) for i in range(12)],
                "id long, bucket int, v double",
            )
        },
        partition_by={"ev": ["bucket"]},
    )
    fmt.rename_column("ev", "bucket", "shard")
    assert fmt._snapshot().partition_cols["ev"] == ["shard"]
    df = fmt.read(spark, "ev")
    assert df.columns == ["id", "shard", "v"]
    assert sorted({r["shard"] for r in df.collect()}) == [0, 1, 2]
    _, total, read = fmt.read_where(spark, "ev", "shard", 1, 1)
    assert read < total  # partition-value stats still prune
    fmt.append(
        "ev",
        spark.createDataFrame([(99, 1, 9.9)], "id long, shard int, v double"),
    )
    assert (99, 1, 9.9) in _rows(fmt.read(spark, "ev"))


def test_drop_column_and_no_resurrection(spark, tmp_path):
    """THE drop law: the column disappears (metadata-only), old
    versions still show it, and re-adding the same logical name mints a
    fresh physical name — every pre-drop row reads the re-added column
    as NULL, never as the retired bytes."""
    fmt = _mk(spark, tmp_path)
    v_drop = fmt.drop_column("acct", "name")
    df = fmt.read(spark, "acct")
    assert df.columns == ["id", "v"]
    # time travel below the drop: the column is back
    old = fmt.read(spark, "acct", version=v_drop - 1)
    assert old.columns == ["id", "name", "v"]
    assert {r["id"]: r["name"] for r in old.collect()}[3] == "n3"
    # re-add the SAME logical name via additive append evolution
    fmt.append(
        "acct",
        spark.createDataFrame(
            [(100, 1.0, "fresh")], "id long, v double, name string"
        ),
    )
    got = {r["id"]: r["name"] for r in fmt.read(spark, "acct").collect()}
    assert got[100] == "fresh"
    assert all(got[i] is None for i in range(1, 9))  # NOT "n1".."n8"
    # the minted physical name is distinct and the old one is retired
    snap = fmt._snapshot()
    assert snap.mappings["acct"]["name"] != "name"
    assert "name" in snap.retired["acct"]


def test_guards(spark, tmp_path):
    """Loud refusals: rename collisions, constraint references,
    partition/last-column drops, live dv keys."""
    fmt = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        fmt.rename_column("acct", "name", "id")
    with pytest.raises(ValueError, match="no column"):
        fmt.rename_column("acct", "ghost", "g2")
    fmt.add_constraint(spark, "acct", "pos_v", "v >= 0")
    with pytest.raises(ValueError, match="pos_v"):
        fmt.rename_column("acct", "v", "val")
    with pytest.raises(ValueError, match="pos_v"):
        fmt.drop_column("acct", "v")
    fmt.drop_constraint("acct", "pos_v")
    fmt.rename_column("acct", "v", "val")  # now allowed
    pfmt = DeltaLogFormat(str(tmp_path / "p"))
    pfmt.init(
        {"ev": spark.createDataFrame([(1, 2)], "id long, b int")},
        partition_by={"ev": ["b"]},
    )
    with pytest.raises(ValueError, match="partition column"):
        pfmt.drop_column("ev", "b")
    sfmt = DeltaLogFormat(str(tmp_path / "s"))
    sfmt.init({"one": spark.createDataFrame([(1,)], "id long")})
    with pytest.raises(ValueError, match="last column"):
        sfmt.drop_column("one", "id")


def test_drop_dv_key_column_refused_until_compact(spark, tmp_path):
    """A live merge-on-read deletion vector anti-joins on its key
    columns — dropping one would break every read. compact() retires
    the dvs and unlocks the drop."""
    fmt = _mk(spark, tmp_path)
    ch = spark.createDataFrame(
        [(1, _ts(1), "delete", None, None)],
        "id long, ts timestamp, type string, name string, v double",
    )
    fmt.merge(spark, "acct", ch, ["id"], strategy="mor")
    assert fmt._snapshot().dvs.get("acct")
    with pytest.raises(ValueError, match="deletion vectors"):
        fmt.drop_column("acct", "id")
    fmt.compact(spark, "acct")
    fmt.drop_column("acct", "id")
    assert fmt.read(spark, "acct").columns == ["name", "v"]


def test_mor_merge_after_rename_reads_through_dv(spark, tmp_path):
    """Deletion-vector key files are physical-named: a MoR merge keyed
    on a RENAMED column suppresses exactly its keys, and a rename AFTER
    a MoR merge leaves the existing dvs effective."""
    fmt = _mk(spark, tmp_path)
    fmt.rename_column("acct", "id", "aid")
    ch = spark.createDataFrame(
        [(2, _ts(1), "delete", None, None), (9, _ts(1), "insert", "n9", 9.0)],
        "aid long, ts timestamp, type string, name string, v double",
    )
    fmt.merge(spark, "acct", ch, ["aid"], strategy="mor")
    ids = {r["aid"] for r in fmt.read(spark, "acct").collect()}
    assert 2 not in ids and 9 in ids
    # rename again on top of the live dv: still suppressed
    fmt.rename_column("acct", "aid", "account")
    ids = {r["account"] for r in fmt.read(spark, "acct").collect()}
    assert 2 not in ids and 9 in ids


def test_cdf_across_rename(spark, tmp_path):
    """Change data is physical-named: the single-version fast path
    works after a rename, a metadata-only rename version diffs to an
    EMPTY change set, and a wide span crossing the rename carries the
    NEW logical names with no spurious row changes."""
    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init(
        {
            "acct": spark.createDataFrame(
                [(i, f"n{i}") for i in range(1, 5)], "id long, name string"
            )
        }
    )
    ch = spark.createDataFrame(
        [(1, _ts(1), "update", "N1")],
        "id long, ts timestamp, type string, name string",
    )
    v1 = fmt.merge(spark, "acct", ch, ["id"])
    v2 = fmt.rename_column("acct", "name", "nm")
    # the rename itself is a logical no-op for CDC
    d = fmt.changes_between(spark, "acct", v2 - 1, v2, ["id"])
    assert d.count() == 0
    ch2 = spark.createDataFrame(
        [(2, _ts(2), "update", "N2")],
        "id long, ts timestamp, type string, nm string",
    )
    v3 = fmt.merge(spark, "acct", ch2, ["id"])
    # fast path post-rename: stored cdc bytes read under the new name
    fast = fmt.changes_between(spark, "acct", v3 - 1, v3, ["id"])
    assert fmt.last_changes_path == "cdc-files"
    assert fast.columns == ["id", "type", "nm"]
    assert _rows(fast) == [(2, "update", "N2")]
    # wide span across the rename: new vocabulary, exact content
    wide = fmt.changes_between(spark, "acct", v1 - 1, v3, ["id"])
    assert wide.columns == ["id", "type", "nm"]
    assert _rows(wide) == [(1, "update", "N1"), (2, "update", "N2")]


def test_change_stream_history_reads_correctly_across_rename(spark, tmp_path):
    """A change-feed subscription started AFTER a rename streams the
    pre-rename history with real values under the new logical names
    (physical continuity) — not NULLs."""
    from cdc_init_spark.sources.delta_cdf import read_change_stream

    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init(
        {
            "acct": spark.createDataFrame(
                [(1, "n1"), (2, "n2")], "id long, name string"
            )
        }
    )
    ch = spark.createDataFrame(
        [(1, _ts(1), "update", "N1")],
        "id long, ts timestamp, type string, name string",
    )
    fmt.merge(spark, "acct", ch, ["id"])
    fmt.rename_column("acct", "name", "nm")
    stream = read_change_stream(spark, str(tmp_path / "t"), "acct")
    q = (
        stream.writeStream.format("memory")
        .queryName("cm_hist")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _rows(
        spark.table("cm_hist").select("id", "type", "nm", "_commit_version")
    )
    assert got == [
        (1, "insert", "n1", 0),
        (1, "update", "N1", 1),
        (2, "insert", "n2", 0),
    ]


def test_rename_mid_subscription_fails_loudly_then_restart_continues(
    spark, tmp_path
):
    """A rename landing under a LIVE subscription kills the stream with
    a clear error (the pinned logical schema can no longer represent
    the feed — never silent, even under onNonCdf=skip), and a restart
    on the same checkpoint re-pins the new schema and streams the
    post-rename versions under the new name."""
    from cdc_init_spark.sources.delta_cdf import read_change_stream

    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init(
        {"acct": spark.createDataFrame([(1, "n1")], "id long, name string")}
    )
    ckpt = str(tmp_path / "ckpt")
    q = (
        read_change_stream(spark, str(tmp_path / "t"), "acct", onNonCdf="skip")
        .writeStream.foreachBatch(lambda df, _bid: df.count())
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        fmt.rename_column("acct", "name", "nm")
        with pytest.raises(Exception, match="drops column 'name'"):
            q.processAllAvailable()
    finally:
        q.stop()
        try:
            q.awaitTermination()
        except Exception:
            pass
    # post-rename commit, then restart on the SAME checkpoint: the new
    # pin resolves the new logical name and delivers the rename version
    # (a no-op) plus the merge under it
    ch = spark.createDataFrame(
        [(1, _ts(1), "update", "N1")],
        "id long, ts timestamp, type string, nm string",
    )
    fmt.merge(spark, "acct", ch, ["id"])
    acc: list = []

    def sink(df, _bid):
        acc.extend(df.select("id", "type", "nm", "_commit_version").collect())

    q2 = (
        read_change_stream(spark, str(tmp_path / "t"), "acct")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
        q2.awaitTermination()
    assert sorted(map(tuple, acc)) == [(1, "update", "N1", 2)]


def test_clone_restore_checkpoint_carry_mapping(spark, tmp_path):
    """The mapping rides every metadata surface: clones read like their
    source, restore returns each version under its own names, and a
    checkpointed log replays the mapping after the JSON tail is gone."""
    fmt = DeltaLogFormat(str(tmp_path / "t"), checkpoint_interval=4)
    fmt.init(
        {
            "acct": spark.createDataFrame(
                [(1, "n1", 1.0)], "id long, name string, v double"
            )
        }
    )
    v_pre = fmt.rename_column("acct", "name", "nm") - 1
    fmt.clone(spark, "acct", "acct2")
    assert fmt.read(spark, "acct2").columns == ["id", "nm", "v"]
    assert _rows(fmt.read(spark, "acct2")) == _rows(fmt.read(spark, "acct"))
    # restore to before the rename: the old logical name returns
    fmt.restore(v_pre)
    assert fmt.read(spark, "acct").columns == ["id", "name", "v"]
    fmt.rename_column("acct", "name", "nm2")  # cross checkpoint_interval=4
    while fmt.latest_version() % 4 != 0:
        fmt.append(
            "acct",
            spark.createDataFrame(
                [(7, "x", 7.0)], "id long, nm2 string, v double"
            ),
        )
    ck = fmt.latest_version()
    assert os.path.exists(fmt._ckpt_path(ck))
    fresh = DeltaLogFormat(str(tmp_path / "t"))
    snap = fresh._snapshot()
    assert snap.mappings["acct"] == {"nm2": "name"}
    assert fresh.read(spark, "acct").columns == ["id", "nm2", "v"]


def test_widen_column_type_metadata_only(spark, tmp_path):
    """Type widening (the Delta 4.0 shape): int→bigint and float→double
    are METADATA-ONLY commits — zero bytes move (inode-verified), the
    narrow pages read natively under the wide schema, values are exact,
    old versions time-travel under their own types, and post-widen
    writes/merges address the wide type. Lossy or narrowing changes
    raise."""
    fmt = DeltaLogFormat(str(tmp_path / "t"))
    fmt.init(
        {
            "m": spark.createDataFrame(
                [(i, float(i) / 2) for i in range(1, 9)], "id int, v float"
            )
        }
    )
    before_rows = _rows(fmt.read(spark, "m"))
    before_inodes = _data_inodes(fmt, "m")
    v1 = fmt.widen_column_type("m", "id", "bigint")
    fmt.widen_column_type("m", "v", "double")
    assert _data_inodes(fmt, "m") == before_inodes  # zero bytes moved
    df = fmt.read(spark, "m")
    assert dict(df.dtypes) == {"id": "bigint", "v": "double"}
    assert _rows(df) == before_rows  # exact values through the upcast
    assert dict(fmt.read(spark, "m", version=v1 - 1).dtypes) == {
        "id": "int", "v": "float"
    }
    # a value only the wide type can hold, then a keyed merge whose
    # probe reads the NARROW files under the wide schema
    big = 2**40
    fmt.append(
        "m", spark.createDataFrame([(big, 1.25)], "id bigint, v double")
    )
    ch = spark.createDataFrame(
        [(3, _ts(1), "delete", None), (big, _ts(1), "update", 2.5)],
        "id bigint, ts timestamp, type string, v double",
    )
    fmt.merge(spark, "m", ch, ["id"])
    got = {r["id"]: r["v"] for r in fmt.read(spark, "m").collect()}
    assert 3 not in got and got[big] == 2.5 and got[4] == 2.0
    # file skipping still prunes on the widened column's narrow stats
    _, total, read = fmt.read_where(spark, "m", "id", big, None)
    assert read < total
    # guards: lossy / narrowing / no-op all refuse
    for bad in [("id", "int"), ("id", "double"), ("v", "float"),
                ("v", "double")]:
        with pytest.raises(ValueError):
            fmt.widen_column_type("m", *bad)


def test_widen_cdc_and_rename_compose(spark, tmp_path):
    """CDC across a widen: the widen version itself is an empty diff, a
    wide span upcasts the old side (no spurious changes), and widen
    composes with rename (both metadata-only, same stable physical)."""
    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init(
        {"m": spark.createDataFrame([(1, 1.5), (2, 2.5)], "id int, v float")}
    )
    v_w = fmt.widen_column_type("m", "v", "double")
    d = fmt.changes_between(spark, "m", v_w - 1, v_w, ["id"])
    assert d.count() == 0
    fmt.rename_column("m", "v", "val")
    ch = spark.createDataFrame(
        [(1, _ts(1), "update", 9.75)],
        "id int, ts timestamp, type string, val double",
    )
    v_m = fmt.merge(spark, "m", ch, ["id"])
    wide = fmt.changes_between(spark, "m", 0, v_m, ["id"])
    assert wide.columns == ["id", "type", "val"]
    assert dict(wide.dtypes)["val"] == "double"
    assert _rows(wide) == [(1, "update", 9.75)]


def test_overwrite_keeps_physical_names_and_retires_reshaped(spark, tmp_path):
    """An overwrite keeps persisting columns' physical names (feed
    continuity) and retires the physicals of columns its reshape drops,
    so a later re-add mints fresh."""
    fmt = _mk(spark, tmp_path)
    fmt.rename_column("acct", "name", "nm")
    # overwrite with the same logical shape: mapping persists
    fmt.commit(
        {
            "acct": spark.createDataFrame(
                [(1, "z1", 1.5)], "id long, nm string, v double"
            )
        },
        batch_id=1,
    )
    snap = fmt._snapshot()
    assert snap.mappings["acct"] == {"nm": "name"}
    assert _rows(fmt.read(spark, "acct")) == [(1, "z1", 1.5)]
    # reshape drops 'v': its physical retires
    fmt.commit(
        {"acct": spark.createDataFrame([(1, "z1")], "id long, nm string")},
        batch_id=2,
    )
    snap = fmt._snapshot()
    assert "v" in snap.retired["acct"]
    assert fmt.read(spark, "acct").columns == ["id", "nm"]
