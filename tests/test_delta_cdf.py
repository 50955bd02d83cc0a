"""Streaming change-feed source over DeltaLogFormat (sources/delta_cdf).

The laws:
- streamed accumulation ≡ batch ``changes_between`` prefix, version by
  version (init's snapshot rows stream as inserts — the reference's
  seed-then-live contract, initializer.clj:101-104);
- checkpoint restart resumes at the committed offset and re-delivers
  nothing already processed (replayable offsets = at-least-once with
  idempotent downstream, initializer.clj:27-39);
- compact versions emit nothing (physical rewrite, zero logical change);
- non-row-expressible versions (overwrite / no-CDF merge) fail loudly
  by default and are skippable by explicit option, never silent.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cdc_init_spark.sources.delta_cdf import read_change_stream
from cdc_init_spark.sources.delta_log import DeltaLogFormat


def _ts(minute):
    return datetime(2026, 1, 1, 12, minute)


def _rows(df_or_list):
    rows = df_or_list if isinstance(df_or_list, list) else df_or_list.collect()
    return sorted(
        (tuple(r) for r in rows),
        key=lambda t: tuple((v is None, 0 if v is None else v) for v in t),
    )


def _run_stream(spark, root, table, checkpoint, qname, **opts):
    q = (
        read_change_stream(spark, root, table, **opts)
        .writeStream.format("memory")
        .queryName(qname)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(qname)


def _seeded_table(spark, path):
    """v0 init (2 rows) → v1 append → v2 CDF merge (update+delete+insert)
    → v3 compact."""
    fmt = DeltaLogFormat(path, enable_cdf=True)
    fmt.init({"acct": spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, v double")})
    fmt.append("acct", spark.createDataFrame(
        [(3, "c", 30.0)], "id long, name string, v double"))
    fmt.merge(spark, "acct", spark.createDataFrame(
        [(2, _ts(1), "update", "b2", 21.0),
         (1, _ts(1), "delete", None, None),
         (9, _ts(1), "insert", "i", 90.0)],
        "id long, ts timestamp, type string, name string, v double"),
        ["id"], batch_id=0)
    fmt.compact(spark, "acct", target_files=1)
    return fmt


def test_stream_equals_batch_changes_prefix(spark, tmp_path):
    """Full-history subscription: per-version streamed rows equal the
    batch CDC read for that version (v0 = the snapshot as inserts), and
    the compact version emits nothing."""
    fmt = _seeded_table(spark, str(tmp_path / "t"))
    out = _run_stream(spark, fmt.root, "acct",
                      str(tmp_path / "ckpt"), "cdf_all")
    got = {
        v: _rows([r[:-1] for r in out.filter(
            F.col("_commit_version") == v).collect()])
        for v in range(4)
    }
    # v0: the initial snapshot as inserts
    want0 = _rows([
        t + ("insert",) for t in
        _rows(fmt.read(spark, "acct", version=0))
    ])
    assert got[0] == want0
    # v1, v2: exactly the batch changes_between for each version step.
    # changes_between emits (pk, type, data...); the stream emits the
    # table schema order + type — realign before comparing.
    for v in (1, 2):
        d = fmt.changes_between(spark, "acct", v - 1, v, ["id"])
        want = _rows(d.select("id", "name", "v", "type"))
        assert got[v] == want, f"version {v}"
    assert got[3] == []  # compact: zero logical change
    # grand total: no extra versions leaked
    assert out.count() == sum(len(r) for r in got.values())


def _run_stream_recoverable(spark, root, table, checkpoint, **opts):
    """foreachBatch sink (memory sink can't recover from a checkpoint):
    collects every delivered row driver-side and returns them."""
    acc: list = []

    def sink(df, _bid):
        acc.extend(df.collect())

    q = (
        read_change_stream(spark, root, table, **opts)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return acc


def test_checkpoint_restart_resumes_exactly(spark, tmp_path):
    """Stop after the first run, commit more versions, restart on the
    SAME checkpoint: the second run delivers only the new versions, and
    the union across runs equals a fresh full-history read."""
    fmt = _seeded_table(spark, str(tmp_path / "t"))
    ckpt = str(tmp_path / "ckpt")
    first = _run_stream_recoverable(spark, fmt.root, "acct", ckpt)
    assert first
    # v3 is the compact — zero rows, so the max VISIBLE version is 2;
    # that the offset still advanced through 3 is proven below by the
    # restart delivering exactly [4, 5]
    assert max(r["_commit_version"] for r in first) == 2

    # new activity after the stream stopped
    fmt.append("acct", spark.createDataFrame(
        [(10, "j", 100.0)], "id long, name string, v double"))  # v4
    fmt.merge(spark, "acct", spark.createDataFrame(
        [(3, _ts(2), "update", "c2", 31.0)],
        "id long, ts timestamp, type string, name string, v double"),
        ["id"], batch_id=1)                                      # v5

    second = _run_stream_recoverable(spark, fmt.root, "acct", ckpt)
    versions = sorted({r["_commit_version"] for r in second})
    assert versions == [4, 5]  # nothing re-delivered, nothing missed
    assert [
        (r["id"], r["name"], r["v"], r["type"])
        for r in second if r["_commit_version"] == 4
    ] == [(10, "j", 100.0, "insert")]
    want5 = _rows(fmt.changes_between(spark, "acct", 4, 5, ["id"])
                  .select("id", "name", "v", "type"))
    assert sorted(
        (r["id"], r["name"], r["v"], r["type"])
        for r in second if r["_commit_version"] == 5
    ) == want5

    # union across runs ≡ one fresh full-history subscription
    fresh = _run_stream_recoverable(
        spark, fmt.root, "acct", str(tmp_path / "ckpt2"))
    assert _rows(fresh) == _rows(first + second)


def test_non_cdf_change_fails_loudly_and_skip_opts_out(spark, tmp_path):
    """A merge on a table WITHOUT enable_cdf removes files with no
    change data: the stream raises a clear error by default; with
    onNonCdf=skip it passes over that version but still delivers
    row-expressible ones."""
    fmt = DeltaLogFormat(str(tmp_path / "t"))  # no CDF
    fmt.init({"acct": spark.createDataFrame(
        [(1, 1.0)], "id long, v double")})
    fmt.merge(spark, "acct", spark.createDataFrame(
        [(1, _ts(1), "update", 2.0)],
        "id long, ts timestamp, type string, v double"), ["id"])  # v1
    fmt.append("acct", spark.createDataFrame(
        [(5, 5.0)], "id long, v double"))                          # v2

    with pytest.raises(Exception, match="enable_cdf|onNonCdf"):
        _run_stream(spark, fmt.root, "acct",
                    str(tmp_path / "ckpt_err"), "cdf_err")

    out = _run_stream(spark, fmt.root, "acct",
                      str(tmp_path / "ckpt_skip"), "cdf_skip",
                      onNonCdf="skip")
    versions = sorted(
        r[0] for r in out.select("_commit_version").distinct().collect()
    )
    assert versions == [0, 2]  # v1 skipped by explicit option


def test_partitioned_appends_materialize_partition_columns(spark, tmp_path):
    """Insert rows streamed from add-files of a Hive-partitioned table
    carry the partition column values (they live in the path/log, not
    the data pages)."""
    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init(
        {"s": spark.createDataFrame(
            [(1, "us", 1.0), (2, "eu", 2.0)],
            "id long, region string, v double")},
        partition_by={"s": ["region"]},
    )
    fmt.append("s", spark.createDataFrame(
        [(3, "ap", 3.0)], "id long, region string, v double"))
    out = _run_stream(spark, fmt.root, "s",
                      str(tmp_path / "ckpt"), "cdf_part")
    assert _rows(out.select("id", "region", "v", "type")) == [
        (1, "us", 1.0, "insert"), (2, "eu", 2.0, "insert"),
        (3, "ap", 3.0, "insert"),
    ]


def test_starting_version_skips_snapshot(spark, tmp_path):
    """startingVersion=1 subscribes to changes only (the catch-up-
    already-done case): the v0 snapshot rows never stream."""
    fmt = _seeded_table(spark, str(tmp_path / "t"))
    out = _run_stream(spark, fmt.root, "acct",
                      str(tmp_path / "ckpt"), "cdf_tail",
                      startingVersion="1")
    versions = sorted(
        r[0] for r in out.select("_commit_version").distinct().collect()
    )
    assert versions == [1, 2]


def test_vacuum_collects_change_data_below_horizon(spark, tmp_path):
    """Change-data files follow the same vacuum horizon as time travel:
    versions below it stop being streamable (loudly), versions at or
    above keep their change data and stream fine."""
    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init({"acct": spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "id long, v double")})
    fmt.merge(spark, "acct", spark.createDataFrame(
        [(1, _ts(1), "update", 11.0)],
        "id long, ts timestamp, type string, v double"), ["id"])   # v1
    fmt.merge(spark, "acct", spark.createDataFrame(
        [(2, _ts(2), "update", 22.0)],
        "id long, ts timestamp, type string, v double"), ["id"])   # v2

    deleted = fmt.vacuum(horizon=2, retention_s=0.0)
    cdc_deleted = [p for p in deleted if p.startswith("_cdc/")]
    assert len(cdc_deleted) >= 1  # v1's change data collected

    # v2 still streams
    out = _run_stream(spark, fmt.root, "acct",
                      str(tmp_path / "ckpt2"), "cdf_after_vacuum",
                      startingVersion="2")
    versions = sorted(
        r[0] for r in out.select("_commit_version").distinct().collect()
    )
    assert versions == [2]
    assert _rows(out.select("id", "v", "type")) == [(2, 22.0, "update")]

    # v1 is below the horizon: subscribing there fails loudly
    with pytest.raises(Exception):
        _run_stream(spark, fmt.root, "acct",
                    str(tmp_path / "ckpt1"), "cdf_below_horizon",
                    startingVersion="1")


def test_starting_version_ahead_of_latest_floors_offset(spark, tmp_path):
    """ADVICE r7 (delta_cdf.py:138): a startingVersion BEYOND the
    table's current latest must hold the committed offset at the
    subscription floor — versions landing later in [latest+1,
    startingVersion-1] stay skipped, and the first batch never plans
    with end < start."""
    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init({"acct": spark.createDataFrame(
        [(1, 1.0)], "id long, v double")})                    # v0 (latest)
    ckpt = str(tmp_path / "ckpt")
    first = _run_stream_recoverable(
        spark, fmt.root, "acct", ckpt, startingVersion="3")
    assert first == []  # nothing at or above the floor exists yet

    for i in (2, 3, 4):  # v1, v2 (asked to skip), v3 (subscribed)
        fmt.append("acct", spark.createDataFrame(
            [(i, float(i))], "id long, v double"))
    second = _run_stream_recoverable(
        spark, fmt.root, "acct", ckpt, startingVersion="3")
    assert sorted({r["_commit_version"] for r in second}) == [3]
    assert [(r["id"], r["v"], r["type"]) for r in second] == [
        (4, 4.0, "insert")]


def test_max_versions_per_batch_bounds_live_tail(spark, tmp_path):
    """maxVersionsPerBatch=1 bounds steady-state micro-batches to one
    version each (Delta's maxFilesPerTrigger shape). The FIRST batch of
    a reader incarnation is deliberately uncapped — a capped offset
    computed without knowing the committed offset could regress below
    it and re-deliver versions — so the law is: no later batch exceeds
    the cap, offsets never regress, and accumulated rows equal the
    unbounded read."""
    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init({"acct": spark.createDataFrame(
        [(1, 1.0)], "id long, v double")})
    batches: list = []

    def sink(df, bid):
        batches.append(sorted(
            r[0] for r in df.select("_commit_version").distinct().collect()
        ))

    q = (
        read_change_stream(spark, fmt.root, "acct", maxVersionsPerBatch="1")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        for i in range(2, 6):  # v1..v4 land while the query is live
            fmt.append("acct", spark.createDataFrame(
                [(i, float(i))], "id long, v double"))
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    assert all(len(vs) <= 1 for vs in batches[1:])
    covered = [v for vs in batches for v in vs]
    assert covered == sorted(covered), "offsets regressed (re-delivery)"
    assert sorted(covered) == [0, 1, 2, 3, 4]


def test_overwrite_with_cdc_pk_cols_keeps_stream_live(spark, tmp_path):
    """ADVICE r7 (delta_log.py:519): an overwrite commit on a CDF table
    captures change data when given the table's pk — the subscription
    stays live across the overwrite and sees its exact row diff."""
    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init({"acct": spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, v double")})
    ok = fmt.commit(
        {"acct": spark.createDataFrame(
            [(2, 21.0), (3, 30.0)], "id long, v double")},
        batch_id=0,
        cdc_pk_cols={"acct": ["id"]},
    )
    assert ok
    out = _run_stream(spark, fmt.root, "acct",
                      str(tmp_path / "ckpt"), "cdf_overwrite")
    got = _rows(out.filter(F.col("_commit_version") == 1)
                .select("id", "v", "type"))
    assert got == _rows([(1, None, "delete"), (2, 21.0, "update"),
                         (3, 30.0, "insert")])
    # law: applying the streamed v1 diff to v0 reproduces v1
    assert _rows(fmt.read(spark, "acct", version=1)) == _rows(
        [(2, 21.0), (3, 30.0)])


def test_overwrite_without_pk_still_fails_loudly(spark, tmp_path):
    """The documented gap: a CDF-table overwrite WITHOUT cdc_pk_cols is
    not row-expressible — the stream raises by default, and a reshape
    overwrite refuses CDC capture outright."""
    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init({"acct": spark.createDataFrame(
        [(1, 10.0)], "id long, v double")})
    fmt.commit({"acct": spark.createDataFrame(
        [(1, 11.0)], "id long, v double")}, batch_id=0)  # no pk: no CDC
    with pytest.raises(Exception, match="onNonCdf|enable_cdf"):
        _run_stream(spark, fmt.root, "acct",
                    str(tmp_path / "ckpt"), "cdf_ow_err")
    with pytest.raises(ValueError, match="column set"):
        fmt.commit(
            {"acct": spark.createDataFrame(
                [(1, "x")], "id long, name string")},
            batch_id=1,
            cdc_pk_cols={"acct": ["id"]},
        )


def test_cdc_matches_committed_bytes_for_nondeterministic_changes(
    spark, tmp_path
):
    """ADVICE r7 (delta_log.py:812): change-data content is derived from
    the files the merge COMMITTED, not from a second execution of the
    merge plan — so a non-deterministic change frame (rand values) still
    yields a feed that agrees exactly with the table's own version diff."""
    import os as _os

    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init({"acct": spark.createDataFrame(
        [(i, 0.0) for i in range(10)], "id long, v double")})
    ch = spark.range(10).select(
        "id",
        F.lit(_ts(1)).alias("ts"),
        F.lit("update").alias("type"),
        F.rand().alias("v"),  # unseeded: differs on every execution
    )
    fmt.merge(spark, "acct", ch, ["id"], batch_id=0)
    table_diff = fmt.changes_between(spark, "acct", 0, 1, ["id"])
    stored = spark.read.parquet(_os.path.join(fmt.cdc_dir, "acct"))
    assert _rows(stored.select("id", "type", "v")) == _rows(
        table_diff.select("id", "type", "v"))


def test_timestamp_columns_survive_arrow_batches(spark, tmp_path):
    """Type fidelity through the RecordBatch read path: timestamp data
    columns stream back exactly (µs precision, UTC) for both add-file
    inserts and cdc merge rows."""
    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init({"ev": spark.createDataFrame(
        [(1, _ts(5), 1.0)], "id long, seen timestamp, v double")})
    fmt.merge(spark, "ev", spark.createDataFrame(
        [(1, _ts(9), "update", _ts(7), 2.0)],
        "id long, ts timestamp, type string, seen timestamp, v double"),
        ["id"], batch_id=0)
    out = _run_stream(spark, fmt.root, "ev",
                      str(tmp_path / "ckpt"), "cdf_ts")
    got = sorted(
        (r["_commit_version"], r["id"], r["seen"], r["v"], r["type"])
        for r in out.collect()
    )
    assert got == [
        (0, 1, _ts(5), 1.0, "insert"),
        (1, 1, _ts(7), 2.0, "update"),
    ]


def test_arrow_batches_beat_tuple_path_2x(spark, tmp_path):
    """VERDICT r7 item 3's throughput pin: on a wide file the
    RecordBatch read path must be ≥2× the per-row tuple path it
    replaced (in practice it is >10×; 2× absorbs host noise). The tuple
    twin lives here, in the test, as the measured baseline."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    n, ncols = 200_000, 10
    path = str(tmp_path / "wide.parquet")
    pq.write_table(pa.table(
        {"id": pa.array(range(n), pa.int64()),
         **{f"c{i}": pa.array([float(j % 997) for j in range(n)])
            for i in range(ncols)}}), path)

    data_fields = ["id"] + [f"c{i}" for i in range(ncols)]

    def tuple_path():
        rows = pq.read_table(path).to_pylist()
        return sum(1 for _ in (
            tuple(r.get(c) for c in data_fields) + ("insert", 7)
            for r in rows))

    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(
        "id bigint, " + ", ".join(f"c{i} double" for i in range(ncols))
        + ", type string, _commit_version bigint")
    from pyspark.sql.datasource import InputPartition

    from cdc_init_spark.sources.delta_cdf import DeltaCdfStreamReader

    reader = DeltaCdfStreamReader.__new__(DeltaCdfStreamReader)
    reader.spark_schema = schema
    reader.fields = [f.name for f in schema.fields]
    reader.data_fields = reader.fields[:-2]
    reader._phys = {}  # identity column mapping

    def arrow_path():
        part = InputPartition(("add", 7, path, {}))
        return sum(b.num_rows for b in reader.read(part))

    # warm both (file cache, imports), then time
    assert tuple_path() == n and arrow_path() == n
    t0 = time.perf_counter(); tuple_path(); t_tuple = time.perf_counter() - t0
    t0 = time.perf_counter(); arrow_path(); t_arrow = time.perf_counter() - t0
    assert t_arrow * 2 <= t_tuple, (
        f"arrow path {t_arrow:.3f}s not 2x faster than tuple "
        f"{t_tuple:.3f}s")


def test_additive_evolution_old_files_stream_null_for_new_columns(
    spark, tmp_path
):
    """Schema-evolution law (VERDICT r7 item 5): a subscription started
    AFTER an additive widening reads the whole history in the widened
    schema — files from before the widening stream NULL for the new
    columns."""
    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init({"acct": spark.createDataFrame(
        [(1, 1.0)], "id long, v double")})                      # v0 narrow
    fmt.append("acct", spark.createDataFrame(
        [(2, 2.0, "x")], "id long, v double, tag string"))      # v1 widened
    out = _run_stream(spark, fmt.root, "acct",
                      str(tmp_path / "ckpt"), "cdf_widen")
    assert set(out.columns) == {"id", "v", "tag", "type", "_commit_version"}
    assert _rows(out.select("id", "v", "tag", "type")) == _rows([
        (1, 1.0, None, "insert"), (2, 2.0, "x", "insert")])


def test_restart_picks_up_widened_schema(spark, tmp_path):
    """A subscription pinned on the narrow schema keeps streaming across
    an additive widening (new columns simply invisible); a RESTART on
    the same checkpoint re-resolves the schema and delivers subsequent
    versions with the new column."""
    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init({"acct": spark.createDataFrame(
        [(1, 1.0)], "id long, v double")})
    ckpt = str(tmp_path / "ckpt")
    first_cols: list = []
    acc: list = []

    def sink(df, _bid):
        first_cols.append(df.columns)
        acc.extend(df.collect())

    q = (read_change_stream(spark, fmt.root, "acct")
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
        fmt.append("acct", spark.createDataFrame(
            [(2, 2.0, "x")], "id long, v double, tag string"))  # v1 widened
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    # pinned narrow: the widened version streamed WITHOUT the new column
    assert all("tag" not in cols for cols in first_cols)
    assert sorted((r["id"], r["v"]) for r in acc) == [(1, 1.0), (2, 2.0)]

    fmt.append("acct", spark.createDataFrame(
        [(3, 3.0, "y")], "id long, v double, tag string"))      # v2
    second = _run_stream_recoverable(spark, fmt.root, "acct", ckpt)
    assert [(r["id"], r["v"], r["tag"], r["_commit_version"])
            for r in second] == [(3, 3.0, "y", 2)]


def test_non_additive_change_fails_loudly_even_with_skip(spark, tmp_path):
    """A drop/retype is never silently passed over: a column dropped
    while the subscription is live kills the stream with a clear error
    even under onNonCdf=skip, and a fresh subscription whose range
    crosses a historical retype refuses to start."""
    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init({"acct": spark.createDataFrame(
        [(1, 1.0, "a")], "id long, v double, tag string")})
    q = (read_change_stream(spark, fmt.root, "acct", onNonCdf="skip")
         .writeStream.format("memory").queryName("cdf_drop")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
        # overwrite that DROPS tag lands mid-subscription
        fmt.commit({"acct": spark.createDataFrame(
            [(1, 1.0)], "id long, v double")}, batch_id=0)
        with pytest.raises(Exception, match="drops column 'tag'"):
            q.processAllAvailable()
    finally:
        q.stop()
        try:
            q.awaitTermination()
        except Exception:
            pass

    # historical retype: fresh subscription from v0 crosses it → loud
    fmt2 = DeltaLogFormat(str(tmp_path / "t2"), enable_cdf=True)
    fmt2.init({"acct": spark.createDataFrame(
        [(1, 1.0)], "id long, v double")})
    fmt2.commit({"acct": spark.createDataFrame(
        [(1, "one")], "id long, v string")}, batch_id=0)  # retype v
    with pytest.raises(Exception, match="retypes column 'v'"):
        _run_stream(spark, fmt2.root, "acct",
                    str(tmp_path / "ckpt2"), "cdf_retype", onNonCdf="skip")


def test_metadata_only_and_other_table_commits_stream_as_noops(
    spark, tmp_path
):
    """A live subscription must survive commits that change no rows of
    its table: add/drop constraint (metadata-only versions) and a
    shallow clone (which touches only the DESTINATION table). Each such
    version advances the offset and delivers zero rows — never an
    error, never a phantom row."""
    root = str(tmp_path / "t")
    fmt = DeltaLogFormat(root, enable_cdf=True)
    fmt.init({"acct": spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, v double")})
    ckpt = str(tmp_path / "ck")
    first = _run_stream_recoverable(spark, root, "acct", ckpt)
    assert len(first) == 2  # the seed snapshot

    fmt.add_constraint(spark, "acct", "v_pos", "v > 0")     # v1
    fmt.clone(spark, "acct", "acct_dev")                    # v2
    fmt.drop_constraint("acct", "v_pos")                    # v3
    fmt.append("acct", spark.createDataFrame(               # v4: real rows
        [(3, 30.0)], "id long, v double"))
    second = _run_stream_recoverable(spark, root, "acct", ckpt)
    assert _rows([tuple(r) for r in second]) == _rows(
        [(3, 30.0, "insert", 4)]
    )  # exactly the append — v1-v3 delivered nothing and failed nothing


def test_subscribing_to_a_clone_streams_its_snapshot(spark, tmp_path):
    """A clone's linked files ARE the destination table's initial
    snapshot: a fresh subscription on the clone streams them as inserts
    (the same seed-then-live contract as init). If the source carried
    LIVE deletion vectors at clone time, the linked adds alone would
    resurrect suppressed rows — that version must refuse to stream
    (onNonCdf=error) rather than lie."""
    root = str(tmp_path / "t")
    fmt = DeltaLogFormat(root, enable_cdf=True)
    fmt.init({"src": spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double")})
    fmt.clone(spark, "src", "plain")                        # v1: no dvs
    got = _run_stream(spark, root, "plain", str(tmp_path / "ck1"), "clone_a",
                      startingVersion=1)
    assert _rows(got) == _rows(
        [(1, 10.0, "insert", 1), (2, 20.0, "insert", 1),
         (3, 30.0, "insert", 1)]
    )

    fmt.merge(spark, "src", spark.createDataFrame(
        [(2, _ts(1), "delete", None)],
        "id long, ts timestamp, type string, v double"),
        ["id"], strategy="mor")                             # v2: live dv
    fmt.clone(spark, "src", "dv_clone")                     # v3
    with pytest.raises(Exception, match="row-level change data"):
        _run_stream(spark, root, "dv_clone", str(tmp_path / "ck2"),
                    "clone_b", startingVersion=3)
    # explicit skip passes over it, delivering nothing rather than lies
    got = _run_stream(spark, root, "dv_clone", str(tmp_path / "ck3"),
                      "clone_c", startingVersion=3, onNonCdf="skip")
    assert got.count() == 0


def test_max_bytes_per_batch_bounds_live_tail(spark, tmp_path):
    """maxBytesPerBatch (VERDICT r8 item 6): steady-state micro-batches
    cover versions whose PLANNED bytes (action-log file sizes, no data
    IO) stay at or under the cap — except a single version larger than
    the cap, which forms its own batch rather than stalling the stream.
    Accumulated rows equal the unbounded read; offsets never regress.
    The first batch of an incarnation stays uncapped (restart rule
    shared with maxVersionsPerBatch)."""
    import json as _json
    import os as _os

    fmt = DeltaLogFormat(str(tmp_path / "t"), enable_cdf=True)
    fmt.init({"acct": spark.createDataFrame(
        [(1, 1.0)], "id long, v double")})

    def version_bytes(v):
        total = 0
        with open(fmt._log_path(v)) as f:
            for line in f:
                a = _json.loads(line)
                if "add" in a:
                    total += a["add"]["size"]
                elif "cdc" in a:
                    total += a["cdc"].get("size") or _os.path.getsize(
                        _os.path.join(fmt.cdc_dir, a["cdc"]["path"]))
        return total

    batches: list = []

    def sink(df, bid):
        batches.append(sorted(
            r[0] for r in df.select("_commit_version").distinct().collect()
        ))

    # cap sized to ONE append version's bytes (+ slack): batches after
    # the first must cover exactly one version each even though several
    # committed versions are pending
    fmt.append("acct", spark.createDataFrame([(2, 2.0)], "id long, v double"))
    cap = version_bytes(1) + 16
    for i in range(3, 7):  # v2..v5 pending before the stream starts
        fmt.append("acct", spark.createDataFrame(
            [(i, float(i))], "id long, v double"))

    q = (
        read_change_stream(
            spark, fmt.root, "acct",
            startingVersion="1", maxBytesPerBatch=str(cap),
        )
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # a version whose bytes EXCEED the cap still advances the stream
        fmt.append("acct", spark.createDataFrame(
            [(100 + k, float(k)) for k in range(2000)], "id long, v double"))
        fmt.append("acct", spark.createDataFrame(
            [(7, 7.0)], "id long, v double"))
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    for vs in batches[1:]:
        assert vs, "empty planned batch"
        total = sum(version_bytes(v) for v in vs)
        assert total <= cap or len(vs) == 1, (
            f"batch {vs} planned {total} bytes over the {cap} cap")
    covered = [v for vs in batches for v in vs]
    assert covered == sorted(covered), "offsets regressed (re-delivery)"
    assert sorted(covered) == list(range(1, 8))
    # the big version really was over the cap and really was alone
    assert version_bytes(6) > cap
    assert [6] in batches
