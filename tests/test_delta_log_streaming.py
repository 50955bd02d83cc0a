"""Structured Streaming ingest into DeltaLogFormat: the lakehouse
write path a production stream runs — foreachBatch append with the
batch id as the transaction watermark, so at-least-once micro-batch
delivery collapses to exactly-once table contents (the same law
streaming/idempotent.py pins for the partitioned-parquet sink, now at
the format's transaction layer)."""

from __future__ import annotations

import json
import os

from cdc_init_spark.sources.delta_log import DeltaLogFormat


def test_streaming_append_exactly_once(spark, tmp_path):
    """File stream → foreachBatch(fmt.append) → rows land exactly once;
    an explicit replay of an already-committed batch id is a committed
    no-op (what checkpoint recovery does after a crash mid-ack)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    fmt = DeltaLogFormat(str(tmp_path / "t"))
    fmt.init({"ev": spark.createDataFrame([], "id long, v double")})

    def write_file(name, rows):
        with open(f"{src}/{name}", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    write_file("b0.json", [{"id": 1, "v": 1.0}, {"id": 2, "v": 2.0}])
    write_file("b1.json", [{"id": 3, "v": 3.0}])
    seen: list[int] = []

    def sink(batch_df, batch_id):
        if not batch_df.isEmpty():
            fmt.append("ev", batch_df, batch_id=batch_id)
            seen.append(batch_id)

    q = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(seen) == 2
    got = sorted((r.id, r.v) for r in fmt.read(spark, "ev").collect())
    assert got == [(1, 1.0), (2, 2.0), (3, 3.0)]
    v = fmt.latest_version()

    # crash-recovery replay: re-delivering batch 0's data with its
    # original batch id must not duplicate rows or advance the version
    replay = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    assert fmt.append("ev", replay, batch_id=seen[0]) == -1
    assert fmt.latest_version() == v
    assert sorted((r.id, r.v) for r in fmt.read(spark, "ev").collect()) == got


def test_streaming_cdc_merge_into_table(spark, tmp_path):
    """CDC stream applied as copy-on-write merges: two micro-batches of
    keyed DML through foreachBatch(fmt.merge) leave the table equal to
    apply_changes over the concatenated log — the end-to-end lakehouse
    CDC-apply pipeline (stream → MERGE INTO), with per-version time
    travel across batches."""
    from pyspark.sql import functions as F

    from cdc_init_spark.streaming.apply import apply_changes

    src = str(tmp_path / "src")
    os.makedirs(src)
    fmt = DeltaLogFormat(str(tmp_path / "t"))
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    )
    fmt.init({"acct": base})

    batches = [
        [
            {"id": 1, "ts": "2026-01-02T00:00:00", "type": "update",
             "name": "a2", "v": 11.0},
            {"id": 3, "ts": "2026-01-02T00:00:00", "type": "delete",
             "name": None, "v": None},
        ],
        [
            {"id": 4, "ts": "2026-01-03T00:00:00", "type": "insert",
             "name": "d", "v": 40.0},
            {"id": 1, "ts": "2026-01-03T00:00:00", "type": "update",
             "name": "a3", "v": 12.0},
        ],
    ]
    def write_batch(i):
        with open(f"{src}/b{i}.json", "w") as f:
            for r in batches[i]:
                f.write(json.dumps(r) + "\n")

    def sink(batch_df, batch_id):
        if not batch_df.isEmpty():
            fmt.merge(spark, "acct",
                      batch_df.withColumn("ts", F.to_timestamp("ts")),
                      ["id"], batch_id=batch_id)

    q = (
        spark.readStream.schema(
            "id long, ts string, type string, name string, v double"
        )
        .json(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    # sequence the micro-batches explicitly (file mtime ties make
    # maxFilesPerTrigger ordering nondeterministic for rapid writes)
    write_batch(0)
    q.processAllAvailable()
    write_batch(1)
    q.processAllAvailable()
    q.stop()

    all_changes = spark.read.schema(
        "id long, ts string, type string, name string, v double"
    ).json(src).withColumn("ts", F.to_timestamp("ts"))
    expect = sorted(map(tuple, apply_changes(base, all_changes, ["id"]).collect()))
    assert sorted(map(tuple, fmt.read(spark, "acct").collect())) == expect
    # time travel: v1 (after batch 0) shows the intermediate state
    mid = {r.id: r.name for r in fmt.read(spark, "acct", version=1).collect()}
    assert mid == {1: "a2", 2: "b"}


def test_live_loop_capstone_matches_batch_recompute(spark, sf_dir):
    """q206's law, independent of the DuckDB oracle: the aggregate the
    change-feed subscription maintained incrementally (snapshot → two
    merges → streamed continuous_agg_step) equals a from-scratch batch
    recompute of the final state — the reference's snapshot-then-live
    contract (core.clj:154-182) closed end to end."""
    from pyspark.sql import functions as F

    from cdc_init_spark.plans import QUERIES
    from cdc_init_spark.plans.delta import _customer_change_set
    from cdc_init_spark.streaming.apply import apply_changes
    from cdc_init_spark.tables import load_table

    got = {
        r["c_nationkey"]: (r["sum_bal"], r["n_rows"])
        for r in QUERIES["q206_delta_live_loop"](spark, sf_dir).collect()
    }

    base = load_table(spark, sf_dir, "customer")
    final = apply_changes(
        base, _customer_change_set(spark, sf_dir), ["c_custkey"], "ts"
    )
    # group membership resolves from the BASE row (incremental_agg's
    # immutable-group contract; update rows carry NULL c_nationkey)
    want = {
        r["c_nationkey"]: (r["s"], r["n"])
        for r in final.select("c_custkey", "c_acctbal")
        .join(base.select("c_custkey", "c_nationkey"), "c_custkey")
        .groupBy("c_nationkey")
        .agg(F.sum("c_acctbal").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1], f"nation {k} row count"
        assert abs(got[k][0] - want[k][0]) < 1e-4, f"nation {k} sum"
