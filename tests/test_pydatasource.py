"""Custom Python DataSource (sources/pydatasource.py — the Spark 4
`pyspark.sql.datasource` extension point): determinism and count laws,
executor-side partition parallelism, and the end-to-end pipeline of
generated CDC log → apply_changes merge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_init_spark.sources.pydatasource import register


@pytest.fixture(scope="module")
def cdclog(spark):
    register(spark)
    return spark


def _read(spark, **opts):
    r = spark.read.format("cdclog")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_count_and_partition_laws(cdclog):
    df = _read(cdclog, rows=500, partitions=4)
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 4
    # uneven split: remainder rows land in the earliest partitions
    df7 = _read(cdclog, rows=500, partitions=7)
    assert df7.count() == 500


def test_deterministic_per_options_and_seed_rekeys(cdclog):
    a = {tuple(r) for r in _read(cdclog, rows=300, partitions=3).collect()}
    b = {tuple(r) for r in _read(cdclog, rows=300, partitions=3).collect()}
    assert a == b
    c = {tuple(r) for r in _read(cdclog, rows=300, partitions=3, seed=7).collect()}
    assert c != a


def test_vocabulary_and_payload_shape(cdclog):
    df = _read(cdclog, rows=400, partitions=2, tables="orders,customer")
    ops = {r.op for r in df.select("op").distinct().collect()}
    assert ops <= {"insert", "update", "delete"}
    tbls = {r.tbl for r in df.select("tbl").distinct().collect()}
    assert tbls == {"orders", "customer"}
    # deletes carry a null payload marker; upserts carry JSON
    bad = df.filter(
        ((F.col("op") == "delete") & (F.col("payload") != "null"))
        | (
            (F.col("op") != "delete")
            & ~F.col("payload").startswith('{"balance":')
        )
    ).count()
    assert bad == 0


def test_generated_log_feeds_apply_changes(cdclog):
    """End to end: custom source → latest-change-wins merge. The merged
    state must equal a pandas replay of the same log."""
    from cdc_init_spark.streaming.apply import apply_changes

    log = _read(cdclog, rows=600, partitions=3, tables="t0", keyspace=50)
    base = cdclog.range(50).select(
        F.col("id").alias("pk"), F.lit(0.0).alias("balance")
    )
    changes = log.select(
        "pk",
        "ts",
        F.col("op").alias("type"),
        F.get_json_object("payload", "$.balance").cast("double").alias(
            "balance"
        ),
    )
    merged = {
        r.pk: r.balance
        for r in apply_changes(base, changes, ["pk"], "ts").collect()
    }
    # python replay
    rows = sorted(log.collect(), key=lambda r: r.ts)
    state = {pk: 0.0 for pk in range(50)}
    for r in rows:
        if r.op == "delete":
            state.pop(r.pk, None)
        else:
            import json

            state[r.pk] = json.loads(r.payload)["balance"]
    assert merged == state


def test_streaming_reader_accumulates_deterministically(cdclog, tmp_path):
    """readStream on the custom source: micro-batches advance the row
    offset; the accumulated rows equal the batch source's first N rows
    (same generator, partition 0)."""
    stream = (
        cdclog.readStream.format("cdclog")
        .option("batch_rows", 50)
        .option("tables", "t0")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cdclog_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        n = cdclog.sql("SELECT COUNT(*) FROM cdclog_stream").collect()[0][0]
        if n >= 150:
            break
        time.sleep(1)
    q.stop()
    got = cdclog.sql("SELECT * FROM cdclog_stream").collect()
    assert len(got) >= 150
    # deterministic: first 100 streamed rows == batch rows 0..99 of the
    # single-partition generator with the same options
    batch = _read(cdclog, rows=100, partitions=1, tables="t0").collect()
    streamed = sorted(got, key=lambda r: r.ts)[:100]
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]
