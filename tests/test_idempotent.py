"""T8: idempotent foreachBatch sinks — replayed batches don't duplicate."""

from __future__ import annotations

from cdc_init_spark.streaming.idempotent import IdempotentBatchSink, skip_replayed


def test_idempotent_batch_sink_overwrites_replays(spark, tmp_path):
    root = str(tmp_path / "sink")
    sink = IdempotentBatchSink(root)
    df = spark.range(10)
    sink(df, 0)
    sink(df, 1)
    sink(df, 0)  # replay of batch 0 — must overwrite, not append
    assert sink.completed_batches() == [0, 1]
    total = spark.read.parquet(root).count()
    assert total == 20


def test_skip_replayed_marker(spark, tmp_path):
    calls = []
    fn = skip_replayed(str(tmp_path / "markers"), lambda df, bid: calls.append(bid))
    df = spark.range(1)
    fn(df, 0)
    fn(df, 1)
    fn(df, 0)  # replay — skipped
    assert calls == [0, 1]
