"""Idempotent foreachBatch sinks (SURVEY T8).

Structured Streaming re-delivers a micro-batch after a crash-restart
(at-least-once into foreachBatch); an idempotent sink makes the end-to-end
pipeline effectively exactly-once. Pattern: key every write by
``batch_id`` — a replayed batch overwrites/skips its own output instead of
appending a duplicate. The reference needs none of this (its per-record
sends land on a compacted keyed topic — last-value-wins IS its idempotency
mechanism, topic_store.clj:13-16); this is the engine's generalization for
non-compacted sinks.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


class IdempotentBatchSink:
    """Parquet-partitioned-by-batch sink: each micro-batch lands in
    ``root/batch_id=N`` via dynamic partition overwrite, so replaying
    batch N replaces its own files. Use as
    ``stream.writeStream.foreachBatch(sink)``."""

    def __init__(self, root: str) -> None:
        self.root = root

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.root)
        )

    def completed_batches(self) -> list[int]:
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            if name.startswith("batch_id="):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)


def skip_replayed(
    marker_dir: str, fn: Callable[[DataFrame, int], None]
) -> Callable[[DataFrame, int], None]:
    """Wrap a non-idempotent foreachBatch function: record a marker file
    per completed batch; a replayed batch_id is skipped entirely. (The
    write-then-mark order means a crash between them replays the batch —
    at-least-once within the batch, exactly-once beyond it.)"""
    os.makedirs(marker_dir, exist_ok=True)

    def wrapped(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"{batch_id:020d}.done")
        if os.path.exists(marker):
            return
        fn(batch_df, batch_id)
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write("ok\n")

    return wrapped
