"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic CDC change-log generator — the engine's own test/bench
feed, and a working example of the newest Spark extension point for
users who need a source Spark doesn't ship.

Reference tie-in: the rows mirror the DML-message shape the reference's
seed/trigger path emits (op, table, pk, ts, payload —
/root/reference/src/cdc_init/components/seed_store.clj:38-55); a
generated log feeds `streaming/apply.apply_changes` end-to-end in the
tests, so the source → merge pipeline is exercised without any external
system.

Scale shape: `partitions()` declares N independent splits; each
executor-side `read(partition)` generates its slice from
(seed, partition, i) alone — stateless, no driver data transfer, linear
scale-out like any file source. Determinism: every value derives from
md5 of the (seed, partition, row) triple, so the same options produce
the same rows on any cluster, any partitioning, any engine.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_SCHEMA = (
    "op string, tbl string, pk bigint, ts timestamp, payload string"
)
_OPS = ("insert", "update", "update", "delete")  # update-heavy, like real CDC
_BASE_TS = datetime(2026, 1, 1)


def _h(seed: int, part: int, i: int, field: str) -> int:
    d = hashlib.md5(f"{seed}:{part}:{i}:{field}".encode()).digest()
    return int.from_bytes(d[:8], "big")


class CdcLogDataSource(DataSource):
    """`spark.read.format("cdclog")` options:
    rows (total, default 1000), partitions (default 4), seed (default 42),
    tables (comma-separated logical table names, default "t0,t1"),
    keyspace (pk range per table, default 100)."""

    @classmethod
    def name(cls) -> str:
        return "cdclog"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "CdcLogReader":
        return CdcLogReader(self.options)

    def simpleStreamReader(self, schema) -> "CdcLogStreamReader":
        return CdcLogStreamReader(self.options)


class CdcLogReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        self.tables = tuple(
            t for t in str(options.get("tables", "t0,t1")).split(",") if t
        )
        self.keyspace = int(options.get("keyspace", 100))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        part = partition.value
        # contiguous row ranges per partition; remainder to the earliest
        base, rem = divmod(self.rows, self.n_parts)
        count = base + (1 if part < rem else 0)
        for i in range(count):
            op = _OPS[_h(self.seed, part, i, "op") % len(_OPS)]
            tbl = self.tables[_h(self.seed, part, i, "tbl") % len(self.tables)]
            pk = _h(self.seed, part, i, "pk") % self.keyspace
            # strictly increasing within a partition → realistic per-split
            # ordering; microsecond offset keyed by partition avoids
            # cross-partition ts collisions
            ts = _BASE_TS + timedelta(
                seconds=i, microseconds=_h(self.seed, part, i, "ts") % 1_000_000
            )
            val = _h(self.seed, part, i, "val") % 10_000
            payload = (
                "null"
                if op == "delete"
                else f'{{"balance": {val / 100.0:.2f}}}'
            )
            yield (op, tbl, pk, ts, payload)


def register(spark) -> None:
    """Idempotent registration: `spark.read.format("cdclog")` afterwards."""
    spark.dataSource.register(CdcLogDataSource)


class CdcLogStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: each micro-batch emits the next ``batch_rows``
    change rows of the same deterministic sequence (partition 0 of the
    batch generator, offset = row index). Offsets are replayable —
    ``readBetweenOffsets(start, end)`` regenerates exactly the rows of
    any committed range, so checkpoint recovery re-reads identical data
    (the at-least-once contract the reference's control loop assumes,
    initializer.clj:27-39)."""

    def __init__(self, options: dict) -> None:
        self.batch_rows = int(options.get("batch_rows", 100))
        self.seed = int(options.get("seed", 42))
        self.tables = tuple(
            t for t in str(options.get("tables", "t0,t1")).split(",") if t
        )
        self.keyspace = int(options.get("keyspace", 100))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _rows(self, start: int, end: int):
        for i in range(start, end):
            op = _OPS[_h(self.seed, 0, i, "op") % len(_OPS)]
            tbl = self.tables[_h(self.seed, 0, i, "tbl") % len(self.tables)]
            pk = _h(self.seed, 0, i, "pk") % self.keyspace
            ts = _BASE_TS + timedelta(
                seconds=i, microseconds=_h(self.seed, 0, i, "ts") % 1_000_000
            )
            val = _h(self.seed, 0, i, "val") % 10_000
            payload = (
                "null" if op == "delete" else f'{{"balance": {val / 100.0:.2f}}}'
            )
            yield (op, tbl, pk, ts, payload)

    def read(self, start: dict):
        lo = start["row"]
        hi = lo + self.batch_rows
        # materialized list iterator, not a generator: Spark's prefetch
        # cache copy.copy()s the iterator (generators aren't copyable)
        return iter(list(self._rows(lo, hi))), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["row"], end["row"])

    def commit(self, end: dict) -> None:
        pass
