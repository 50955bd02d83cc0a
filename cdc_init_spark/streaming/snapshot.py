"""Snapshot seeding — the reference's one real data-plane query.

The reference creates a server-side seed VIEW adding `cdc.*` metadata
columns (reference: components/seed_store.clj:25-33,106-113;
sql/seeds/create_seed_view.sql), scans it row-at-a-time, and emits one
keyed DML message per row. Spark-first equivalent: the "view" is a column
projection, the scan is a parquet/JDBC DataFrame, and the message encoding
is the canonical_json column expression — one narrow stage, no shuffle,
scaling linearly with input splits.

Two consumption paths:
- ``seed_frame``: the (key, value) DataFrame — feed straight to
  ``df.write.format("kafka")`` (bulk, batch-atomic acks; the 100 TB path).
- ``SparkSeedStore.seeds``: a driver-side iterator over the same frame
  (``toLocalIterator``) preserving the reference's per-record send +
  exact 2%-progress contract (core.clj:158-175) for the control-plane
  pipelines and their property tests.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_init_spark.functions.canonical_json import seed_messages
from cdc_init_spark.streaming.stores import SeedStore


def with_cdc_metadata(
    df: DataFrame,
    table: str,
    pk_cols: list[str],
    user_id: str = "cdc-init-spark",
    timestamp: Column | None = None,
) -> DataFrame:
    """The seed-view projection (A17): source columns plus `cdc.*`
    metadata — type, table, info.user_id, info.timestamp (ISO-8601 with
    timezone, matching seed_store_test.clj:62), and id.* copied from the
    primary-key columns."""
    ts = timestamp if timestamp is not None else F.date_format(
        F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx"
    )
    out = df.withColumns(
        {
            "cdc.type": F.lit("insert"),
            "cdc.table": F.lit(table),
            "cdc.info.user_id": F.lit(user_id),
            "cdc.info.timestamp": ts,
        }
    )
    for pk in pk_cols:
        out = out.withColumn(f"cdc.id.{pk.lower()}", F.col(f"`{pk}`"))
    return out


def seed_frame(
    df: DataFrame,
    table: str,
    pk_cols: list[str],
    user_id: str = "cdc-init-spark",
    timestamp: Column | None = None,
) -> DataFrame:
    """Source table → (key STRING, value STRING) message frame."""
    return seed_messages(with_cdc_metadata(df, table, pk_cols, user_id, timestamp))


class SparkSeedStore(SeedStore):
    """SeedStore over Spark DataFrames (protocols.clj:24-27 / the
    IFSSeedStore of seed_store.clj:85-115, minus the PL/SQL).

    ``resolve`` maps a table reference to its source DataFrame;
    ``pk_resolver`` maps it to the primary-key column list (the reference
    gets both from the database; here they're engine configuration).
    """

    def __init__(
        self,
        resolve: Callable[[str], DataFrame],
        pk_resolver: Callable[[str], list[str]],
        user_id: str = "cdc-init-spark",
    ) -> None:
        self._resolve = resolve
        self._pks = pk_resolver
        self._user_id = user_id

    def record_count(self, table: str) -> int:
        """A16 — count pushed into the engine (df.count: a partial-agg
        job, no data movement beyond per-partition counts)."""
        return self._resolve(table).count()

    def frame(self, table: str, table_alias: str | None = None) -> DataFrame:
        return seed_frame(
            self._resolve(table), table, self._pks(table), self._user_id
        )

    def seeds(self, table: str, table_alias: str | None = None) -> Iterator[Any]:
        """Row-at-a-time iterator (backpressured like the reference's
        unbuffered channel, seed_store.clj:102 — toLocalIterator pulls
        one partition at a time on demand)."""
        for row in self.frame(table, table_alias).toLocalIterator():
            yield {"key": row["key"], "value": row["value"]}
