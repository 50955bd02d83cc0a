"""CDC apply — merge captured DML messages onto a base snapshot.

The reference only CAPTURES changes (trigger → queue → compacted topic);
consuming them is left to downstream systems. A complete engine needs the
other half: given a base snapshot and a stream/batch of keyed DML messages
(insert/update/delete, the reference's message vocabulary —
components/seed_store.clj message shape, README.md:10-21), produce the
current state.

Semantics (log-compaction equivalent, matching the reference's compacted
topics — topic_store.clj:15):
- per key, the LATEST message wins (ties impossible: the capture side
  stamps strictly increasing per-key sequence/ts);
- latest = delete → the key disappears;
- latest = insert/update → the key carries that message's data;
- keys never mentioned keep their base row.

Execution shape at 100 TB: one shuffle of the (small) change set on the
key + one shuffle/broadcast join against the base — never a row-at-a-time
merge. For continuous application, feed micro-batches of changes through
``foreachBatch`` into this same function against a Delta/parquet base.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELETE_TYPES = ("delete",)
UPSERT_TYPES = ("insert", "update")


def compact_changes(changes: DataFrame, pk_cols: list[str], order_col: str) -> DataFrame:
    """Latest change per key (A2's max_by compaction over the change log)."""
    cols = changes.columns
    return (
        changes.groupBy(*pk_cols)
        .agg(F.max_by(F.struct(*cols), F.col(order_col)).alias("_s"))
        .select("_s.*")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    pk_cols: list[str],
    order_col: str = "ts",
    type_col: str = "type",
) -> DataFrame:
    """Apply a keyed DML change set to a base snapshot → current state.

    ``changes`` must contain pk_cols + order_col + type_col + the base's
    data columns (extra columns ignored). Returns the base schema."""
    data_cols = [c for c in base.columns]
    latest = compact_changes(changes, pk_cols, order_col)

    # rows whose latest change is an upsert become/replace their key's row
    upserts = latest.filter(F.col(type_col).isin(*UPSERT_TYPES)).select(
        *[F.col(c) for c in data_cols]
    )
    # every touched key (upserted or deleted) is removed from the base...
    touched = latest.select(*pk_cols)
    untouched = base.join(touched, on=pk_cols, how="left_anti")
    # ...and upserts are appended back — deletes simply never return
    return untouched.unionByName(upserts)
