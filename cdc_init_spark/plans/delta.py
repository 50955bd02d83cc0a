"""DeltaLogFormat corpus queries (VERDICT r6 "Next round" item 1).

The format's ACID machinery (sources/delta_log.py: commit, OCC,
checkpoint replay, stats skipping, CDC reads) is pytest-covered but was
invisible to the driver's hard external gate. These entries route the
ALREADY-ORACLE-GREEN CDC shapes (q79 apply, q141 time travel, q142
diff) THROUGH the format — init a real DeltaLog table from the fixture
parquet, commit DML against it, read committed files back — so a hash
mismatch in any layer (data-file writing, log replay, merge
copy-on-write, version time travel, change-data derivation) surfaces as
a driver CORRECTNESS failure, not just a unit-test failure.

Reference parity: the compacted last-state store the reference keeps in
Kafka (components/topic_store.clj:13-16) and the idempotent seed replay
(components/seed_store.clj:98-115), realized lakehouse-side.

Scale note: each query materializes a real on-disk table under a
per-process scratch dir (rebuilt per invocation, removed at exit). The
work is the format's own IO — exactly what the entries exist to gate.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_init_spark.functions.compat import round_compat
from cdc_init_spark.plans import query
from cdc_init_spark.tables import load_table

_SCRATCH = os.path.join(
    tempfile.gettempdir(), f"cdc_init_spark_delta-{os.getpid()}"
)
atexit.register(shutil.rmtree, _SCRATCH, ignore_errors=True)


def _workdir(name: str, sf_dir: str) -> str:
    """Fresh per-(query, sf) table root; prior contents of the same slot
    are removed so repeated invocations (warmup + timed bench runs)
    don't accumulate state or disk."""
    base = os.path.basename(sf_dir.rstrip("/")) or "sf"
    d = os.path.join(_SCRATCH, f"{name}-{base}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    return d


def _customer_change_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q79 change vocabulary: events replayed as keyed DML over the
    customer snapshot — signup/purchase upsert the balance, error
    deletes the customer; latest change per key wins. Restricted to
    keys present in the snapshot (the oracle starts FROM customer)."""
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type").isin("signup", "purchase", "error"))
        .select(
            F.col("user_id").alias("c_custkey"),
            F.col("ts"),
            F.when(F.col("event_type") == "error", "delete")
            .otherwise("update")
            .alias("type"),
            F.lit(None).cast("string").alias("c_name"),
            F.lit(None).cast("int").alias("c_nationkey"),
            F.col("value").alias("c_acctbal"),
            F.lit(None).cast("string").alias("c_mktsegment"),
        )
        .join(c.select("c_custkey"), on="c_custkey", how="left_semi")
    )


_MERGED_STATE_ORACLE = """
    WITH latest AS (
      SELECT user_id,
             max_by(event_type, ts) AS op,
             max_by(value, ts) AS new_bal
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
      GROUP BY user_id
    )
    SELECT c.c_custkey,
           ROUND(CASE WHEN l.user_id IS NOT NULL THEN l.new_bal
                      ELSE c.c_acctbal END, 4) AS acctbal
    FROM customer c
    LEFT JOIN latest l ON l.user_id = c.c_custkey AND l.op <> 'error'
    WHERE NOT EXISTS (
      SELECT 1 FROM latest d WHERE d.user_id = c.c_custkey AND d.op = 'error'
    )
    ORDER BY c.c_custkey
    """


@query("q203_delta_merge_read", oracle=_MERGED_STATE_ORACLE)
def q203(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed MERGE through the format: init customer as a DeltaLog
    table, merge the q79 change set (copy-on-write: stats skip + exact
    touch set, sources/delta_log.py:merge), read the committed files
    back. Oracle = the same DML applied in pure SQL — so the round trip
    through data-file writing, the action log, and replay is
    hash-gated, not just the in-memory apply_changes (q79)."""
    from cdc_init_spark.sources.delta_log import DeltaLogFormat

    fmt = DeltaLogFormat(_workdir("q203", sf_dir))
    fmt.init({"customer": load_table(spark, sf_dir, "customer")})
    fmt.merge(
        spark, "customer", _customer_change_set(spark, sf_dir),
        pk_cols=["c_custkey"], order_col="ts", batch_id=0,
    )
    return (
        fmt.read(spark, "customer")
        .select(
            "c_custkey", round_compat(F.col("c_acctbal"), 4).alias("acctbal")
        )
        .orderBy("c_custkey")
    )


@query("q204_delta_time_travel", oracle=_MERGED_STATE_ORACLE)
def q204(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version time travel through the format: after the q203 merge
    (v1), a second destructive merge deletes every 7th customer (v2,
    also crossing a checkpoint at interval 2) and a compact rewrites the
    layout (v3) — then READ VERSION 1. The oracle describes v1 only, so
    any leakage from later versions (wrong replay horizon, checkpoint
    shortcut past the target, compaction clobbering history) is a hash
    mismatch."""
    from cdc_init_spark.sources.delta_log import DeltaLogFormat

    c = load_table(spark, sf_dir, "customer")
    fmt = DeltaLogFormat(_workdir("q204", sf_dir), checkpoint_interval=2)
    fmt.init({"customer": c})
    fmt.merge(
        spark, "customer", _customer_change_set(spark, sf_dir),
        pk_cols=["c_custkey"], order_col="ts", batch_id=0,
    )
    deletes = c.filter(F.col("c_custkey") % 7 == 3).select(
        "c_custkey",
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit("delete").alias("type"),
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("int").alias("c_nationkey"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
    )
    fmt.merge(
        spark, "customer", deletes, pk_cols=["c_custkey"],
        order_col="ts", batch_id=1,
    )
    fmt.compact(spark, "customer", target_files=2)
    return (
        fmt.read(spark, "customer", version=1)
        .select(
            "c_custkey", round_compat(F.col("c_acctbal"), 4).alias("acctbal")
        )
        .orderBy("c_custkey")
    )


_MOR_STATE_ORACLE = """
    WITH latest AS (
      SELECT user_id,
             max_by(event_type, ts) AS op,
             max_by(value, ts) AS new_bal
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
      GROUP BY user_id
    )
    SELECT c.c_custkey,
           ROUND(CASE WHEN l.user_id IS NOT NULL THEN l.new_bal
                      ELSE c.c_acctbal END, 4) AS acctbal
    FROM customer c
    LEFT JOIN latest l ON l.user_id = c.c_custkey AND l.op <> 'error'
    WHERE NOT EXISTS (
      SELECT 1 FROM latest d WHERE d.user_id = c.c_custkey AND d.op = 'error'
    )
    AND c.c_custkey % 7 <> 3
    ORDER BY c.c_custkey
    """


def _mor_table(spark: SparkSession, sf_dir: str, name: str):
    """Shared q207/q208 setup: two stacked merge-on-read merges — the
    q203 change set (v1) then a delete of every 7th customer (v2) —
    against the customer snapshot. Neither merge rewrites a data file;
    both suppress old rows via deletion-vector key files."""
    from cdc_init_spark.sources.delta_log import DeltaLogFormat

    c = load_table(spark, sf_dir, "customer")
    fmt = DeltaLogFormat(_workdir(name, sf_dir))
    fmt.init({"customer": c})
    fmt.merge(
        spark, "customer", _customer_change_set(spark, sf_dir),
        pk_cols=["c_custkey"], order_col="ts", batch_id=0, strategy="mor",
    )
    deletes = c.filter(F.col("c_custkey") % 7 == 3).select(
        "c_custkey",
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit("delete").alias("type"),
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("int").alias("c_nationkey"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
    )
    fmt.merge(
        spark, "customer", deletes, pk_cols=["c_custkey"],
        order_col="ts", batch_id=1, strategy="mor",
    )
    return fmt


def _mor_projection(df: DataFrame) -> DataFrame:
    return df.select(
        "c_custkey", round_compat(F.col("c_acctbal"), 4).alias("acctbal")
    ).orderBy("c_custkey")


@query("q207_delta_mor_read", oracle=_MOR_STATE_ORACLE)
def q207(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read through the format (VERDICT r7 stretch item 8; the
    Delta deletion-vector / Iceberg-v2 equality-delete shape): two
    stacked ``strategy="mor"`` merges — the q203 DML set (v1), then a
    delete of every 7th customer (v2) — write ZERO rewritten files;
    each commit adds only its change rows plus a delete-key file scoped
    to the files it suppresses keys in. The read plans the anti-join of
    dv keys against exactly the files each dv applies to
    (sources/delta_log.py:_read_files), so the oracle hash gates: dv
    scoping, stacked-dv composition across versions (v2's delete must
    also suppress rows v1 ADDED), and upsert-over-dv precedence."""
    return _mor_projection(
        _mor_table(spark, sf_dir, "q207").read(spark, "customer")
    )


@query("q208_delta_mor_compact", oracle=_MOR_STATE_ORACLE)
def q208(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compact() as the merge-on-read reconciler: after the q207 merges,
    compaction reads THROUGH the deletion vectors, rewrites the layout,
    and retires every dv — the read-optimized state must be
    byte-equivalent to the dv-applied state (same oracle as q207). A
    reconciler that drops suppressed keys incorrectly, resurrects
    dv-deleted rows, or leaves a dangling dv action is a hash mismatch
    (or a loud read failure on the vacuumed dv file)."""
    fmt = _mor_table(spark, sf_dir, "q208")
    fmt.compact(spark, "customer", target_files=2)
    if fmt._snapshot().dvs.get("customer"):
        raise AssertionError("compact() left live deletion vectors behind")
    return _mor_projection(fmt.read(spark, "customer"))


@query(
    "q205_delta_cdc_read",
    oracle="""
    WITH latest AS (
      SELECT user_id,
             max_by(event_type, ts) AS op,
             max_by(value, ts) AS new_bal
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
      GROUP BY user_id
    )
    SELECT c.c_custkey,
           CASE WHEN l.op = 'error' THEN 'delete' ELSE 'update' END AS type,
           CASE WHEN l.op = 'error' THEN NULL
                ELSE ROUND(l.new_bal, 4) END AS acctbal
    FROM customer c JOIN latest l ON l.user_id = c.c_custkey
    ORDER BY c.c_custkey
    """,
)
def q205(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC read over the format (Delta's table_changes):
    changes_between(v0, v1) recovers exactly the compacted DML set the
    merge applied — the q142 diff law, but measured across the format's
    committed versions instead of in-memory frames. The oracle derives
    the same delta directly from the event log."""
    from cdc_init_spark.sources.delta_log import DeltaLogFormat

    fmt = DeltaLogFormat(_workdir("q205", sf_dir))
    fmt.init({"customer": load_table(spark, sf_dir, "customer")})
    fmt.merge(
        spark, "customer", _customer_change_set(spark, sf_dir),
        pk_cols=["c_custkey"], order_col="ts", batch_id=0,
    )
    d = fmt.changes_between(spark, "customer", 0, 1, ["c_custkey"])
    return d.select(
        "c_custkey",
        "type",
        round_compat(F.col("c_acctbal"), 4).alias("acctbal"),
    ).orderBy("c_custkey")


@query(
    "q206_delta_live_loop",
    oracle="""
    WITH latest AS (
      SELECT user_id,
             max_by(event_type, ts) AS op,
             max_by(value, ts) AS new_bal
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
      GROUP BY user_id
    ),
    eff AS (
      SELECT c.c_custkey, c.c_nationkey,
             CASE WHEN l.user_id IS NOT NULL THEN l.new_bal
                  ELSE c.c_acctbal END AS bal
      FROM customer c
      LEFT JOIN latest l ON l.user_id = c.c_custkey AND l.op <> 'error'
      WHERE NOT EXISTS (
        SELECT 1 FROM latest d WHERE d.user_id = c.c_custkey AND d.op = 'error'
      )
    )
    SELECT c_nationkey, ROUND(SUM(bal), 2) AS sum_bal, COUNT(*) AS n_rows
    FROM eff GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def q206(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ENTIRE lifecycle as one externally-gated artifact
    (VERDICT r7 item 4; snapshot-then-live, core.clj:154-182 +
    initializer.clj:101-110): seed the customer snapshot into a
    CDF-enabled DeltaLog table (v0), apply the event-derived DML in two
    keyed merges (v1, v2), SUBSCRIBE to the table's change feed
    (sources/delta_cdf.py), and maintain a continuously-updated
    per-nation balance aggregate from the streamed micro-batches
    (streaming/apply.continuous_agg_step: log-proportional incremental
    view maintenance, committed atomically per version into a second
    DeltaLog table). The returned frame is the STREAM-MAINTAINED
    aggregate; the oracle recomputes it from scratch in SQL — so every
    layer (merge copy-on-write, change-data files, offset planning,
    Arrow batch reads, incremental_agg arithmetic, replay-gated
    commits) sits inside one hash gate."""
    import os as _os

    from cdc_init_spark.sources.delta_cdf import read_change_stream
    from cdc_init_spark.sources.delta_log import DeltaLogFormat
    from cdc_init_spark.streaming.apply import (
        compact_changes,
        continuous_agg_step,
        init_continuous_agg,
        read_continuous_agg,
    )

    d = _workdir("q206", sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    fmt = DeltaLogFormat(_os.path.join(d, "table"), enable_cdf=True)
    fmt.init({"customer": customer})
    # one final change per key (pre-compacted), split across two merges
    # by key parity so each key's change lands in exactly one version —
    # no delete-then-resurrect across versions, which would violate
    # incremental_agg's existing-keys contract
    changes = compact_changes(
        _customer_change_set(spark, sf_dir), ["c_custkey"], "ts"
    )
    fmt.merge(
        spark, "customer", changes.filter(F.col("c_custkey") % 2 == 0),
        pk_cols=["c_custkey"], order_col="ts", batch_id=0,
    )
    fmt.merge(
        spark, "customer", changes.filter(F.col("c_custkey") % 2 == 1),
        pk_cols=["c_custkey"], order_col="ts", batch_id=1,
    )

    view = DeltaLogFormat(_os.path.join(d, "view"))
    step = continuous_agg_step(
        spark, view, ["c_custkey"], ["c_nationkey"], "c_acctbal",
        order_col="_ord", type_col="type",
    )
    data_cols = customer.columns

    def sink(batch_df: DataFrame, _bid: int) -> None:
        batch_df = batch_df.persist()
        try:
            versions = sorted(
                r[0]
                for r in batch_df.select("_commit_version").distinct().collect()
            )
            for v in versions:
                part = batch_df.filter(F.col("_commit_version") == v)
                if v == 0:
                    # the seed snapshot (v0 inserts) becomes the view's base
                    if not view.has_table("base"):
                        init_continuous_agg(part.select(*data_cols), view)
                else:
                    # each committed version is one keyed DML batch;
                    # its version number doubles as the replay gate id
                    step(
                        part.select(*data_cols, "type").withColumn(
                            "_ord", F.lit(v)
                        ),
                        v,
                    )
        finally:
            batch_df.unpersist()

    q = (
        read_change_stream(spark, fmt.root, "customer")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", _os.path.join(d, "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()

    return (
        read_continuous_agg(spark, view, "agg")
        .select(
            "c_nationkey",
            round_compat(F.col("sum_value"), 2).alias("sum_bal"),
            F.col("n_rows"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q209_delta_column_mapping",
    oracle="""
    WITH latest AS (
      SELECT user_id,
             max_by(event_type, ts) AS op,
             max_by(value, ts) AS new_bal
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
      GROUP BY user_id
    )
    SELECT c.c_custkey,
           ROUND(CASE WHEN l.user_id IS NOT NULL THEN l.new_bal
                      ELSE c.c_acctbal END, 4) AS balance,
           CAST(NULL AS VARCHAR) AS segment_v2
    FROM customer c
    LEFT JOIN latest l ON l.user_id = c.c_custkey AND l.op <> 'error'
    WHERE NOT EXISTS (
      SELECT 1 FROM latest d WHERE d.user_id = c.c_custkey AND d.op = 'error'
    )
    UNION ALL
    SELECT * FROM (VALUES
      (CAST(9000001 AS BIGINT), CAST(111.5 AS DOUBLE), 'SEG_A'),
      (CAST(9000002 AS BIGINT), CAST(222.25 AS DOUBLE), 'SEG_B')
    ) v(c_custkey, balance, segment_v2)
    ORDER BY c_custkey
    """,
)
def q209(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-mapping schema evolution through the format (VERDICT r8
    item 2, the Delta columnMapping.mode=name / Iceberg field-ID
    shape; sources/delta_log.py:rename_column/drop_column): rename
    ``c_acctbal`` → ``balance`` (a METADATA-ONLY commit — the stored
    bytes keep their stable physical name), MERGE the q203 change set
    addressed at the NEW logical name (stats skipping and the exact-
    touch probe must translate logical→physical to keep pruning),
    DROP ``c_mktsegment`` (its physical name retires), then re-add a
    column of the SAME logical name via additive append evolution —
    which must mint a FRESH physical name, so every pre-drop row reads
    the re-added column as NULL instead of resurrecting the retired
    bytes. The oracle recomputes the final state in pure SQL: merged
    balances under the new name, NULL segment for every original row
    (the anti-resurrection law, hash-gated), and the two appended rows
    with their literal segments."""
    from cdc_init_spark.sources.delta_log import DeltaLogFormat

    fmt = DeltaLogFormat(_workdir("q209", sf_dir))
    fmt.init({"customer": load_table(spark, sf_dir, "customer")})
    fmt.rename_column("customer", "c_acctbal", "balance")
    fmt.merge(
        spark, "customer",
        _customer_change_set(spark, sf_dir).withColumnRenamed(
            "c_acctbal", "balance"
        ),
        pk_cols=["c_custkey"], order_col="ts", batch_id=0,
    )
    fmt.drop_column("customer", "c_mktsegment")
    fmt.append(
        "customer",
        spark.createDataFrame(
            [
                (9000001, "added-1", 1, 111.5, "SEG_A"),
                (9000002, "added-2", 2, 222.25, "SEG_B"),
            ],
            "c_custkey long, c_name string, c_nationkey int, "
            "balance double, c_mktsegment string",
        ),
    )
    snap = fmt._snapshot()
    if snap.mappings["customer"].get("balance") != "c_acctbal":
        raise AssertionError("rename did not keep the stable physical name")
    if snap.mappings["customer"].get("c_mktsegment", "c_mktsegment") == (
        "c_mktsegment"
    ):
        raise AssertionError("re-added column did not mint a fresh physical")
    return (
        fmt.read(spark, "customer")
        .select(
            "c_custkey",
            round_compat(F.col("balance"), 4).alias("balance"),
            F.col("c_mktsegment").alias("segment_v2"),
        )
        .orderBy("c_custkey")
    )
