"""Temporal analytics operators: SCD2 history build, time-series
resample/gap-fill, ordered funnel analysis (EXT, B-IX adjacent).

Origin: EXT — the reference's data plane emits a change LOG (one keyed DML
message per row change, /root/reference/src/cdc_init/components/seed_store.clj:38-55)
but never materializes history or time-bucketed views of it; these
operators are the standard consumers of exactly that log shape:

- ``scd2_history`` turns a change log into a Type-2 slowly-changing
  dimension (validity-interval) table — the warehouse-side complement of
  ``streaming/apply.apply_changes`` (which keeps only the latest state,
  the compacted-topic semantics of topic_store.clj:15).
- ``resample`` / gap-fill regularizes an event stream onto a fixed
  time grid with forward-fill — the batch twin of the streaming window
  aggregates (streaming/windows.py).
- ``funnel`` computes ordered-stage conversion over an event stream.

Scale notes (100 TB): every operator here shuffles at most once on the
entity key and then works inside per-key windows (Spark's window exec
sorts within partitions — no global sort). ``resample`` explodes the
per-key time grid from per-key min/max aggregates, so grid size is
O(keys × buckets), never a cross join against a global calendar.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
) -> DataFrame:
    """Build a Type-2 slowly-changing-dimension history from a change log:
    consecutive duplicate states per key are compressed away, and each
    surviving state change opens a validity interval ``[valid_from,
    valid_to)`` — ``valid_to`` is NULL for the current (open) state.

    One shuffle on ``key_col``; both windows share the same partitioning
    and sort, so Catalyst plans a single exchange + sort. Within-key
    order is ``ts_col`` (caller guarantees uniqueness per key, as the
    fixtures do — SURVEY §2.3 Q23 note)."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    changed = (
        df.select(key_col, ts_col, state_col)
        .withColumn("_prev", F.lag(state_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col)))
        .drop("_prev")
    )
    return (
        changed.withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumnRenamed(ts_col, "valid_from")
        .select(key_col, state_col, "valid_from", "valid_to")
    )


def resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "6 hours",
    fill: str = "ffill",
) -> DataFrame:
    """Regularize an event stream onto a fixed epoch-aligned time grid
    per key: every bucket between each key's first and last event exists
    in the output (gap-fill), with ``n`` = event count (0 for gaps),
    ``value_sum`` = per-bucket sum (NULL for gaps) and ``filled`` = the
    forward-filled ``value_sum`` (last non-null earlier bucket).

    Buckets come from ``F.window(ts, bucket).start`` — the exact
    expression Structured Streaming's tumbling windows use, so batch
    resample and streaming aggregation share one bucket semantic.

    Scale: the raw stream is scanned and shuffled ONCE — the per-key
    span that seeds the grid is aggregated from the (key, bucket)
    aggregate, not from the raw rows (r6: the grid branch used to
    rescan ``df`` and shuffle every raw row a second time; deriving it
    from ``per_bucket`` makes the span a keys-sized rollup of an
    already-aggregated frame, and Spark's ReuseExchange dedupes the
    shared (key, bucket) exchange under the two consumers). Grid rows
    = O(keys × span/bucket); the join back is key-equi (AQE broadcasts
    the aggregate side when small) and the forward-fill window reuses
    the same key partitioning."""
    if fill != "ffill":
        raise ValueError(f"unsupported fill mode {fill!r}")
    b = F.window(ts_col, bucket)["start"]
    per_bucket = (
        df.select(F.col(key_col), b.alias("bucket"), F.col(value_col))
        .groupBy(key_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("value_sum"),
        )
    )
    interval = F.expr(f"INTERVAL {bucket}")
    grid = (
        per_bucket.groupBy(key_col)
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            key_col,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"), interval)).alias(
                "bucket"
            ),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(per_bucket, on=[key_col, "bucket"], how="left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .withColumn("filled", F.last("value_sum", ignorenulls=True).over(w))
    )


def funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Ordered funnel: for each key, the deepest prefix of ``stages``
    completed in strict temporal order (stage i+1 must happen strictly
    AFTER the earliest completion of stage i). Returns one row per key
    with ``stage`` = number of stages reached (0..len(stages)) and the
    per-stage completion timestamps ``t1..tn`` (NULL once the funnel
    breaks).

    The classic implementation is an iterated self-join (one per stage);
    this one is a single aggregation: per key, collect the sorted event
    times of each stage type once, then fold the "first element after
    the previous stage's time" lookup with ``F.filter`` +
    ``array_min`` on the (small, per-key) collected arrays. One shuffle
    on the key, no joins, no window."""
    if not stages:
        raise ValueError("stages must be non-empty")
    ev = df.filter(F.col(type_col).isin(*stages)).select(
        F.col(key_col), F.col(ts_col).alias("_ts"), F.col(type_col).alias("_ty")
    )
    agg = ev.groupBy(key_col).agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col("_ty") == s, F.col("_ts")))
            ).alias(f"_ts_{i}")
            for i, s in enumerate(stages)
        ]
    )
    # t1 = earliest stage-0 event; t_{i+1} = earliest stage-i+1 event
    # strictly after t_i. array_min(filter(...)) is NULL-propagating:
    # once a stage is missing, all later stages are NULL.
    def _after(prev: F.Column):
        return lambda x: x > prev

    out = agg.withColumn("t1", F.array_min(F.col("_ts_0")))
    for i in range(1, len(stages)):
        out = out.withColumn(
            f"t{i + 1}",
            F.array_min(F.filter(F.col(f"_ts_{i}"), _after(F.col(f"t{i}")))),
        )
    stage_expr = sum(
        (F.col(f"t{i + 1}").isNotNull().cast("int") for i in range(len(stages))),
        F.lit(0),
    )
    return out.select(
        key_col,
        stage_expr.alias("stage"),
        *[F.col(f"t{i + 1}") for i in range(len(stages))],
    )


def retention_cohorts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bucket: str = "week",
) -> DataFrame:
    """Retention-cohort matrix: assign every key to the cohort of its
    FIRST event (truncated to ``bucket``), then count distinct active
    keys per (cohort, bucket-offset) — the classic product-analytics
    retention triangle, here over the CDC event stream.

    Shape: one aggregate for first-event cohorts (key-sized), joined
    back to the events (AQE broadcasts the cohort side when it fits —
    it is |keys| rows, not |events|), then one distinct-count aggregate
    on (cohort, offset). No window over the event stream."""
    cohorts = df.groupBy(key_col).agg(
        F.date_trunc(bucket, F.min(ts_col)).alias("_cohort")
    )
    ev = df.select(
        F.col(key_col), F.date_trunc(bucket, F.col(ts_col)).alias("_b")
    )
    days = {"week": 7, "day": 1}[bucket]
    joined = ev.join(cohorts, key_col).withColumn(
        "offset",
        (
            F.datediff(F.col("_b").cast("date"), F.col("_cohort").cast("date"))
            / days
        ).cast("int"),
    )
    return (
        joined.groupBy(F.col("_cohort").alias("cohort"), "offset")
        .agg(F.count_distinct(F.col(key_col)).alias("n_active"))
    )


def ewma(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exponentially-weighted moving average per key: the recurrence
    y_1 = x_1, y_t = (1-alpha)*y_{t-1} + alpha*x_t, applied in event
    order. Inherently sequential per key, so it runs as an
    applyInPandas grouped-map (X2): each key's series lands in one
    Arrow batch, the recurrence is an explicit loop with the exact same
    literal operations the SQL oracle uses (NOT pandas.ewm, whose
    internal weighted-average formulation differs in the last ulp), and
    keys are processed in parallel across executors. State is O(1) per
    key — this is the batch twin of a transformWithState streaming
    aggregator. Scale contract: per-key series must fit one task
    (events of one user do); the shuffle is one exchange on the key.
    """
    order = [ts_col, *order_cols]
    schema_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
    )
    out_schema = f"{schema_fields}, ewma double"

    def _fold(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype="float64")
        y = x.copy()
        keep = 1.0 - alpha
        for i in range(1, len(y)):
            y[i] = keep * y[i - 1] + alpha * x[i]
        pdf = pdf.copy()
        pdf["ewma"] = y
        return pdf

    # Pin the exchange width: AQE coalesces the grouped-map shuffle by
    # BYTE size, and a few-MB input would hand all keys to 2 tasks —
    # Python stages are CPU-bound, not byte-bound. An explicit
    # numPartitions repartition is exempt from AQE coalescing and is
    # reused by the groupBy (same hash clustering), so this adds no
    # second exchange.
    parts = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(parts, key).groupBy(key).applyInPandas(
        _fold, schema=out_schema
    )


def sliding_distinct(
    df: DataFrame,
    ts_us_col: str,
    id_col: str,
    value_col: str,
    window_us: int,
) -> DataFrame:
    """Sharded sliding-window DISTINCT count: for every row, the number
    of distinct ``value_col`` in the half-open interval
    (t − window, t] — the scalable twin of the single global RANGE
    window (which is one sort task however big the input).

    Shape: bucket the time axis at the window width; every row is
    REPLICATED to its own bucket and the next (any anchor's trailing
    window spans at most two buckets), so each bucket holds everything
    its anchors can see. One shuffle on bucket id, then an Arrow
    grouped-map runs the classic two-pointer + occurrence-map sweep —
    O(bucket rows), not O(rows × window) — and emits only the bucket's
    OWN anchors. 2× replication buys full parallelism and locality.
    Timestamp ties are handled per the (t − w, t] contract: the sweep
    ingests the WHOLE tie group sharing an anchor's timestamp before
    emitting any of the group's anchors, so same-ts peers count."""
    from cdc_init_spark.functions.parallelism import widen_by

    w = int(window_us)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(ts_us_col).alias("_ts"),
        F.col(value_col).alias("_v"),
    )
    own = base.withColumn("_b", (F.col("_ts") / w).cast("bigint")).withColumn(
        "_anchor", F.lit(True)
    )
    nxt = base.withColumn(
        "_b", (F.col("_ts") / w).cast("bigint") + 1
    ).withColumn("_anchor", F.lit(False))
    both = own.unionByName(nxt)

    schema = "_id long, uniq bigint"

    def sweep(pdf):
        pdf = pdf.sort_values(["_ts", "_id"], kind="mergesort").reset_index(
            drop=True
        )
        ts = pdf["_ts"].to_numpy()
        vals = pdf["_v"].to_numpy()
        anchors = pdf["_anchor"].to_numpy()
        ids = pdf["_id"].to_numpy()
        from collections import defaultdict

        counts: dict = defaultdict(int)
        distinct = 0
        lo = 0
        out_ids, out_n = [], []
        n = len(ts)
        hi = 0
        while hi < n:
            # Ingest the ENTIRE group of rows sharing this timestamp
            # before emitting any anchor in it: the (t − w, t] window
            # includes same-ts peers regardless of id order, so an
            # anchor's count must not depend on the (ts, id) tiebreak.
            t = ts[hi]
            j = hi
            while j < n and ts[j] == t:
                v = vals[j]
                if counts[v] == 0:
                    distinct += 1
                counts[v] += 1
                j += 1
            while ts[lo] <= t - w:
                u = vals[lo]
                counts[u] -= 1
                if counts[u] == 0:
                    distinct -= 1
                lo += 1
            for k in range(hi, j):
                if anchors[k]:
                    out_ids.append(ids[k])
                    out_n.append(distinct)
            hi = j
        return pd.DataFrame({"_id": out_ids, "uniq": out_n})

    return (
        widen_by(both, "_b")
        .groupBy("_b")
        .applyInPandas(sweep, schema=schema)
        .withColumnRenamed("_id", id_col)
    )
