"""Streaming operators T1-T9 (SURVEY §2.2 B-IX): watermarks, windowed
aggregations, streaming dedup, stateful last-state-per-key, stream-static
joins.

Batch/stream symmetry is deliberate: the window expressions here are the
SAME F.window / F.session_window expressions the batch corpus pins against
DuckDB (plans/temporal.py Q55-Q57), so the streaming tests only need to
establish that the streaming execution (watermark + incremental state)
converges to the batch answer.

Scale notes: every operator states its state-store footprint — the thing
that kills 100 TB streams is unbounded state, so each aggregation carries a
watermark that lets Spark evict closed windows/keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def watermarked(stream: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """T1: bound event-time lateness; rows older than max(ts)-delay are
    dropped and state older than that is evictable."""
    return stream.withWatermark(ts_col, delay)


def tumbling_agg(
    stream: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """T2: tumbling event-time window counts/sums. State = one row per
    (open window × key); closed windows evict at the watermark."""
    gcols = [F.window(ts_col, window).alias("w")] + [F.col(k) for k in (keys or [])]
    return (
        watermarked(stream, ts_col, delay)
        .groupBy(*gcols)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *[F.col(k) for k in (keys or [])],
            "n",
            "sum_value",
        )
    )


def sliding_agg(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """T3: sliding windows — each event feeds window/slide overlapping
    states (state multiplier = window/slide)."""
    return (
        watermarked(stream, ts_col, delay)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


def session_agg(
    stream: DataFrame,
    gap: str = "30 minutes",
    key: str = "user_id",
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """T4: session windows with a dynamic gap — state is one open session
    per key, merged on overlap, closed (and emitted) at the watermark."""
    return (
        watermarked(stream, ts_col, delay)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """T5: exactly-once-per-key emission within the watermark horizon.
    State = the key set inside the horizon (bounded by the watermark —
    without it, dropDuplicates state grows forever)."""
    return watermarked(stream, ts_col, delay).dropDuplicates(keys + [ts_col])


def stream_static_join(stream: DataFrame, static_dim: DataFrame, on: str) -> DataFrame:
    """T7: enrich a stream against a static dimension — broadcast-hash per
    micro-batch, no streaming state at all."""
    return stream.join(F.broadcast(static_dim), on=on, how="left")


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    delay: str = "10 minutes",
    within: str = "5 minutes",
) -> DataFrame:
    """T7+: watermarked stream-stream inner join — right rows match left
    rows with the same key whose event time is within ``within`` after the
    left event. BOTH sides carry watermarks and the event-time bound sits
    INSIDE the join condition (not a post-join filter) — that placement is
    what lets Spark derive per-side state watermarks and EVICT the row
    buffers (state per side = rows inside watermark+within horizon;
    as a filter the buffers would grow forever, and outer variants would
    be rejected outright)."""
    return _stream_stream(left, right, on, left_ts, right_ts, delay, within, "inner")


def stream_stream_left_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    delay: str = "10 minutes",
    within: str = "5 minutes",
) -> DataFrame:
    """T7+: watermarked stream-stream LEFT OUTER join — unmatched left
    rows emit with NULL right columns once the watermark passes their
    match horizon (the engine must know no future right row can still
    match; that is why outer stream joins REQUIRE the event-time bound
    in the join condition — Spark rejects them otherwise)."""
    return _stream_stream(
        left, right, on, left_ts, right_ts, delay, within, "leftOuter"
    )


def _stream_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    delay: str,
    within: str,
    how: str,
) -> DataFrame:
    l_wm = left.withWatermark(left_ts, delay)
    r_wm = right.withWatermark(right_ts, delay)
    l = l_wm.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_lts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (on, left_ts)],
    )
    r = r_wm.select(
        F.col(on).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (on, right_ts)],
    )
    cond = (
        (F.col("_k") == F.col("_rk"))
        & (F.col("_rts") >= F.col("_lts"))
        & (F.col("_rts") <= F.col("_lts") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, on=cond, how=how).drop("_rk").withColumnRenamed("_k", on)


def streaming_dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """T5+: ``dropDuplicatesWithinWatermark`` — dedup by KEY ALONE for
    duplicates whose event times differ (retries/replays stamp new
    timestamps, so q-T5's key+ts dedup would pass them). State per key
    is evicted once the watermark passes first-seen + delay; within
    that horizon every re-delivery of the key is suppressed regardless
    of its timestamp."""
    return watermarked(stream, ts_col, delay).dropDuplicatesWithinWatermark(keys)


def last_state_per_key(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    output_schema: StructType,
    state_schema: str = "max_ts timestamp",
) -> DataFrame:
    """T6: the reference's log-compaction semantics as a custom stateful
    operator (A2 streaming form — initializer.clj:37 + compacted topic,
    topic_store.clj:15): for each key, emit only rows newer than anything
    seen before. State per key = a single timestamp (tiny, bounded by key
    cardinality).

    Implemented with applyInPandasWithState (Arrow-batched; the Python
    worker sees whole key-groups per batch)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ts_field = ts_col

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        max_seen = state.get[0] if state.exists else None
        best: pd.Series | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(ts_field)
            cand = pdf.iloc[-1]
            if best is None or cand[ts_field] > best[ts_field]:
                best = cand
        if best is not None and (max_seen is None or best[ts_field] > max_seen):
            state.update((best[ts_field].to_pydatetime(),))
            yield best.to_frame().T
        else:
            yield pd.DataFrame(columns=list(output_schema.fieldNames()))

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_per_key(
    stream: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Continuous per-key running aggregate (count + sum) on the Spark 4
    ``transformWithStateInPandas`` API — the successor to
    ``applyInPandasWithState`` (T6 uses the older API; both are covered).
    Emits one updated ``(key, n, total)`` row per key per micro-batch —
    the streaming form of the reference's running seed counter
    (/root/reference/src/cdc_init/core.clj:167-175), generalized to a sum.

    State per key is one (count, sum) pair in a ValueState — bytes per
    key, bounded by key cardinality; the state store scales out with the
    shuffle partitioning of the key column.

    Environment gate: the transformWithState protocol speaks protobuf
    between the JVM and the Python driver worker; ``google.protobuf``
    is not installed in this container, so the operator raises
    NotImplementedError there (the applyInPandasWithState twin
    ``last_state_per_key`` covers custom state in-container; the
    corresponding pytest skips itself when protobuf is absent)."""
    try:
        from google.protobuf import descriptor as _descriptor  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf, not "
            "installed in this environment"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n bigint, total double"
            )

        def handleInputRows(
            self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
        ) -> Iterator[pd.DataFrame]:
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                if pdf.empty:
                    continue
                vals = pdf[value_col].dropna()
                n += int(len(vals))
                total += float(vals.sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {key_col: [key[0]], "n": [n], "total": [total]}
            )

        def close(self) -> None:
            pass

    out_schema = f"{key_col} bigint, n bigint, total double"
    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def running_totals_per_key_applystate(
    stream: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """``running_totals_per_key``'s protobuf-free twin on the
    ``applyInPandasWithState`` API (Arrow wire protocol, no
    google.protobuf dependency) — byte-identical semantics: one updated
    ``(key, n, total)`` row per key per micro-batch, (count, sum) state
    carried across batches. This is the form testable in containers
    without protobuf (the TWS variant gates itself and is exercised
    where the wheel exists); at cluster scale both store one tiny state
    row per key in the shuffle-partitioned state store."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            if pdf.empty:
                continue
            vals = pdf[value_col].dropna()
            n += int(len(vals))
            total += float(vals.sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} bigint, n bigint, total double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """L1 (exact dedup), streaming form: suppress re-deliveries of the
    same CONTENT — the sha-256 of normalized text, the identical digest
    the batch ``operators.dedup.exact_dedup`` keys on — within the
    watermark horizon, whatever ids or timestamps the duplicates carry.
    State is one digest per distinct content inside the horizon,
    evicted by the watermark; a continuously-ingesting corpus pipeline
    runs this at the door and the batch operator as the periodic
    full-corpus pass (same normalization → the two agree on what is a
    duplicate)."""
    from cdc_init_spark.operators.dedup import content_hash

    tagged = watermarked(stream, ts_col, delay).withColumn(
        "_content_hash", content_hash(F.col(text_col))
    )
    return tagged.dropDuplicatesWithinWatermark(["_content_hash"]).drop(
        "_content_hash"
    )
