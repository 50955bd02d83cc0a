"""Exchange-width control for Python (Arrow) stages.

AQE coalesces shuffle partitions by BYTE size — correct for JVM
relational stages, wrong for CPU-bound Python stages: a few-MB input
coalesces to 1-2 tasks and the pandas work serializes on one core
(measured 3x on the EWMA grouped-map at sf0.1). Parquet scans have the
same failure mode from the other side: a single-row-group file IS one
task, so a mapInPandas chained on the scan never parallelizes at all.

Two rules this module encodes:
- an explicit ``repartition(n, key)`` is exempt from AQE coalescing and
  its hash clustering is REUSED by a following groupBy on the same key —
  pinning costs no extra exchange;
- a round-robin ``repartition(n)`` before a per-row Arrow map spreads a
  narrow scan across the machine; only valid when the operator is
  per-row/per-batch (mapInPandas with no cross-row state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin repartition to machine parallelism ahead of a
    CPU-dense per-row Arrow stage (decode, matmul scoring, encode)."""
    n = parts or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def widen_by(df: DataFrame, *keys: str, parts: int | None = None) -> DataFrame:
    """Hash-repartition on ``keys`` at pinned width ahead of a grouped
    Arrow stage; the following groupBy on the same keys reuses it."""
    n = parts or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *keys)
