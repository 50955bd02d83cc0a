"""Differential test harness: Spark result vs DuckDB oracle.

Mimics the driver's t2 compare: row count + schema-width + order-insensitive
value comparison with columns aligned by (sorted) name. Exact equality on
every cell (floats included — the corpus rounds at the source per SURVEY
§2.3.0, and both engines do the same double arithmetic), with NaN==NaN and
None==NaN normalization at the pandas boundary.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from cdc_init_spark.tables import TABLE_NAMES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with every fixture table registered as a view, the way
    the driver's oracle runner does."""
    con = duckdb.connect()
    # spill instead of OOM: heavy oracles (recursive-CTE closures, big
    # window sorts) at sf1.0 run CONCURRENTLY with a 32-thread Spark JVM
    # in the scale tests — an unbounded DuckDB allocator lost that race
    # once (r5: one 'Failed to allocate block' abort). A temp directory
    # turns the failure mode into disk spill; the cap leaves headroom
    # for the JVM. The cap is min(24GB, 50% of RAM): a hardcoded 24GB
    # would RAISE the limit above DuckDB's default 80%-of-RAM on small
    # hosts. Spill dirs land under one shared tmp root per process and
    # are removed at interpreter exit (DuckDB cleans its spill files on
    # connection close; the empty dirs were accumulating before r6).
    import atexit
    import os
    import shutil
    import tempfile

    try:
        ram = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError):  # non-POSIX fallback
        ram = 64 << 30
    limit_gb = max(1, min(24, int(ram * 0.5 / (1 << 30))))
    con.execute(f"SET memory_limit='{limit_gb}GB'")
    spill = tempfile.mkdtemp(prefix="duckdb_spill_")
    atexit.register(shutil.rmtree, spill, ignore_errors=True)
    con.execute(f"SET temp_directory='{spill}'")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _canon(v):
    """Canonicalize one cell: numpy scalar → python, NaN/NaT/None → None."""
    if v is None:
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):  # arrays/lists
        pass
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon(x) for x in v)
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows.
    Object dtype throughout so None survives (float64 would re-NaN it)."""
    df = df[sorted(df.columns)]
    rows = [
        tuple(_canon(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    rows.sort(
        key=lambda r: tuple((x is not None, x.__class__.__name__, x) for x in r)
    )
    return pd.DataFrame(rows, columns=df.columns, dtype=object)


@dataclass
class DiffResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for m in self.mismatches[:5]:
            msg += f"\n    {m}"
        return msg


_TYPE_CLASS = {
    "int8": "int", "int16": "int", "int32": "int", "int64": "int",
    "uint8": "int", "uint16": "int", "uint32": "int", "uint64": "int",
    "float32": "float", "float64": "float",
    "bool": "bool", "boolean": "bool",
    "object": "object", "string": "object",
}


def _type_classes(df: pd.DataFrame) -> dict[str, str]:
    out = {}
    for c in df.columns:
        d = str(df[c].dtype)
        out[c] = _TYPE_CLASS.get(d, "object" if "datetime" not in d else "ts")
    return out


def compare_frames(name: str, spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> DiffResult:
    res = DiffResult(name, True, len(spark_pd), len(duck_pd))
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        res.ok = False
        res.mismatches.append(
            f"columns differ: spark={sorted(spark_pd.columns)} oracle={sorted(duck_pd.columns)}"
        )
        return res
    # coarse schema-class check (int/float/bool/object families) — the
    # driver compares schemas too, so a bigint-vs-double drift must fail
    # here first
    sc, dc = _type_classes(spark_pd), _type_classes(duck_pd)
    for c in spark_pd.columns:
        if len(spark_pd) and len(duck_pd) and sc[c] != dc[c]:
            res.ok = False
            res.mismatches.append(
                f"type class differs for {c!r}: spark={sc[c]} oracle={dc[c]}"
            )
    if not res.ok:
        return res
    if len(spark_pd) != len(duck_pd):
        res.ok = False
        res.mismatches.append("row counts differ")
        return res
    s = normalize(spark_pd)
    d = normalize(duck_pd)
    for i in range(len(s)):
        srow = tuple(s.iloc[i])
        drow = tuple(d.iloc[i])
        if srow != drow:
            res.ok = False
            res.mismatches.append(f"row {i}: spark={srow!r} oracle={drow!r}")
            if len(res.mismatches) >= 10:
                break
    return res


def run_differential(
    spark: SparkSession,
    sf_dir: str,
    only: list[str] | None = None,
) -> list[DiffResult]:
    """Run every registered corpus query with an oracle; compare."""
    from cdc_init_spark.plans import ORACLE, QUERIES

    con = duckdb_connection(sf_dir)
    results = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        if name not in ORACLE:
            continue
        try:
            spark_pd = fn(spark, sf_dir).toPandas()
            duck_pd = con.execute(ORACLE[name]).df()
            results.append(compare_frames(name, spark_pd, duck_pd))
        except Exception as e:  # surface, don't crash the sweep
            results.append(
                DiffResult(name, False, -1, -1, [f"{type(e).__name__}: {e}"])
            )
    return results
