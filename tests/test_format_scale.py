"""Measured scale gates for the r8/r9 format surfaces (VERDICT r8
"Next round" item 7): the O(touched)/O(change-set) claims of predicate
DML and the change-feed read are MEASURED here — deterministic on-disk
byte and file counters at 1× vs 10× table size, not wall time — and
recorded in tools/scale_ratios.json (the table BASELINE.md cites).

The shape under test: grow the TABLE 10× while holding the CHANGE SET
fixed. An O(touched) operation's IO must stay ~flat; anything that
degrades toward O(table) fails the ratio gate. This is the same
reintroduced-quadratic tripwire the LSH pair-count arms give the dedup
operators.
"""

from __future__ import annotations

import json
import os
from datetime import datetime

from pyspark.sql import functions as F

from cdc_init_spark.sources.delta_log import DeltaLogFormat

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ts(minute):
    return datetime(2026, 1, 1, 12, minute)


def _record(key: str, payload: dict) -> None:
    out = os.path.join(_REPO, "tools", "scale_ratios.json")
    merged = {}
    if os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
    merged[key] = payload
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)


def _walk_sizes(root):
    out = {}
    for dirpath, _d, names in os.walk(root):
        for n in names:
            full = os.path.join(dirpath, n)
            out[os.path.relpath(full, root)] = os.path.getsize(full)
    return out


def _range_table(spark, n_rows: int, n_files: int):
    pay = "x" * 64
    return (
        spark.range(n_rows)
        .select(
            F.col("id"),
            F.lit(pay).alias("payload"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        .repartitionByRange(n_files, "id")
    )


def test_where_dml_io_is_o_touched(spark, tmp_path):
    """Predicate DML at 10× the table: a where-only DELETE (the GDPR
    shape — no declared ranges, pruning derived from the raw where
    string) must read candidate files and commit rewrite bytes
    proportional to the TOUCHED files, not the table. Gates: candidate
    count flat across the 10× (×3 slack for range-sampling jitter),
    commit bytes ≤ 3× the small arm's, and candidates ≪ active on the
    big arm."""

    def run(tag: str, n_rows: int, n_files: int):
        fmt = DeltaLogFormat(str(tmp_path / tag))
        fmt.init({"t": _range_table(spark, n_rows, n_files)})
        before = _walk_sizes(fmt.root)
        # one key, mid-table; where-only (no declared predicate ranges)
        v = fmt.delete(spark, "t", {}, where=f"id = {n_rows // 2}")
        assert v > 0
        after = _walk_sizes(fmt.root)
        st = dict(fmt.last_rewrite_stats)
        st["commit_bytes"] = sum(
            s for p, s in after.items() if p not in before
        )
        return st

    small = run("sf1x", 20_000, 8)
    big = run("sf10x", 200_000, 80)
    # pruning derived from the where string, both arms
    assert small["derived_prune_cols"] == ["id"]
    assert big["derived_prune_cols"] == ["id"]
    # O(touched): the big arm reads a few files out of 80, never ~all
    assert big["candidates"] <= 3 * max(small["candidates"], 1)
    assert big["candidates"] <= big["active"] // 8
    byte_ratio = round(big["commit_bytes"] / max(small["commit_bytes"], 1), 2)
    assert byte_ratio <= 3.0, (
        f"where-only DELETE commit bytes grew {byte_ratio}x across a 10x "
        f"table scale-up ({small['commit_bytes']}B -> {big['commit_bytes']}B)"
        " — the rewrite is no longer O(touched files)"
    )
    _record(
        "dml_where_pruning",
        {
            "layout": "8 files/20k rows vs 80 files/200k rows, "
            "1-key where-only DELETE",
            "sf1x": {k: small[k] for k in
                     ("active", "candidates", "touched", "commit_bytes")},
            "sf10x": {k: big[k] for k in
                      ("active", "candidates", "touched", "commit_bytes")},
            "commit_byte_ratio": byte_ratio,
            "max_ratio": 3.0,
        },
    )


def test_change_feed_read_is_o_change_set(spark, tmp_path):
    """Change-feed read at 10× the table: a merge version's planned
    batch bytes (the action log's cdc file sizes — exactly what the
    streaming source reads for that version) must track the CHANGE SET,
    not the table. Gates: planned bytes ≤ 3× the small arm's across the
    10×, and ≪ the table's data bytes on the big arm."""
    from cdc_init_spark.sources.delta_cdf import DeltaCdfStreamReader

    def run(tag: str, n_rows: int, n_files: int):
        fmt = DeltaLogFormat(str(tmp_path / tag), enable_cdf=True)
        fmt.init({"t": _range_table(spark, n_rows, n_files)})
        ch = spark.createDataFrame(
            [(k, _ts(1), "update", "y" * 64, 1.5) for k in range(0, 100)],
            "id long, ts timestamp, type string, payload string, v double",
        )
        v = fmt.merge(spark, "t", ch, ["id"], batch_id=0)
        reader = DeltaCdfStreamReader.__new__(DeltaCdfStreamReader)
        reader.root = fmt.root
        reader.table = "t"
        planned = reader._version_bytes(v)
        table_bytes = sum(
            a["size"] for a in fmt._snapshot().adds["t"].values()
        )
        assert planned > 0
        return planned, table_bytes

    small_planned, _small_table = run("sf1x", 20_000, 8)
    big_planned, big_table = run("sf10x", 200_000, 80)
    ratio = round(big_planned / max(small_planned, 1), 2)
    assert ratio <= 3.0, (
        f"change-feed planned bytes grew {ratio}x across a 10x table "
        "scale-up — the batch plan is no longer O(change set)"
    )
    assert big_planned <= big_table // 8
    _record(
        "cdf_read_bytes",
        {
            "layout": "100-key merge on 20k vs 200k rows",
            "sf1x_planned_bytes": small_planned,
            "sf10x_planned_bytes": big_planned,
            "sf10x_table_bytes": big_table,
            "planned_byte_ratio": ratio,
            "max_ratio": 3.0,
        },
    )
