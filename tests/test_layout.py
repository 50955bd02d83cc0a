"""Storage layout: partition pruning and shuffle-free bucketed joins must
actually manifest in the physical plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from cdc_init_spark.sources.layout import (
    read_partitioned,
    write_bucketed_table,
    write_partitioned,
)
from cdc_init_spark.tables import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_by_status")
    o = load_table(spark, sf_dir, "orders")
    write_partitioned(o, path, ["o_orderstatus"], sort_within_by=["o_orderdate"])
    back = read_partitioned(spark, path)
    pruned = back.filter(F.col("o_orderstatus") == "F")
    p = _plan(pruned)
    assert "PartitionFilters" in p and "o_orderstatus" in p.split("PartitionFilters")[1][:200]
    # correctness: pruned read equals filtered full read
    assert pruned.count() == o.filter(F.col("o_orderstatus") == "F").count()


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    # (warehouse dir is a static conf — tables land in ./spark-warehouse,
    # which is gitignored; dropped in finally)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        c = load_table(spark, sf_dir, "customer")
        o = load_table(spark, sf_dir, "orders").withColumnRenamed(
            "o_custkey", "c_custkey"
        )
        write_bucketed_table(c, "b_cust", ["c_custkey"], 4, sort_by=["c_custkey"])
        write_bucketed_table(o, "b_ord", ["c_custkey"], 4, sort_by=["c_custkey"])
        j = spark.table("b_cust").join(spark.table("b_ord"), "c_custkey")
        p = _plan(j)
        # co-located bucketed join: no Exchange feeding the join
        join_section = p.split("SortMergeJoin")[0] if "SortMergeJoin" in p else p
        assert "Exchange hashpartitioning(c_custkey" not in p
        n = j.count()
        plain = c.join(o, "c_custkey").count()
        assert n == plain
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_cust")
        spark.sql("DROP TABLE IF EXISTS b_ord")


def test_zorder_clustering_shrinks_file_footprints(spark, sf_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from cdc_init_spark.sources.layout import write_zordered

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zpath = str(tmp_path / "events_z")
    spath = str(tmp_path / "events_sorted")
    write_zordered(ev, zpath, ["user_id", "value"], n_files=8)
    # strawman: single-column sort clusters user_id only
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def footprints(path, col):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans.append(hi - lo)
        return spans

    # correctness: same rows back
    assert spark.read.parquet(zpath).count() == ev.count()

    full_user = ev.agg(F.max("user_id") - F.min("user_id")).first()[0]
    full_value = ev.agg(F.max("value") - F.min("value")).first()[0]
    z_user = footprints(zpath, "user_id")
    z_value = footprints(zpath, "value")
    s_value = footprints(spath, "value")
    # each z-file covers a fraction of BOTH dimensions' ranges...
    assert sum(z_user) / len(z_user) < 0.8 * full_user
    assert sum(z_value) / len(z_value) < 0.8 * full_value
    # ...whereas the single-column sort leaves the second dimension
    # unclustered (every file spans ~the full value range)
    assert sum(z_value) / len(z_value) < 0.8 * (sum(s_value) / len(s_value))


def test_zorder_approx_matches_clustering_property(spark, sf_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from cdc_init_spark.sources.layout import write_zordered

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "events_za")
    # sketch-ranked path: no global-sort window, bits sized so cells ≫ files
    write_zordered(ev, path, ["user_id", "value"], n_files=8, bits=8, approx=True)
    assert spark.read.parquet(path).count() == ev.count()

    def avg_span(col):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    full_user = ev.agg(F.max("user_id") - F.min("user_id")).first()[0]
    full_value = ev.agg(F.max("value") - F.min("value")).first()[0]
    assert avg_span("user_id") < 0.8 * full_user
    assert avg_span("value") < 0.8 * full_value


def test_compact_small_files(spark, tmp_path):
    """200 tiny files compact to the computed byte-target count; row set
    survives unchanged; optional within-file sort applies."""
    import glob

    from cdc_init_spark.sources.layout import compact_small_files

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    df = spark.range(20_000).withColumn("v", F.col("id") % 97)
    df.repartition(200).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 200

    n = compact_small_files(spark, src, dst, target_file_mb=128, sort_within_by=["id"])
    got_files = glob.glob(f"{dst}/*.parquet")
    assert len(got_files) == n  # tiny input → single target file
    assert n < 200
    back = spark.read.parquet(dst)
    assert back.count() == 20_000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_compact_small_files_refuses_unsized_path(spark, tmp_path):
    """Regression (ADVICE r2): a path with no sizable data bytes must
    raise, not silently compute total=0 and rewrite everything into one
    file regardless of target_file_mb."""
    import pytest

    from cdc_init_spark.sources.layout import compact_small_files

    empty = tmp_path / "nothing_here"
    empty.mkdir()
    with pytest.raises(ValueError, match="no data bytes"):
        compact_small_files(spark, str(empty), str(tmp_path / "out"))
