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
