"""Laws for the DataSketches operators (operators/datasketches.py):
merge equality for HLL, rank tolerance for KLL, exact-mode equality for
Theta. The q133 oracle hash-match lives in test_corpus.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_init_spark.operators import datasketches as ds
from cdc_init_spark.tables import load_table


def test_hll_group_estimates_close_and_merge_exactly(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    per_group = ds.hll_group_uniques(d, "source", "text").cache()
    exact = {
        r.source: r.n
        for r in d.groupBy("source")
        .agg(F.count_distinct("text").alias("n"))
        .collect()
    }
    for r in per_group.collect():
        assert abs(r.estimate - exact[r.source]) <= max(2, 0.05 * exact[r.source])
    # merge law: union of per-group sketches tracks the direct
    # whole-column sketch within the sketch's own error bound (the
    # union gadget may transition modes differently → not bit-equal)
    merged = ds.hll_merged_estimate(per_group).collect()[0].estimate
    direct = (
        d.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("text", F.lit(12))
            ).alias("e")
        )
        .collect()[0]
        .e
    )
    assert abs(merged - direct) <= max(3, 0.02 * direct)
    global_exact = d.select("text").distinct().count()
    assert abs(merged - global_exact) <= max(2, 0.05 * global_exact)
    per_group.unpersist()


def test_hll_partition_invariant(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    e1 = {
        r.source: r.estimate
        for r in ds.hll_group_uniques(d, "source", "text").collect()
    }
    e2 = {
        r.source: r.estimate
        for r in ds.hll_group_uniques(d.repartition(13), "source", "text").collect()
    }
    assert e1 == e2


def test_kll_quantiles_within_rank_tolerance(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    got = {
        r.o_orderstatus: (r.q0_5, r.q0_9)
        for r in ds.kll_group_quantiles(
            o, "o_orderstatus", "o_totalprice", [0.5, 0.9]
        ).collect()
    }
    # a KLL quantile answer is correct if its TRUE rank is within ~2% of
    # the requested rank (k=200 → normalized rank error ≈ 1.65%)
    for status, (q50, q90) in got.items():
        vals = [
            r.o_totalprice
            for r in o.filter(F.col("o_orderstatus") == status).collect()
        ]
        vals.sort()
        n = len(vals)
        for q, est in ((0.5, q50), (0.9, q90)):
            rank = sum(1 for v in vals if v <= est) / n
            assert abs(rank - q) < 0.05, (status, q, est, rank)


def test_kll_merged_matches_global(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    sk = ds.kll_group_quantiles(o, "o_orderstatus", "o_totalprice", [0.5])
    merged = ds.kll_merged_quantiles(sk, [0.5]).collect()[0].q0_5
    vals = sorted(r.o_totalprice for r in o.collect())
    rank = sum(1 for v in vals if v <= merged) / len(vals)
    assert abs(rank - 0.5) < 0.05


def test_theta_exact_mode_matches_set_algebra(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    cohorts = e.select(
        F.when(F.col("event_type") == "signup", "a")
        .when((F.col("event_type") == "purchase") & (F.col("value") > 120), "b")
        .alias("cohort"),
        "user_id",
    ).filter(F.col("cohort").isNotNull())
    sk = ds.theta_group_sketches(cohorts, "cohort", "user_id")
    row = ds.theta_overlap_estimate(sk, "cohort", "a", "b").collect()[0]
    a = {
        r.user_id
        for r in e.filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .collect()
    }
    b = {
        r.user_id
        for r in e.filter(
            (F.col("event_type") == "purchase") & (F.col("value") > 120)
        )
        .select("user_id")
        .distinct()
        .collect()
    }
    assert (row.n_a, row.n_b) == (len(a), len(b))
    assert row.n_union == len(a | b)
    assert row.n_intersect == len(a & b)
    assert row.n_a_only == len(a - b)


def test_bitmap_distinct_exact_and_partition_invariant(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    got = {
        r.event_type: r.n_distinct
        for r in ds.bitmap_distinct_by_group(e, "event_type", "user_id").collect()
    }
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact
    got2 = {
        r.event_type: r.n_distinct
        for r in ds.bitmap_distinct_by_group(
            e.repartition(11), "event_type", "user_id"
        ).collect()
    }
    assert got2 == exact
