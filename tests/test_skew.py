"""Skew utilities: salted paths must produce identical results to the
plain ones (the whole point — same answer, different shuffle shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_init_spark.operators.skew import salted_agg, salted_join, with_salt
from cdc_init_spark.tables import load_table


def test_with_salt_deterministic_and_bounded(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    s1 = with_salt(o, 16).select("_salt")
    assert s1.agg(F.min("_salt"), F.max("_salt")).first() == (0, 15)
    # deterministic: same rows → same salts
    a = with_salt(o, 16).groupBy("_salt").count().collect()
    b = with_salt(o, 16).groupBy("_salt").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_agg_equals_plain(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    plain = {
        r["o_orderstatus"]: (r["s"], r["c"])
        for r in o.groupBy("o_orderstatus")
        .agg(F.sum("o_totalprice").alias("s"), F.count("o_orderkey").alias("c"))
        .collect()
    }
    salted = {
        r["o_orderstatus"]: (r["sum_o_totalprice"], r["count_o_orderkey"])
        for r in salted_agg(
            o, ["o_orderstatus"], {"o_totalprice": "sum", "o_orderkey": "count"}
        ).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert abs(plain[k][0] - salted[k][0]) < 1e-6
        assert plain[k][1] == salted[k][1]


def test_salted_join_equals_plain(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    dim = c.withColumnRenamed("c_custkey", "o_custkey")
    plain = o.join(dim, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(o, dim, "o_custkey", n_salts=8).select(
        "o_orderkey", "c_name"
    )
    assert plain.count() == salted.count()
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0
