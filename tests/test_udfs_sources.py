"""Tests for the UDF surface (B-X) and file sources (S2)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cdc_init_spark.functions import udfs
from cdc_init_spark.sources import files
from cdc_init_spark.tables import load_table


def test_scalar_pandas_udf(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    scored = o.select("o_orderkey", udfs.winsorized_score("o_totalprice").alias("s"))
    rows = scored.collect()
    assert all(0.0 <= r["s"] <= 1.0 for r in rows)


def test_grouped_map_zscore(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    z = udfs.zscore_by_group(o, "o_custkey", "o_totalprice")
    # per-group mean of zscores ≈ 0
    chk = (
        z.groupBy("o_custkey")
        .agg(F.avg("zscore").alias("m"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .collect()
    )
    assert chk and all(abs(r["m"]) < 1e-9 for r in chk)


def test_grouped_agg_geometric_mean(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 10.0), ("a", 100.0), ("b", 4.0)], ["g", "x"]
    )
    got = {
        r["g"]: r["gm"]
        for r in df.groupBy("g").agg(udfs.geometric_mean("x").alias("gm")).collect()
    }
    assert math.isclose(got["a"], 10.0, rel_tol=1e-9)
    assert math.isclose(got["b"], 4.0, rel_tol=1e-9)


def test_ngrams_udtf(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    rows = udfs.ngrams_table(df, n=2).orderBy("pos").collect()
    assert [r["ngram"] for r in rows] == ["a b", "b c", "c d"]
    assert [r["pos"] for r in rows] == [0, 1, 2]


def test_csv_json_roundtrip(spark, tmp_path, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    csv_path = str(tmp_path / "nation_csv")
    json_path = str(tmp_path / "nation_json")
    nation.write.option("header", True).csv(csv_path)
    nation.write.json(json_path)
    schema = "n_nationkey int, n_name string, n_regionkey int"
    got_csv = files.read_csv(spark, csv_path, schema)
    got_json = files.read_json(spark, json_path, schema)
    assert got_csv.count() == 25
    assert sorted(r["n_name"] for r in got_json.collect()) == sorted(
        r["n_name"] for r in nation.collect()
    )
    # schema is explicit — no inference pass, types exact
    assert dict(got_csv.dtypes)["n_nationkey"] == "int"


def test_orc_text_roundtrip(spark, tmp_path, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    orc_path = str(tmp_path / "nation_orc")
    txt_path = str(tmp_path / "names_txt")
    nation.write.orc(orc_path)
    nation.select("n_name").write.text(txt_path)
    got_orc = files.read_orc(spark, orc_path)
    assert got_orc.count() == 25
    assert dict(got_orc.dtypes)["n_nationkey"] == dict(nation.dtypes)["n_nationkey"]
    got_txt = files.read_text(spark, txt_path)
    assert sorted(r["value"] for r in got_txt.collect()) == sorted(
        r["n_name"] for r in nation.collect()
    )
    assert all(r["source_file"] for r in got_txt.select("source_file").collect())


def test_csv_failfast_on_corrupt(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2\nnot_an_int,3\n")
    df = files.read_csv(spark, str(p), "a int, b int")
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        df.collect()


def test_span_chunks_udtf_lateral_and_agrees_with_codegen_form(spark, sf_dir):
    """X4 real Python UDTF: LATERAL table expansion works from SQL, and
    its chunk column agrees with the codegen explode form
    (operators/dedup.chunk_rows) on normalized text."""
    from cdc_init_spark.functions.udfs import span_chunks_udtf
    from cdc_init_spark.operators.dedup import chunk_rows, normalize_text
    from pyspark.sql import functions as F

    spark.udtf.register("span_chunks", span_chunks_udtf())
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", normalize_text(F.col("text")).alias("text"))
        .limit(50)
    )
    d.createOrReplaceTempView("_udtf_docs")
    got = {
        (r.doc_id, r.chunk_idx): r.chunk
        for r in spark.sql(
            "SELECT d.doc_id, c.chunk_idx, c.chunk "
            "FROM _udtf_docs d, LATERAL span_chunks(d.text, 8) c"
        ).collect()
    }
    want = {
        (r.doc_id, r.chunk_idx): r.chunk
        for r in chunk_rows(d, m=8).collect()
    }
    assert got == want
    # offsets index into the original string
    offs = spark.sql(
        "SELECT d.text, c.start_char, c.chunk "
        "FROM _udtf_docs d, LATERAL span_chunks(d.text, 8) c"
    ).collect()
    for r in offs:
        assert r.text[r.start_char : r.start_char + len(r.chunk)] == r.chunk
