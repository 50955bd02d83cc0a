"""Snapshot / canonical-JSON tests: the reference's golden bytes and
nesting law, plus the Spark column-expression path end-to-end.

Reference: test/cdc_init/components/seed_store_test.clj.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_init_spark.functions.canonical_json import (
    dml_to_seed_message,
    nest_seed_columns,
    seed_row_to_dml,
)
from cdc_init_spark.streaming.snapshot import SparkSeedStore, seed_frame

# The reference's worked example (seed_store_test.clj:58-79).
EXAMPLE_ROW = {
    "cdc.type": "insert",
    "cdc.table": "ifsapp.shop_ord_tab",
    "cdc.info.user_id": "ifsapp",
    "cdc.info.timestamp": "2015-11-13T12:30:56.467000+00:00",
    "cdc.id.order_no": "123456",
    "cdc.id.release_no": "*",
    "cdc.id.sequence_no": "*",
    "order_no": "123456",
    "release_no": "*",
    "sequence_no": "*",
}

EXAMPLE_DML = {
    "id": {"order_no": "123456", "release_no": "*", "sequence_no": "*"},
    "type": "insert",
    "table": "ifsapp.shop_ord_tab",
    "data": {"order_no": "123456", "release_no": "*", "sequence_no": "*"},
    "info": {
        "user_id": "ifsapp",
        "timestamp": "2015-11-13T12:30:56.467000+00:00",
    },
}


def test_seed_row_to_dml_example():
    """seed_store_test.clj:58-79 worked example."""
    assert seed_row_to_dml(EXAMPLE_ROW) == EXAMPLE_DML


@settings(max_examples=50, deadline=None)
@given(
    prefixed=st.dictionaries(
        st.from_regex(r"cdc\.id\.[a-z][a-z0-9_]{0,8}", fullmatch=True),
        st.one_of(st.none(), st.booleans(), st.text(max_size=6), st.integers()),
        min_size=1,
        max_size=4,
    ),
    plain=st.dictionaries(
        st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True),
        st.one_of(st.none(), st.booleans(), st.text(max_size=6), st.integers()),
        min_size=1,
        max_size=4,
    ),
)
def test_seed_row_nesting_law(prefixed, plain):
    """seed_store_test.clj:47-56 property: cdc.* columns nest by path,
    everything else lands under data."""
    row = {**prefixed, **plain}
    dml = seed_row_to_dml(row)
    for k, v in plain.items():
        assert dml["data"][k] == v
    for k, v in prefixed.items():
        path = k.split(".")[1:]
        node = dml
        for p in path[:-1]:
            node = node[p]
        assert node[path[-1]] == v


def test_golden_key_bytes():
    """seed_store_test.clj:84-104 — the key is byte-pinned: JSON array of
    id entries sorted by column name, flattened."""
    dml = {
        "id": {"order_no": "123456", "release_no": "7", "sequence_no": "*"},
        "type": "insert",
        "table": "ifsapp.shop_ord_tab",
        "data": {
            "order_no": "123456",
            "release_no": "*",
            "sequence_no": "*",
            "rowstate": "Closed",
        },
        "info": {
            "user_id": "ifsapp",
            "timestamp": "2015-11-13T12:30:56.467000+00:00",
        },
    }
    msg = dml_to_seed_message(dml)
    assert (
        msg["key"]
        == '["order_no","123456","release_no","7","sequence_no","*"]'
    )
    assert json.loads(msg["value"]) == dml


def test_nest_rejects_conflicts():
    try:
        nest_seed_columns(["cdc.id", "cdc.id.x"])
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected ValueError on conflicting nesting")


# -- Spark column-expression path ----------------------------------------

def test_spark_seed_frame_matches_driver_encoding(spark):
    """The JVM to_json path produces the same key bytes and the same
    value structure as the driver-side reference encoding."""
    df = spark.createDataFrame(
        [("123456", "*", "closed"), ("777", "9", "open")],
        ["order_no", "release_no", "rowstate"],
    )
    from pyspark.sql import functions as F

    msgs = seed_frame(
        df,
        "ifsapp.shop_ord_tab",
        pk_cols=["order_no", "release_no"],
        user_id="ifsapp",
        timestamp=F.lit("2015-11-13T12:30:56.467000+00:00"),
    ).orderBy("key")
    rows = msgs.collect()
    assert rows[0]["key"] == '["order_no","123456","release_no","*"]'
    assert rows[1]["key"] == '["order_no","777","release_no","9"]'
    v = json.loads(rows[0]["value"])
    assert v == {
        "data": {"order_no": "123456", "release_no": "*", "rowstate": "closed"},
        "id": {"order_no": "123456", "release_no": "*"},
        "info": {
            "timestamp": "2015-11-13T12:30:56.467000+00:00",
            "user_id": "ifsapp",
        },
        "table": "ifsapp.shop_ord_tab",
        "type": "insert",
    }
    # value bytes are canonical: alphabetical keys at every level, compact
    assert rows[0]["value"] == json.dumps(v, separators=(",", ":"), sort_keys=True)


def test_unicode_key_parity(spark):
    """Non-ASCII id values: the JVM fast path and the driver-side encoder
    must agree byte-for-byte (raw UTF-8, no \\uXXXX escaping — matching
    the reference's Cheshire output)."""
    df = spark.createDataFrame([("héllo–wörld", "x")], ["pk", "payload"])
    row = seed_frame(df, "s.t", pk_cols=["pk"]).first()
    expected = dml_to_seed_message(
        {"id": {"pk": "héllo–wörld"}, "type": "insert", "table": "s.t",
         "data": {}, "info": {}}
    )["key"]
    assert row["key"] == expected == '["pk","héllo–wörld"]'


def test_spark_seed_frame_typed_ids_exact_path(spark):
    """Non-string id columns take the pandas-UDF path and keep JSON types."""
    df = spark.createDataFrame([(7, "a"), (9, "b")], ["pk", "payload"])
    msgs = seed_frame(df, "s.t", pk_cols=["pk"]).orderBy("key")
    rows = msgs.collect()
    assert rows[0]["key"] == '["pk",7]'
    assert json.loads(rows[0]["value"])["id"] == {"pk": 7}


def test_spark_seed_store_count_and_iter(spark, sf_dir):
    """A16/A18 over a real fixture table."""
    from cdc_init_spark.tables import load_table

    store = SparkSeedStore(
        resolve=lambda t: load_table(spark, sf_dir, "region"),
        pk_resolver=lambda t: ["r_regionkey"],
    )
    assert store.record_count("any.region") == 5
    seeds = list(store.seeds("any.region"))
    assert len(seeds) == 5
    assert all(s["key"] and s["value"] for s in seeds)
    first = json.loads(seeds[0]["value"])
    assert first["type"] == "insert"
    assert "r_name" in first["data"]
