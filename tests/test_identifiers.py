"""Identifier algebra tests (reference: sql/util.clj:8-57)."""

from __future__ import annotations

import pytest

from cdc_init_spark.functions.identifiers import (
    in_own_schema,
    mq_table,
    split_table_ref,
    strip_schema,
)


def test_split_table_ref():
    assert split_table_ref("ifsapp.shop_ord_tab") == {
        "schema": "ifsapp",
        "table": "shop_ord_tab",
    }
    assert split_table_ref('"My Schema"."My Table"') == {
        "schema": '"My Schema"',
        "table": '"My Table"',
    }


def test_split_table_ref_requires_schema():
    with pytest.raises(ValueError):
        split_table_ref("unqualified")
    with pytest.raises(ValueError):
        split_table_ref("")


def test_strip_schema():
    assert strip_schema("ifsapp.shop_ord_tab") == "shop_ord_tab"
    assert strip_schema("no_schema") == "no_schema"
    assert strip_schema('"S"."T"') == '"T"'


def test_in_own_schema():
    assert in_own_schema("ifsapp.t", "IFSAPP")
    assert in_own_schema('"IFSAPP".t', "ifsapp")
    assert not in_own_schema("other.t", "ifsapp")
    assert in_own_schema("unqualified", "anyone")


def test_mq_table():
    """sql/util.clj:36-46 — mq_ prefix, inside quotes when quoted."""
    assert mq_table("qt") == "mq_qt"
    assert mq_table("s.qt") == "s.mq_qt"
    assert mq_table('"QT"') == '"mq_QT"'
    assert mq_table('s."QT"') == 's."mq_QT"'
    assert mq_table("!!!") is None
