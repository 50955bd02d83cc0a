"""Canonical DML-message encoding — the reference's wire format.

A flat seed row becomes a nested DML message: columns named `cdc.<path>`
nest at `<path>`, every other column lands under `data`
(reference: components/seed_store.clj:38-48; property law in
test/cdc_init/components/seed_store_test.clj:47-56). The Kafka record is

  key   = JSON array of the `id` entries sorted by column name, flattened
          to [k1, v1, k2, v2, ...]   (seed_store.clj:50-55; golden bytes
          at seed_store_test.clj:102-103)
  value = JSON object of the whole DML message

Spark-first design: the nesting structure depends only on column NAMES,
which are known at plan time — so we build a nested STRUCT column
expression once, and the per-row work is pure JVM `to_json`. Nested object
key order is alphabetical at every level (deterministic; the reference's
runtime order is map-iteration order, pinned by its tests only via
round-trip, so we are free to canonicalize).

Key encoding has two paths:
- fast path (all id columns STRING — the realistic CDC case, PKs rendered
  as strings): `to_json` of a string array, fully JVM-side;
- exact path (typed id values): a vectorized pandas UDF doing
  `json.dumps(..., separators=(",", ":"))`, byte-compatible with the
  reference's Cheshire output for null/bool/int/string values.
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

CDC_PREFIX = "cdc."


def nest_seed_columns(columns: list[str]) -> dict[str, Any]:
    """Column names → nested tree of {json_field: column_name | subtree}.

    Mirrors seed-row->dml-msg (seed_store.clj:38-48): `cdc.a.b` nests at
    ['a','b']; anything else goes under ['data', <name>]. Column labels are
    lower-cased as the reference lower-cases result-set labels
    (seed_store.clj:65-70).
    """
    tree: dict[str, Any] = {}
    for col in columns:
        label = col.lower()
        if label.startswith(CDC_PREFIX):
            path = label.split(".")[1:]
        else:
            path = ["data", label]
        node = tree
        for part in path[:-1]:
            node = node.setdefault(part, {})
            if not isinstance(node, dict):
                raise ValueError(f"conflicting nesting at {part!r} for {col!r}")
        node[path[-1]] = col
    return tree


def _tree_to_struct(tree: dict[str, Any]) -> Column:
    fields = []
    for name in sorted(tree):
        v = tree[name]
        if isinstance(v, dict):
            fields.append(_tree_to_struct(v).alias(name))
        else:
            fields.append(F.col(f"`{v}`").alias(name))
    return F.struct(*fields)


def dml_struct(df: DataFrame) -> Column:
    """The nested DML message as a single STRUCT column."""
    return _tree_to_struct(nest_seed_columns(df.columns))


def id_columns(df: DataFrame) -> list[str]:
    """Source column names feeding the `id` map, sorted by id key name
    (the key-sort rule of seed_store.clj:54)."""
    prefix = CDC_PREFIX + "id."
    cols = [c for c in df.columns if c.lower().startswith(prefix)]
    return sorted(cols, key=lambda c: c.lower()[len(prefix):])


def canonical_key(df: DataFrame) -> Column:
    """The canonical message key: flattened [k1,v1,k2,v2,...] JSON array,
    entries sorted by id column name (seed_store.clj:50-55)."""
    idcols = id_columns(df)
    if not idcols:
        return F.lit(None).cast(StringType())
    prefix_len = len(CDC_PREFIX + "id.")
    names = [c.lower()[prefix_len:] for c in idcols]
    dtypes = dict(df.dtypes)
    _JVM_TYPES = {"string", "tinyint", "smallint", "int", "bigint", "boolean"}
    if all(dtypes[c] in _JVM_TYPES for c in idcols):
        # JVM fast path — assemble the JSON array with concat_ws. Scalar
        # encodings are byte-compatible with json.dumps/Cheshire:
        # strings via to_json(array(s)) minus its brackets (full JSON
        # escaping), integrals as bare digits, booleans as true/false,
        # NULL as null. No Python in the loop.
        parts: list[Column] = []
        for name, col in zip(names, idcols):
            parts.append(F.lit(json.dumps(name)))
            c = F.col(f"`{col}`")
            if dtypes[col] == "string":
                j = F.to_json(F.array(c))  # ["escaped"] / [null]
                parts.append(j.substr(F.lit(2), F.length(j) - 2))
            elif dtypes[col] == "boolean":
                parts.append(F.coalesce(F.when(c, "true").otherwise("false"), F.lit("null")))
            else:  # integral
                parts.append(F.coalesce(c.cast("string"), F.lit("null")))
        return F.concat(F.lit("["), F.concat_ws(",", *parts), F.lit("]"))
    # Exact path for typed id values: Arrow-batched pandas UDF.
    @F.pandas_udf(StringType())
    def encode(*series: pd.Series) -> pd.Series:
        out = []
        for vals in zip(*series):
            flat: list[Any] = []
            for name, v in zip(names, vals):
                if v is not None and pd.isna(v):
                    v = None
                if hasattr(v, "item"):
                    v = v.item()
                flat.extend([name, v])
            out.append(json.dumps(flat, separators=(",", ":"), ensure_ascii=False))
        return pd.Series(out)

    return encode(*[F.col(f"`{c}`") for c in idcols])


def seed_messages(df: DataFrame) -> DataFrame:
    """Full seed-row → (key, value) projection (A19+A20). One narrow
    Spark stage: scan → struct projection → JSON encode; no shuffle."""
    return df.select(
        canonical_key(df).alias("key"),
        F.to_json(dml_struct(df), {"ignoreNullFields": "false"}).alias("value"),
    )


def seed_row_to_dml(row: dict[str, Any]) -> dict[str, Any]:
    """Driver-side single-row form (used by tests and the in-memory seed
    store fake) — same law as the column expression."""
    tree = nest_seed_columns(list(row))

    def resolve(node):
        if isinstance(node, dict):
            return {k: resolve(v) for k, v in sorted(node.items())}
        return row[node]

    return resolve(tree)


def dml_to_seed_message(dml: dict[str, Any]) -> dict[str, str]:
    """Driver-side (key, value) encoding of a DML dict — byte-compatible
    with the golden bytes of seed_store_test.clj:102-103."""
    id_map = dml.get("id") or {}
    flat: list[Any] = []
    for k in sorted(id_map):
        flat.extend([k, id_map[k]])
    return {
        "key": json.dumps(flat, separators=(",", ":"), ensure_ascii=False),
        "value": json.dumps(_sorted_deep(dml), separators=(",", ":"), ensure_ascii=False),
    }


def _sorted_deep(v: Any) -> Any:
    if isinstance(v, dict):
        return {k: _sorted_deep(v[k]) for k in sorted(v)}
    return v
