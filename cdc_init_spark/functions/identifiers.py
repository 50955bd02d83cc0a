"""Database identifier algebra.

Port of the reference's Oracle identifier handling
(reference: src/cdc_init/sql/util.clj:8-57): schema-qualified references,
quoted identifiers, schema ownership checks, and the `mq_` queue-table
prefix rule (sql/util.clj:36-46). Pure functions — used by CCD validation
(model.check_ccd) and the change-data-store implementations.
"""

from __future__ import annotations

import re

# One identifier: a quoted name (anything but quotes inside) or an unquoted
# Oracle-style name (reference regex at sql/util.clj:8-9).
_OBJ = r'("[^"]+"|[A-Za-z][A-Za-z0-9_$#]*)'

_OBJ_RE = re.compile(rf"{_OBJ}", re.IGNORECASE)
_REF_RE = re.compile(rf"{_OBJ}\.{_OBJ}", re.IGNORECASE)


def split_table_ref(ref: str) -> dict[str, str]:
    """`schema.table` → {'schema': ..., 'table': ...}; raises if the
    reference is not schema-qualified (reference: sql/util.clj:48-57)."""
    m = _REF_RE.fullmatch(ref or "")
    if not m:
        raise ValueError(f"schema must be provided for table reference {ref!r}")
    return {"schema": m.group(1), "table": m.group(2)}


def strip_schema(ref: str) -> str:
    """Remove the schema qualifier if present (sql/util.clj:31-34)."""
    m = _REF_RE.fullmatch(ref or "")
    return m.group(2) if m else ref


def in_own_schema(ref: str, username: str) -> bool:
    """True if `ref` belongs to `username`'s schema; unqualified references
    are assumed owned (sql/util.clj:20-29)."""
    m = _REF_RE.fullmatch(ref or "")
    if not m:
        return True
    return m.group(1).lower().replace('"', "") == (username or "").lower()


def mq_table(ref: str) -> str | None:
    """Backing message-queue table name: the object part prefixed `mq_`,
    inside the quotes when quoted (sql/util.clj:36-46)."""
    m = _REF_RE.fullmatch(ref or "")
    if m:
        schema, obj = m.group(1), m.group(2)
    else:
        m1 = _OBJ_RE.fullmatch(ref or "")
        if not m1:
            return None
        schema, obj = None, m1.group(1)
    prefixed = f'"mq_{obj[1:]}' if obj.startswith('"') else f"mq_{obj}"
    return f"{schema}.{prefixed}" if schema else prefixed
