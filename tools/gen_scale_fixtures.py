"""Generate sf1.0 scale fixtures by deterministic 10x tiling of the
driver's sf0.1 testdata (VERDICT r3 "Next round" item 4).

Writes ``.scale/sf1.0/*.parquet`` inside the repo (gitignored — ~170 MB,
regenerated on demand):

    python tools/gen_scale_fixtures.py

Tiling contract — designed so measured work grows LINEARLY with the
tile count, the regime a real 10x corpus has, making a quadratic term
in any operator show up as a >>10x wall-clock ratio:

- ``region``/``nation`` stay fixed (TPC-H dimension tables do not scale
  with SF; broadcast joins must stay broadcast-sized).
- Fact/entity keys (custkey, suppkey, partkey, orderkey, event_id,
  user_id, doc_id, vec_id) get ``replica * 10_000_000`` offsets, and
  every foreign key is remapped with its parent so referential
  integrity and join fan-outs are preserved per replica.
- ``documents.text``: replica i > 0 suffixes every token with a 2-char
  tag ("xa".."xi"), so shingle/minhash/bigram structure REPEATS per
  replica instead of colliding across replicas — near-dup pair counts
  scale 10x, not 100x (10 mutually-near-duplicate copies of every doc
  would turn LSH buckets quadratic, which a real 10x crawl does not).
  ``n_chars`` is recomputed to stay consistent with the text.
- ``embeddings.embedding``: component-rolled by replica (np.roll) —
  norm-preserving, cross-replica cosine decorrelated, so ANN/SemDeDup
  cluster structure repeats per replica (linear), never merges.
- Timestamps are left as-is: time-window populations grow 10x per
  window (denser streams), user/session keys are replica-distinct.

Determinism: pure arithmetic on the (seed=42, read-only) driver tables;
no RNG. Row order: replica-major concatenation.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, ".scale", "sf1.0")
TILES = int(os.environ.get("SPARK_GRAFT_SCALE_TILES", "10"))
OFF = 10_000_000

# table -> columns that get the replica key offset
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]

_TAGS = "abcdefghijklmnopqrstuvwxyz"


def _tag_text(text: str, i: int) -> str:
    tag = "x" + _TAGS[i]
    return " ".join(
        (w + tag) if w else w for w in text.split(" ")
    )


def _tile(table: pa.Table, name: str, i: int) -> pa.Table:
    if i == 0:
        return table
    out = table
    for col in KEY_COLS[name]:
        idx = out.schema.get_field_index(col)
        field = out.schema.field(idx)
        shifted = pc.add(out.column(idx), pa.scalar(i * OFF)).cast(field.type)
        out = out.set_column(idx, field, shifted)
    if name == "documents":
        texts = [_tag_text(t, i) if t is not None else None
                 for t in out.column("text").to_pylist()]
        ti = out.schema.get_field_index("text")
        out = out.set_column(ti, out.schema.field(ti),
                             pa.array(texts, type=out.schema.field(ti).type))
        ni = out.schema.get_field_index("n_chars")
        nchars = pa.array(
            [len(t) if t is not None else None for t in texts],
            type=out.schema.field(ni).type,
        )
        out = out.set_column(ni, out.schema.field(ni), nchars)
    if name == "embeddings":
        ei = out.schema.get_field_index("embedding")
        field = out.schema.field(ei)
        vecs = out.column("embedding").to_pylist()
        rolled = [
            None if v is None else np.roll(np.asarray(v, dtype=np.float32), i).tolist()
            for v in vecs
        ]
        out = out.set_column(ei, field, pa.array(rolled, type=field.type))
    return out


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name in COPY_ONLY + list(KEY_COLS):
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(OUT, f"{name}.parquet")
        table = pq.read_table(src)
        if name in COPY_ONLY:
            pq.write_table(table, dst)
            print(f"{name}: {table.num_rows} rows (dimension, copied)")
            continue
        writer = pq.ParquetWriter(dst, table.schema)
        total = 0
        try:
            for i in range(TILES):
                t = _tile(table, name, i)
                writer.write_table(t)
                total += t.num_rows
        finally:
            writer.close()
        print(f"{name}: {total} rows ({TILES}x {table.num_rows})")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    sys.exit(main())
