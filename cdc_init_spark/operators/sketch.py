"""Sketch operators (EXT, B-XI family): fixed-size summaries whose cost
is independent of corpus size.

Origin: EXT — mandated by the BASELINE.json ``north_star`` (corpus
statistics at 100 TB); the reference has no sketches (its one aggregate
is a COUNT pushed into Oracle,
/root/reference/src/cdc_init/sql/seeds/record_count.sql:1-6).

``count_min_sketch`` / ``cms_estimate`` implement the Cormode-
Muthukrishnan count-min sketch relationally: the sketch is a
(depth × width) relation of bucket counts — built with ONE partial-
aggregated groupBy whose output size is depth·width rows REGARDLESS of
corpus size — and a point estimate for a term is the MIN of its
``depth`` bucket counts (always an over-estimate; error ≤ ε·N with
ε = e/width at the usual depth = ln(1/δ)).

``bloom_bits`` / ``bloom_might_contain`` / ``bloom_prune`` implement a
Bloom filter the same way: membership state is ``m`` bits built from a
key relation with ONE word-level aggregate (≤ m/64 rows ever reach the
driver), and the membership test is a pure column expression — one digest
bound through a higher-order ``exists`` over k bucket probes into a
broadcast literal bitmask (no join, no shuffle, no Python; the HOF
lambda itself evaluates as a CodegenFallback expression inside the
codegen'd filter stage). That is Spark's missing runtime-filter as an
explicit
operator: prune a 100 TB fact scan against a dim/eval key set that is
too large to broadcast as raw strings but collapses to a fixed
m/8-byte bitmask. Guarantee: no false negatives (a pruned row is
NEVER in the key set), so ``bloom_prune`` → exact join ≡ exact join.

The hash family is the portable md5-prefix bucket
(operators.sampling.hash_bucket) salted per row, so sketch contents —
not just estimates — are bit-identical in any engine, and the whole
pipeline is DuckDB-oracle verifiable (plans/corpus_ops.py q121, q123).

Scale notes (100 TB): the token stream never shuffles at full width —
the groupBy (d, bucket) partial-aggregates map-side down to depth·width
cells per task before the exchange; estimates for a query set of terms
are a broadcast join of (term × depth) rows against the cell relation.
Unlike the exact top-k vocabulary (q110), memory is O(depth·width)
however many distinct terms exist — the sketch answers point queries
for ANY term after one pass.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_init_spark.operators.sampling import hash_bucket  # noqa: F401 — public re-export


def _km_positions(
    col: Column, n_hashes: int, width: int, salt: str
) -> list[Column]:
    """Double-hashing probe family (Kirsch-Mitzenmacher, ESA'06): ONE
    portable md5 per key yields two 32-bit halves h1 (hex 1-8) and h2
    (hex 9-16); probe i is ``(h1 + i·(2·h2+1)) % width``. One digest
    feeds all n_hashes rows/probes — at 100 TB the per-occurrence hash
    is the dominant sketch-build cost, so this cuts it ×n_hashes with
    the same error guarantees. ``2·h2+1`` forces an odd stride so probes
    never collapse for power-of-two widths. Spark's subexpression
    elimination computes the shared md5 once; DuckDB oracles (q121,
    q123) re-derive identical positions from the same digest windows."""
    keyed = (
        F.concat(col.cast("string"), F.lit(salt)) if salt else col.cast("string")
    )
    digest = F.md5(keyed)
    h1 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(digest, 9, 8), 16, 10).cast("bigint")
    stride = h2 * F.lit(2) + F.lit(1)
    return [((h1 + F.lit(i) * stride) % width).cast("int") for i in range(n_hashes)]


def count_min_sketch(
    terms: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Build the sketch from a relation of term OCCURRENCES (one row per
    occurrence). Returns (d, bucket, c): depth·width cells at most."""
    buckets = _km_positions(F.col(term_col), depth, width, salt)
    rows = terms.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), buckets[d].alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_s"),
    ).select(F.col("_s.d").alias("d"), F.col("_s.bucket").alias("bucket"))
    return rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    query_terms: DataFrame,
    sketch: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate occurrence counts for ``query_terms`` (distinct
    terms): est = min over d of the term's bucket count. The query side
    fans out ×depth then broadcast-joins the cell relation — both sides
    are tiny next to the corpus."""
    buckets = _km_positions(F.col(term_col), depth, width, salt)
    fan = query_terms.select(
        F.col(term_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), buckets[d].alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_s"),
    ).select(term_col, F.col("_s.d").alias("d"), F.col("_s.bucket").alias("bucket"))
    return (
        fan.join(F.broadcast(sketch), on=["d", "bucket"], how="left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


# --- Bloom filter ---------------------------------------------------------

def _bloom_positions(col: Column, m: int, k: int, salt: str) -> list[Column]:
    """The k probe positions of one key: the shared double-hashing
    family (``_km_positions``) over m bit positions."""
    return _km_positions(col, k, m, salt)


def _bit(pos: Column) -> Column:
    """1 << (pos % 64) as a BIGINT (column-valued shift — the pyspark
    ``shiftleft`` wrapper only takes a literal shift amount)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), (pos % 64).cast("int")
    )


def bloom_bits(
    keys: DataFrame,
    key_col: str,
    m: int = 1 << 17,
    k: int = 2,
    salt: str = "blm",
) -> list[int]:
    """Build the filter: a list of m/64 signed-64-bit words (the sketch
    itself — driver-sized BY CONSTRUCTION, like any sketch).

    The key relation never collects: positions fold word-level on the
    executors (groupBy pos>>6, bit_or of the position bit), so at most
    m/64 rows cross to the driver no matter how many keys went in.

    Sizing: for n expected keys, m ≈ 1.44·k·n/ln2 bits gives FPR ≈
    2^-k; the defaults (m=128Ki bits = 16 KiB, k=2) hold FPR < 5% up to
    ~30k keys and broadcast at fixed cost forever."""
    if m % 64:
        raise ValueError("m must be a multiple of 64")
    pos = keys.select(
        F.explode(F.array(*_bloom_positions(F.col(key_col), m, k, salt))).alias(
            "_p"
        )
    )
    words = (
        pos.groupBy((F.col("_p") / 64).cast("int").alias("_w"))
        .agg(F.bit_or(_bit(F.col("_p"))).alias("_bits"))
        .collect()
    )
    out = [0] * (m // 64)
    for r in words:
        out[r["_w"]] = r["_bits"]
    return out


def bloom_might_contain(
    col: Column,
    bits: list[int],
    m: int | None = None,
    k: int = 2,
    salt: str = "blm",
) -> Column:
    """Pure-expression membership test: true iff all k probe bits are
    set. Narrow map over a broadcast literal array — no join, no
    shuffle, whole-stage codegen; false ⇒ the key is DEFINITELY not in
    the set that built ``bits``."""
    m = m if m is not None else len(bits) * 64
    lit_bits = F.lit(bits)
    # Bind the digest halves through a higher-order-function lambda so
    # the md5 and the two hex→bigint conversions are evaluated ONCE per
    # row: FilterExec generates each conjunct separately (short-circuit
    # evaluation), so codegen subexpression elimination does NOT share
    # the digest across the k probe checks — measured ~25% of the whole
    # probe stage at sf0.1 (q123). The probe positions are bit-identical
    # to _bloom_positions' (same md5 windows, same stride), so sketch
    # contents and oracle replays are unchanged.
    keyed = (
        F.concat(col.cast("string"), F.lit(salt)) if salt else col.cast("string")
    )
    digest = F.md5(keyed)
    halves = F.transform(
        F.array(digest),
        lambda dg: F.struct(
            F.conv(F.substring(dg, 1, 8), 16, 10).cast("bigint").alias("h1"),
            F.conv(F.substring(dg, 9, 8), 16, 10).cast("bigint").alias("h2"),
        ),
    )

    def _all_probes_set(h: Column) -> Column:
        stride = h["h2"] * F.lit(2) + F.lit(1)
        checks = []
        for i in range(k):
            p = (h["h1"] + F.lit(i) * stride) % m
            checks.append(
                F.element_at(lit_bits, (p / 64).cast("int") + 1).bitwiseAND(
                    _bit(p)
                )
                != 0
            )
        return reduce(lambda a, b: a & b, checks)

    return F.exists(halves, _all_probes_set)


def bloom_prune(
    fact: DataFrame,
    fact_col: str,
    keys: DataFrame,
    key_col: str,
    m: int = 1 << 17,
    k: int = 2,
    salt: str = "blm",
) -> DataFrame:
    """Runtime-filter-style semi-join prune: the fact rows whose key
    MIGHT be in ``keys`` — a superset of the exact semi join, reached
    without shuffling the fact and without broadcasting raw keys. At
    100 TB this turns `fact ⨝ dim` into `prune(fact) ⨝ dim` where the
    exact join's shuffle carries only surviving (≈ matching + FPR·|fact|)
    rows; correctness is unchanged because pruning has no false
    negatives."""
    bits = bloom_bits(keys, key_col, m, k, salt)
    return fact.filter(bloom_might_contain(F.col(fact_col), bits, m, k, salt))
