"""Mergeable-sketch operators on Spark's built-in Apache DataSketches
functions (HLL distinct, KLL quantiles, Theta set operations) — EXT,
complementing the hand-built relational sketches (operators/sketch.py:
count-min, Bloom).

The 100 TB pattern all three share: sketch ONCE per partition/group at
scan time (partial-aggregable, bytes-sized state), persist the sketch
bytes, then answer later questions by MERGING sketches — never by
re-scanning the corpus. Merge is associative and loss-bounded, so
per-source/per-day sketches roll up to corpus totals at metadata cost:

- HLL: distinct counts per group + union across groups (merge at equal
  lgK preserves the error bound; the union estimate tracks the direct
  whole-column sketch to within its rank error — not bit-identical,
  the union gadget may transition modes differently).
- KLL: rank/quantile estimates per group, mergeable to global quantiles
  without a global sort (the streaming complement of q74's
  approx_percentile t-digest).
- Theta: distinct-set algebra BETWEEN groups — union / intersection /
  difference estimates (e.g. train∩eval contamination volume) without
  any join.

All three are rows-only at the driver's gate (DuckDB has no
DataSketches); pytest pins the laws: merge equality, tolerance vs exact
answers, and partition invariance of the estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_group_uniques(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group distinct-count estimates as mergeable HLL sketches:
    one row per group with the sketch bytes AND the point estimate.
    Partial-aggregable — the exchange carries one lgK-sized sketch per
    (partition, group), not values."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(value_col, F.lit(lgk))
        ).alias("estimate"),
    )


def hll_merged_estimate(
    sketches: DataFrame,
    sketch_col: str = "sketch",
    lgk: int = 12,
) -> DataFrame:
    """Roll per-group sketches up to ONE corpus-wide distinct estimate —
    a #groups-row aggregate, no data re-scan. At equal lgK the union
    estimate tracks the direct whole-column sketch within the sketch's
    error bound (pytest pins the tolerance)."""
    return sketches.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(sketch_col, F.lit(False))
        ).alias("estimate")
    )


def kll_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float],
    k: int = 200,
) -> DataFrame:
    """Per-group KLL quantile estimates over a DOUBLE column, one row
    per group with the sketch plus the requested quantiles. Mergeable:
    keep the sketch column, `kll_merge_agg_double` rolls groups up to
    global quantiles with rank error ~1.7%/k·... (bounded by k), no
    global sort anywhere."""
    sk = F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k))
    qs = [
        F.kll_sketch_get_quantile_double(sk, F.lit(float(q))).alias(
            f"q{str(q).replace('.', '_')}"
        )
        for q in quantiles
    ]
    return df.groupBy(group_col).agg(sk.alias("sketch"), *qs)


def kll_merged_quantiles(
    sketches: DataFrame,
    quantiles: list[float],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Global quantiles from per-group KLL sketches (#groups-row agg)."""
    merged = F.kll_merge_agg_double(sketch_col)
    qs = [
        F.kll_sketch_get_quantile_double(merged, F.lit(float(q))).alias(
            f"q{str(q).replace('.', '_')}"
        )
        for q in quantiles
    ]
    return sketches.agg(*qs)


def theta_group_sketches(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lgk: int | None = None,
) -> DataFrame:
    """One Theta sketch per group over the value column — the input to
    set-algebra estimates between groups. ``lgk`` = log2 nominal
    entries (None = Spark's default, 4096): the sketch is EXACT up to
    2^lgk distinct values and a ±rse estimate beyond — callers whose
    downstream check needs the exact regime (the q133 oracle is literal
    set arithmetic) size lgk above their cohort cardinality; the cost
    is the sketch bytes, never a wider exchange."""
    return df.groupBy(group_col).agg(
        F.theta_sketch_agg(value_col, lgk).alias("sketch")
    )


def theta_overlap_estimate(
    sketches: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    sketch_col: str = "sketch",
    lgk: int | None = None,
) -> DataFrame:
    """Distinct-set algebra between two groups from their sketches
    alone: |A|, |B|, |A∪B|, |A∩B|, |A\\B| estimates — the joinless
    contamination/overlap volume check (the exact complement is q113's
    gram join; this answers the same question at metadata cost when the
    sets are 10^9+ and only the VOLUME is needed)."""
    a = sketches.filter(F.col(group_col) == group_a).select(
        F.col(sketch_col).alias("_a")
    )
    b = sketches.filter(F.col(group_col) == group_b).select(
        F.col(sketch_col).alias("_b")
    )
    return a.crossJoin(b).select(
        F.theta_sketch_estimate(F.col("_a")).alias("n_a"),
        F.theta_sketch_estimate(F.col("_b")).alias("n_b"),
        F.theta_sketch_estimate(
            F.theta_union(F.col("_a"), F.col("_b"), lgk)
        ).alias("n_union"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("_a"), F.col("_b"))
        ).alias("n_intersect"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("_a"), F.col("_b"))
        ).alias("n_a_only"),
    )


def bitmap_distinct_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """EXACT mergeable distinct counts for integer keys via bitmap
    aggregation (Spark 3.5 bitmap_* functions): each (group, 32k-bucket)
    folds to one ≤4 KiB bitmap on the executors, bitmaps OR-merge
    associatively, and the final count is exact — the dense-int-key
    alternative to HLL when exactness is required (dedup audits,
    billing). Two partial-aggregable stages; the exchange carries
    bitmaps, never ids. Returns (group, n_distinct)."""
    pos = df.select(
        F.col(group_col),
        F.bitmap_bucket_number(F.col(value_col)).alias("_bkt"),
        F.bitmap_bit_position(F.col(value_col)).alias("_pos"),
    )
    per_bucket = pos.groupBy(group_col, "_bkt").agg(
        F.bitmap_construct_agg(F.col("_pos")).alias("_bm")
    )
    return per_bucket.groupBy(group_col).agg(
        F.sum(F.bitmap_count(F.col("_bm"))).alias("n_distinct")
    )
