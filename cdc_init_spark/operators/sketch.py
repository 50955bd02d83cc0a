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

The hash family is the portable md5-prefix bucket
(operators.sampling.hash_bucket) salted per row, so sketch contents —
not just estimates — are bit-identical in any engine, and the whole
pipeline is DuckDB-oracle verifiable (plans/corpus_ops.py q121).

Scale notes (100 TB): the token stream never shuffles at full width —
the groupBy (d, bucket) partial-aggregates map-side down to depth·width
cells per task before the exchange; estimates for a query set of terms
are a broadcast join of (term × depth) rows against the cell relation.
Unlike the exact top-k vocabulary (q110), memory is O(depth·width)
however many distinct terms exist — the sketch answers point queries
for ANY term after one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_init_spark.operators.sampling import hash_bucket


def count_min_sketch(
    terms: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Build the sketch from a relation of term OCCURRENCES (one row per
    occurrence). Returns (d, bucket, c): depth·width cells at most."""
    rows = terms.select(
        F.col(term_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        hash_bucket(
                            F.col(term_col), width, f"{salt}{d}"
                        ).alias("bucket"),
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
    fan = query_terms.select(
        F.col(term_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        hash_bucket(
                            F.col(term_col), width, f"{salt}{d}"
                        ).alias("bucket"),
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
