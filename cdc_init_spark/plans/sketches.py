"""DataSketches corpus entries (EXT): mergeable HLL / KLL / Theta
sketches (operators/datasketches.py) — the metadata-cost roll-up
complement of the exact operators.

q133 (Theta set algebra) is oracle-paired: below the sketch's nominal
entry budget (k=4096) Theta runs in exact mode and its estimates are
partition-invariant integers, so the distinct-set algebra hash-matches
DuckDB's exact UNION/INTERSECT/EXCEPT counts at every test SF (pinned
by probe and by tests/test_sketches.py). HLL and KLL entries are
rows-only — their mode transitions are engine-internal — with accuracy
laws pinned in pytest instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_init_spark.operators import datasketches as ds
from cdc_init_spark.plans import query
from cdc_init_spark.tables import load_table


@query("q131_hll_source_uniques")  # rows-only: HLL internals differ per engine
def q131(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source distinct-document estimates as mergeable HLL sketches
    (datasketches.hll_group_uniques). At 100 TB each ingest partition
    sketches once; corpus-wide uniques come from hll_union_agg over the
    stored sketches (law pinned in tests/test_sketches.py: union-merge
    estimate equals the direct global-sketch estimate)."""
    d = load_table(spark, sf, "documents")
    return (
        ds.hll_group_uniques(d, "source", "text")
        .select("source", "estimate")
        .orderBy("source")
    )


@query("q132_kll_price_quantiles")  # rows-only: KLL internals differ per engine
def q132(spark: SparkSession, sf: str) -> DataFrame:
    """Per-status order-price quantiles from KLL sketches
    (datasketches.kll_group_quantiles) — rank-error-bounded, mergeable
    to global quantiles with NO global sort (the sketch complement of
    q74's approx_percentile; accuracy law in tests/test_sketches.py)."""
    o = load_table(spark, sf, "orders")
    return (
        ds.kll_group_quantiles(o, "o_orderstatus", "o_totalprice", [0.5, 0.9])
        .select("o_orderstatus", "q0_5", "q0_9")
        .orderBy("o_orderstatus")
    )


@query(
    "q133_theta_user_overlap",
    oracle="""
    WITH a AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
    ), b AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND value > 120
    )
    SELECT (SELECT COUNT(*) FROM a) AS n_a,
           (SELECT COUNT(*) FROM b) AS n_b,
           (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS n_union,
           (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS n_intersect,
           (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_a_only
    """,
)
def q133(spark: SparkSession, sf: str) -> DataFrame:
    """Theta-sketch distinct-set algebra between two user cohorts
    (signed-up vs high-value purchasers), computed from ONE sketch per
    cohort with no join (datasketches.theta_overlap_estimate). lgk=17
    (131072 nominal entries, r6) keeps the sketches in EXACT mode at
    every gated SF including the 10x sf1.0 tiling (largest cohort there
    ~15k users), so the oracle is DuckDB's literal UNION/INTERSECT/
    EXCEPT arithmetic at all of them — the r5 sf1.0 differential
    exclusion (default 4096-entry sketches left exact mode at 10x) is
    retired. At 10^9 users the same plan degrades gracefully to ±rse
    estimates at the fixed 2^lgk·8B sketch cost; the estimation-regime
    laws stay pytest-pinned in tests/test_sketches.py."""
    e = load_table(spark, sf, "events")
    cohorts = e.select(
        F.when(F.col("event_type") == "signup", "a")
        .when(
            (F.col("event_type") == "purchase") & (F.col("value") > 120), "b"
        )
        .alias("cohort"),
        "user_id",
    ).filter(F.col("cohort").isNotNull())
    sk = ds.theta_group_sketches(cohorts, "cohort", "user_id", lgk=17)
    return ds.theta_overlap_estimate(sk, "cohort", "a", "b", lgk=17)


@query(
    "q134_bitmap_exact_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q134(spark: SparkSession, sf: str) -> DataFrame:
    """Exact mergeable distinct via bitmap aggregation
    (datasketches.bitmap_distinct_by_group): per-(group, 32k-bucket)
    bitmaps OR-merge associatively and count exactly — unlike
    COUNT(DISTINCT) the exchange carries ≤4 KiB bitmaps instead of the
    id stream, and per-day/per-source bitmaps roll up later without a
    re-scan. Oracle is the literal COUNT(DISTINCT): the bitmap path must
    be EXACT, not an estimate."""
    e = load_table(spark, sf, "events")
    from cdc_init_spark.operators.datasketches import bitmap_distinct_by_group

    return (
        bitmap_distinct_by_group(e, "event_type", "user_id")
        .select("event_type", F.col("n_distinct").cast("bigint").alias("n_distinct"))
        .orderBy("event_type")
    )


@query(
    "q135_nullsafe_join",
    oracle="""
    WITH a AS (
      SELECT DISTINCT props FROM events WHERE event_type = 'click'
    ), b AS (
      SELECT DISTINCT props FROM events WHERE event_type = 'view'
    )
    SELECT a.props AS props_a, b.props AS props_b
    FROM a JOIN b ON a.props IS NOT DISTINCT FROM b.props
    ORDER BY props_a NULLS FIRST
    """,
)
def q135(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equi-join (P5/J1 closure): Spark's <=> operator against
    DuckDB's IS NOT DISTINCT FROM — NULL keys MATCH each other instead
    of vanishing (the semantics CDC merge keys need when a nullable
    column is part of the identity). The null-safe predicate still
    plans as a hash join (eqNullSafe is an equi-key), not a nested
    loop."""
    e = load_table(spark, sf, "events")
    a = (
        e.filter(F.col("event_type") == "click")
        .select(F.col("props").alias("props_a"))
        .distinct()
    )
    b = (
        e.filter(F.col("event_type") == "view")
        .select(F.col("props").alias("props_b"))
        .distinct()
    )
    return a.join(b, a.props_a.eqNullSafe(b.props_b)).orderBy(
        F.col("props_a").asc_nulls_first()
    )
