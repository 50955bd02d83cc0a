"""Statistical aggregates + skew-safe twin entries (engine completeness
beyond SURVEY B-IV: stddev/variance/correlation/percentiles, and the
salted-aggregation path proven equal to the plain one via the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_init_spark.functions.compat import round_compat
from cdc_init_spark.plans import query
from cdc_init_spark.tables import load_table


@query(
    "q73_stats_aggs",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_discount), 6) AS var_disc,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q73(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregate family — single-pass co-moment aggregates
    (Welford-style partial+final, no extra shuffle vs. plain agg)."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            round_compat(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            round_compat(F.var_samp("l_discount"), 6).alias("var_disc"),
            round_compat(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "corr_qty_price"
            ),
            round_compat(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "cov_qty_price"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q74_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q74(spark: SparkSession, sf: str) -> DataFrame:
    """Exact continuous percentiles (linear interpolation — identical
    definition in Spark's percentile and DuckDB's quantile_cont). Exact
    percentile sorts per group; at 100 TB prefer approx_percentile
    (t-digest, partial-aggregable) — bench-only because the sketch
    differs across engines."""
    o = load_table(spark, sf, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            round_compat(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            round_compat(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        )
        .orderBy("o_orderstatus")
    )


@query("q74_approx_percentiles")  # rows-only: t-digest sketch differs per engine
def q74b(spark: SparkSession, sf: str) -> DataFrame:
    """The 100 TB path for q74: ``approx_percentile`` — a partial-
    aggregable quantile sketch (map-side combine, bounded memory per
    group), vs the exact form's full per-group sort. No DuckDB oracle
    by design (the sketch is engine-specific); the accuracy contract
    (within 1% relative error of exact at the driver fixtures' scale)
    is pinned in tests/test_stats_scale.py, mirroring q71's HLL
    treatment (VERDICT r1, "Next round" item 5)."""
    o = load_table(spark, sf, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            round_compat(
                F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)), 4
            ).alias("p50"),
            round_compat(
                F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000)), 4
            ).alias("p90"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q79_cdc_apply",
    oracle="""
    WITH latest AS (
      SELECT user_id,
             max_by(event_type, ts) AS op,
             max_by(value, ts) AS new_bal
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
      GROUP BY user_id
    )
    SELECT c.c_custkey,
           ROUND(CASE WHEN l.user_id IS NOT NULL THEN l.new_bal
                      ELSE c.c_acctbal END, 4) AS acctbal
    FROM customer c
    LEFT JOIN latest l ON l.user_id = c.c_custkey AND l.op <> 'error'
    WHERE NOT EXISTS (
      SELECT 1 FROM latest d WHERE d.user_id = c.c_custkey AND d.op = 'error'
    )
    ORDER BY c.c_custkey
    """,
)
def q79(spark: SparkSession, sf: str) -> DataFrame:
    """CDC apply (streaming/apply.apply_changes): events replayed as a DML
    change log over the customer snapshot — 'signup'/'purchase' upsert the
    account balance, 'error' deletes the customer; latest change per key
    wins (the compacted-topic semantics of the reference,
    topic_store.clj:15). Oracle reproduces the merge in pure SQL."""
    from cdc_init_spark.streaming.apply import apply_changes

    c = load_table(spark, sf, "customer")
    e = load_table(spark, sf, "events")
    changes = (
        e.filter(F.col("event_type").isin("signup", "purchase", "error"))
        .select(
            F.col("user_id").alias("c_custkey"),
            F.col("ts"),
            F.when(F.col("event_type") == "error", "delete")
            .otherwise("update")
            .alias("type"),
            F.lit(None).cast("string").alias("c_name"),
            F.lit(None).cast("int").alias("c_nationkey"),
            F.col("value").alias("c_acctbal"),
            F.lit(None).cast("string").alias("c_mktsegment"),
        )
    )
    # restrict to keys present in the snapshot (the oracle starts FROM
    # customer; pure inserts of brand-new keys are covered by pytest)
    changes = changes.join(
        c.select("c_custkey"), on="c_custkey", how="left_semi"
    )
    merged = apply_changes(c, changes, pk_cols=["c_custkey"], order_col="ts")
    return merged.select(
        "c_custkey", round_compat(F.col("c_acctbal"), 4).alias("acctbal")
    ).orderBy("c_custkey")


@query(
    "q75_salted_agg",
    oracle="""
    SELECT o_orderstatus,
           ROUND(SUM(o_totalprice), 2) AS sum_o_totalprice,
           COUNT(o_orderkey) AS count_o_orderkey,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q75(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators.skew.salted_agg) proven
    equal to the plain GROUP BY via the oracle. o_orderstatus has only 3
    values — exactly the key-cardinality regime where one hot key would
    otherwise serialize into a single reducer."""
    from cdc_init_spark.operators.skew import salted_agg

    o = load_table(spark, sf, "orders")
    res = salted_agg(
        o,
        keys=["o_orderstatus"],
        aggs={"o_totalprice": "sum", "o_orderkey": "count"},
        n_salts=8,
    )
    # avg derived from the salted sum/count partials
    avg = salted_agg(o, keys=["o_orderstatus"], aggs={"o_totalprice": "avg"}, n_salts=8)
    return (
        res.join(avg, "o_orderstatus")
        .select(
            "o_orderstatus",
            round_compat(F.col("sum_o_totalprice"), 2).alias("sum_o_totalprice"),
            F.col("count_o_orderkey"),
            round_compat(F.col("avg_o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q140_incremental_agg",
    oracle="""
    WITH latest AS (
      SELECT user_id,
             max_by(event_type, ts) AS op,
             max_by(value, ts) AS new_bal
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
      GROUP BY user_id
    )
    SELECT c.c_nationkey,
           ROUND(SUM(CASE WHEN l.user_id IS NOT NULL THEN l.new_bal
                          ELSE c.c_acctbal END), 2) AS sum_value,
           COUNT(*) AS n_rows
    FROM customer c
    LEFT JOIN latest l ON l.user_id = c.c_custkey AND l.op <> 'error'
    WHERE NOT EXISTS (
      SELECT 1 FROM latest d WHERE d.user_id = c.c_custkey AND d.op = 'error'
    )
    GROUP BY c.c_nationkey ORDER BY c.c_nationkey
    """,
)
def q140(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental view maintenance (streaming/apply.incremental_agg):
    per-nation balance totals updated from the change log with
    touched-keys-sized work — base_agg − old touched rows + surviving
    upserts — never re-scanning untouched groups. The oracle IS the full
    recompute over the merged state, so the incremental arithmetic is
    hash-verified equal to re-aggregation."""
    from cdc_init_spark.streaming.apply import incremental_agg

    c = load_table(spark, sf, "customer")
    e = load_table(spark, sf, "events")
    changes = (
        e.filter(F.col("event_type").isin("signup", "purchase", "error"))
        .select(
            F.col("user_id").alias("c_custkey"),
            F.col("ts"),
            F.when(F.col("event_type") == "error", "delete")
            .otherwise("update")
            .alias("type"),
            F.col("value").alias("c_acctbal"),
        )
        .join(c.select("c_custkey"), on="c_custkey", how="left_semi")
    )
    out = incremental_agg(
        c, changes, ["c_custkey"], ["c_nationkey"], "c_acctbal"
    )
    return out.select(
        "c_nationkey",
        round_compat(F.col("sum_value"), 2).alias("sum_value"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    ).orderBy("c_nationkey")


@query(
    "q141_time_travel",
    oracle="""
    WITH latest AS (
      SELECT user_id,
             max_by(event_type, ts) AS op,
             max_by(value, ts) AS new_bal
      FROM events
      WHERE event_type IN ('signup', 'purchase', 'error')
        AND ts <= TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY user_id
    )
    SELECT c.c_custkey,
           ROUND(CASE WHEN l.user_id IS NOT NULL THEN l.new_bal
                      ELSE c.c_acctbal END, 4) AS acctbal
    FROM customer c
    LEFT JOIN latest l ON l.user_id = c.c_custkey AND l.op <> 'error'
    WHERE NOT EXISTS (
      SELECT 1 FROM latest d WHERE d.user_id = c.c_custkey AND d.op = 'error'
    )
    ORDER BY c.c_custkey
    """,
)
def q141(spark: SparkSession, sf: str) -> DataFrame:
    """Time travel (streaming/apply.state_at): the customer table AS OF
    2024-01-15, reconstructed by applying only changes at or before the
    horizon — the snapshot+log pair is a multi-version table and any
    past state is one pushed-down filter away (q79 is the same merge at
    the present horizon)."""
    from cdc_init_spark.streaming.apply import state_at

    c = load_table(spark, sf, "customer")
    e = load_table(spark, sf, "events")
    changes = (
        e.filter(F.col("event_type").isin("signup", "purchase", "error"))
        .select(
            F.col("user_id").alias("c_custkey"),
            F.col("ts"),
            F.when(F.col("event_type") == "error", "delete")
            .otherwise("update")
            .alias("type"),
            F.lit(None).cast("string").alias("c_name"),
            F.lit(None).cast("int").alias("c_nationkey"),
            F.col("value").alias("c_acctbal"),
            F.lit(None).cast("string").alias("c_mktsegment"),
        )
        .join(c.select("c_custkey"), on="c_custkey", how="left_semi")
    )
    merged = state_at(c, changes, ["c_custkey"], "2024-01-15 00:00:00")
    return merged.select(
        "c_custkey", round_compat(F.col("c_acctbal"), 4).alias("acctbal")
    ).orderBy("c_custkey")


@query(
    "q142_snapshot_diff",
    oracle="""
    WITH latest AS (
      SELECT user_id,
             max_by(event_type, ts) AS op,
             max_by(value, ts) AS new_bal
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
      GROUP BY user_id
    )
    SELECT c.c_custkey,
           CASE WHEN l.op = 'error' THEN 'delete' ELSE 'update' END AS type,
           CASE WHEN l.op = 'error' THEN NULL
                ELSE ROUND(l.new_bal, 4) END AS acctbal
    FROM customer c JOIN latest l ON l.user_id = c.c_custkey
    ORDER BY c.c_custkey
    """,
)
def q142(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot diff — the INVERSE of CDC apply
    (streaming/apply.diff_snapshots): diffing the original customer
    snapshot against the q79-merged state recovers exactly the compacted
    change set (updates for non-error users, deletes for error users;
    untouched rows emit nothing). One PK-partitioned full-outer join
    with a null-safe struct comparison; change volume out is |delta|.
    The oracle derives the same delta directly from the event log."""
    from cdc_init_spark.streaming.apply import apply_changes, diff_snapshots

    c = load_table(spark, sf, "customer")
    e = load_table(spark, sf, "events")
    changes = (
        e.filter(F.col("event_type").isin("signup", "purchase", "error"))
        .select(
            F.col("user_id").alias("c_custkey"),
            F.col("ts"),
            F.when(F.col("event_type") == "error", "delete")
            .otherwise("update")
            .alias("type"),
            F.lit(None).cast("string").alias("c_name"),
            F.lit(None).cast("int").alias("c_nationkey"),
            F.col("value").alias("c_acctbal"),
            F.lit(None).cast("string").alias("c_mktsegment"),
        )
        .join(c.select("c_custkey"), on="c_custkey", how="left_semi")
    )
    new = apply_changes(c, changes, ["c_custkey"])
    d = diff_snapshots(c, new, ["c_custkey"])
    return d.select(
        "c_custkey",
        "type",
        round_compat(F.col("c_acctbal"), 4).alias("acctbal"),
    ).orderBy("c_custkey")


@query(
    "q148_histogram",
    oracle="""
    SELECT CAST(LEAST(FLOOR(o_totalprice / 25000), 23) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def q148(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-width histogram with FIXED bucket bounds (width 25 000,
    clamped to 24 buckets). Fixed bounds make it a single narrow map +
    one partial-aggregated shuffle of ≤24 groups — the one-pass shape
    you want at 100 TB (a data-driven min/max would force a second full
    scan; for that use approxQuantile on a sample, as the Z-order layout
    path does). min/max per bucket double as a bounds self-check."""
    o = load_table(spark, sf, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 25000), F.lit(23)).cast(
        "bigint"
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            round_compat(F.min("o_totalprice"), 2).alias("lo"),
            round_compat(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "q150_salted_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def q150(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe salted JOIN (operators.skew.salted_join) proven equal
    to the plain equi-join by the oracle: the fact side gets a
    deterministic per-row salt, the dim side is replicated n_salts×,
    and the join key becomes (key, salt) — a hot customer key that
    would serialize one reducer now spreads over 8. This is the
    join-side twin of q75's salted aggregation, for dims too large to
    broadcast but far smaller than the fact. AQE's skew-join split is
    the runtime alternative; salting is the planned one."""
    from cdc_init_spark.operators.skew import salted_join

    o = load_table(spark, sf, "orders").select("o_custkey", "o_totalprice")
    dim = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        salted_join(o, dim, on="o_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            round_compat(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q170_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT user_id, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY user_id
    ), dev AS (
      SELECT e.user_id, e.value, ABS(e.value - m.med) AS dev, m.med
      FROM events e JOIN med m ON e.user_id = m.user_id
    ), mad AS (
      SELECT user_id, quantile_cont(dev, 0.5) AS mad
      FROM dev GROUP BY user_id
    )
    SELECT d.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(MAX(d.med), 4) AS med,
           ROUND(MAX(m.mad), 4) AS mad,
           CAST(SUM(CASE WHEN d.dev > 3 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.user_id = m.user_id
    GROUP BY d.user_id
    ORDER BY d.user_id
    """,
)
def q170(spark: SparkSession, sf: str) -> DataFrame:
    """EXT robust stats: median-absolute-deviation outlier screen per
    user — the robust twin of q151's rolling z-score (a single wild
    value cannot poison its own threshold the way it inflates a
    stddev). Two exact-median aggregates (the interpolated percentile
    shared by Spark and DuckDB) on the SAME user_id key, so the second
    agg and both joins reuse one hash partitioning — one logical
    shuffle at scale; the flagged count uses the standard 3·1.4826·MAD
    (≈3σ-consistent) cut. Exact medians sort per group (documented q74
    trade; approx_percentile is the 100 TB swap-in)."""
    e = load_table(spark, sf, "events").select("user_id", "value")
    med = e.groupBy("user_id").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = e.join(med, "user_id").select(
        "user_id",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    mad = dev.groupBy("user_id").agg(
        F.percentile("dev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            round_compat(F.max("med"), 4).alias("med"),
            round_compat(F.max("mad"), 4).alias("mad"),
            F.sum(
                F.when(
                    F.col("dev") > F.lit(3.0) * F.lit(1.4826) * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("user_id")
    )


@query(
    "q175_grouped_ols",
    oracle="""
    WITH pts AS (
      SELECT user_id,
             (epoch(ts) - epoch(TIMESTAMP '2025-07-01')) / 86400.0 AS x,
             value AS y
      FROM events
    ), m AS (
      SELECT user_id,
             CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM pts GROUP BY user_id
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n,
           ROUND(sy / n, 4) AS level,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope_per_day,
           ROUND(pow(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
    FROM m ORDER BY user_id
    """,
)
def q175(spark: SparkSession, sf: str) -> DataFrame:
    """EXT stats: per-key ordinary least squares — value-vs-time slope,
    mean level and R² per user from EXPLICIT closed-form moments
    (n, Σx, Σy, Σx², Σy², Σxy): one partial-aggregable pass, one
    shuffle on user_id at any scale — the trend-detection primitive
    behind drift monitors and cohort burn-down fits.

    Numerics are part of the design, and three pitfalls were hit and
    fixed en route: (a) ``unix_timestamp`` TRUNCATES sub-second parts
    while DuckDB's ``epoch()`` keeps them — x itself differed until the
    fractional cast ("ts".cast(timestamp).cast(double)); (b) explicit
    moments written in the IDENTICAL operation order on both sides
    agree to ~1e-12 where opaque builtin regression aggregates need
    not; (c) the x axis is DAYS since 2025-07-01 (|x| ≲ 200) so the
    n·Σxy − Σx·Σy cancellation keeps its digits — raw epoch seconds
    (~1e9) lose the slope entirely. 4 dp rounding then has orders of
    magnitude of margin (verified hash-exact at sf0.01 AND sf0.1)."""
    e = load_table(spark, sf, "events").select(
        "user_id",
        # cast("double") keeps the fractional seconds; unix_timestamp
        # truncates them and silently diverges from DuckDB's epoch()
        (
            (
                F.col("ts").cast("timestamp").cast("double")
                - F.to_timestamp(F.lit("2025-07-01 00:00:00")).cast("double")
            )
            / F.lit(86400.0)
        ).alias("x"),
        F.col("value").alias("y"),
    )
    m = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        round_compat(F.col("sy") / F.col("n"), 4).alias("level"),
        round_compat(num / dx, 4).alias("slope_per_day"),
        round_compat(F.pow(num, F.lit(2.0)) / (dx * dy), 4).alias("r2"),
    ).orderBy("user_id")


@query(
    "q178_decimal_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                    * CAST(l_discount AS DECIMAL(5,3))) AS DOUBLE) AS sum_disc_amt,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q178(spark: SparkSession, sf: str) -> DataFrame:
    """EXT types: exact fixed-point aggregation — prices cast to
    DECIMAL(14,2), discount to DECIMAL(5,3), summed and cross-multiplied
    per flag. Decimal arithmetic is the money-correct path double
    aggregation only approximates: both engines compute the identical
    scaled integers, so the match is EXACT — the final cast to DOUBLE
    exists only for the comparison layer (pandas renders DECIMAL as
    object), and the scaled-integer totals (≲1e13) sit far inside
    double's 2^53 exact range, so no precision is lost in the cast. Partial-aggregable, one shuffle, integer math end to end."""
    l = load_table(spark, sf, "lineitem")
    return (
        l.select(
            "l_returnflag",
            F.col("l_extendedprice").cast("decimal(14,2)").alias("p"),
            F.col("l_discount").cast("decimal(5,3)").alias("d"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum("p").cast("double").alias("sum_price"),
            F.sum(F.col("p") * F.col("d")).cast("double").alias("sum_disc_amt"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("l_returnflag")
    )
