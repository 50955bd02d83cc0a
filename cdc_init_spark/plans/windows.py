"""Window-function corpus (SURVEY §2.2 B-V, §2.3 Q30-Q33).

Each window spec shuffles once on its partition key and sorts within
partitions — at 100 TB the partition key choice (user_id / custkey) keeps
state bounded per task; no global sort is ever required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_init_spark.functions.compat import round_compat
from cdc_init_spark.plans import query
from cdc_init_spark.tables import load_table


@query(
    "q30_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def q30(spark: SparkSession, sf: str) -> DataFrame:
    """W1: rank/dense_rank. Rank values are tie-stable (equal inputs get
    equal ranks), so the output is deterministic without a tiebreaker."""
    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "q31_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts) AS next_value
    FROM events ORDER BY event_id
    """,
)
def q31(spark: SparkSession, sf: str) -> DataFrame:
    """W2: lag/lead per user ordered by event time (per-user ts unique in
    fixtures, so the order is total)."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "q32_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def q32(spark: SparkSession, sf: str) -> DataFrame:
    """W3: running frame aggregate — the reference's running seeded-counter
    (A22, core.clj:167-175) generalized to a window prefix sum."""
    o = load_table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        round_compat(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "q33_ntile_pctrank",
    oracle="""
    SELECT p_partkey,
           NTILE(4) OVER (ORDER BY p_retailprice, p_partkey) AS quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY p_retailprice), 4) AS pr,
           ROUND(CUME_DIST() OVER (ORDER BY p_retailprice), 4) AS cd
    FROM part ORDER BY p_partkey
    """,
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    """W4: ntile/percent_rank/cume_dist. ntile ordering carries a p_partkey
    tiebreaker (ntile assignment under ties is otherwise order-dependent);
    percent_rank/cume_dist are tie-stable by definition.

    Scale note: a GLOBAL ntile/percent_rank is a global total order by
    definition — one sort task however big the input. This is the exact,
    oracle-checkable member of the family; at 100 TB the same question is
    answered by the rank/quantile sketches (q74_approx_percentiles,
    q182_approx's KLL grid), trading exactness for a bounded rank error."""
    p = load_table(spark, sf, "part")
    w_tb = Window.orderBy("p_retailprice", "p_partkey")
    w = Window.orderBy("p_retailprice")
    return p.select(
        "p_partkey",
        F.ntile(4).over(w_tb).alias("quartile"),
        round_compat(F.percent_rank().over(w), 4).alias("pr"),
        round_compat(F.cume_dist().over(w), 4).alias("cd"),
    )


@query(
    "q34_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS orders_30d
    FROM orders ORDER BY o_orderkey
    """,
)
def q34(spark: SparkSession, sf: str) -> DataFrame:
    """W5: range frame — trailing 30-day order count per customer (range
    over epoch seconds; 2592000 s = 30 days)."""
    o = load_table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_orderkey", "o_custkey", F.count(F.lit(1)).over(w).alias("orders_30d")
    )
