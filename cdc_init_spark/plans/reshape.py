"""Reshaping operators: pivot / unpivot, and the SQL-frontend entry form
(engine completeness beyond SURVEY §2.2's B-groups — a user of a general
analytics engine expects these; each oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_init_spark.plans import query
from cdc_init_spark.tables import load_table, register_views


@query(
    "q76_pivot",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
           COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
           COUNT(*) FILTER (o_orderpriority = '5-LOW') AS low
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: long → wide with an explicit value list (explicit values
    keep it a single pass — value-list discovery would add a job; at
    100 TB always pass the list). Compiles to conditional aggregation,
    exactly the oracle's FILTER form."""
    o = load_table(spark, sf, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "3-MEDIUM", "5-LOW"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderstatus",
            F.coalesce("1-URGENT", F.lit(0)).alias("urgent"),
            F.coalesce("3-MEDIUM", F.lit(0)).alias("medium"),
            F.coalesce("5-LOW", F.lit(0)).alias("low"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q77_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    ORDER BY c_custkey, metric
    """,
)
def q77(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot (melt): wide → long via the native unpivot operator (a
    generator expansion — no shuffle)."""
    c = load_table(spark, sf, "customer")
    return (
        c.select(
            "c_custkey",
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_nationkey").cast("double").alias("nationkey"),
        )
        .unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")
        .orderBy("c_custkey", "metric")
    )


@query(
    "q78_sql_cte",
    oracle="""
    WITH big_cust AS (
      SELECT o_custkey, SUM(o_totalprice) AS spend
      FROM orders GROUP BY o_custkey HAVING SUM(o_totalprice) > 500000
    )
    SELECT c.c_mktsegment, COUNT(*) AS n_big
    FROM customer c JOIN big_cust b ON c.c_custkey = b.o_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)
def q78(spark: SparkSession, sf: str) -> DataFrame:
    """The SQL frontend entry form: the same engine surface exposed via
    spark.sql over registered views (CTE + join + agg). Catalyst plans it
    identically to the DataFrame form — this entry pins that the SQL door
    is open and correct."""
    register_views(spark, sf)
    return spark.sql(
        """
        WITH big_cust AS (
          SELECT o_custkey, SUM(o_totalprice) AS spend
          FROM orders GROUP BY o_custkey HAVING SUM(o_totalprice) > 500000
        )
        SELECT c.c_mktsegment, COUNT(*) AS n_big
        FROM customer c JOIN big_cust b ON c.c_custkey = b.o_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
        """
    )


@query(
    "q146_recursive_cte",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
             CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
      FROM orders
    ), months(m, hi) AS (
      SELECT lo, hi FROM bounds
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi FROM months WHERE m < hi
    )
    SELECT CAST(mo.m AS TIMESTAMP) AS month, COUNT(o.o_orderkey) AS n_orders
    FROM months mo
    LEFT JOIN orders o ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = mo.m
    GROUP BY mo.m ORDER BY mo.m
    """,
)
def q146(spark: SparkSession, sf: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): build a complete month
    spine from the data's own bounds, then LEFT JOIN order counts onto
    it — months with zero orders survive, which no plain GROUP BY can
    produce. The recursion depth is |months| (~80 for the 7-year TPC-H
    range), far under spark.sql.cteRecursionLevelLimit (100 default;
    bounded recursion is the scale contract — the spine is tiny and
    broadcast to the fact join, so the single wide stage is the count
    aggregate). Oracle: the identical WITH RECURSIVE in DuckDB."""
    register_views(spark, sf)
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
          SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
                 CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
          FROM orders
        ), months(m, hi) AS (
          SELECT lo, hi FROM bounds
          UNION ALL
          SELECT CAST(m + INTERVAL '1' MONTH AS DATE), hi
          FROM months WHERE m < hi
        )
        SELECT CAST(mo.m AS TIMESTAMP) AS month, COUNT(o.o_orderkey) AS n_orders
        FROM months mo
        LEFT JOIN orders o
          ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = mo.m
        GROUP BY mo.m ORDER BY mo.m
        """
    )
