"""Event-time corpus — batch-emulable forms of the streaming window
operators (SURVEY §2.2 B-IX T2-T4, §2.3 Q55-Q57).

The streaming variants (watermarks, append-mode emission) live in
cdc_init_spark.streaming.windows; these batch twins pin the window
*semantics* against the DuckDB oracle, which is what makes the streaming
tests meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_init_spark.functions.compat import round_compat
from cdc_init_spark.plans import query
from cdc_init_spark.tables import load_table


@query(
    "q55_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q55(spark: SparkSession, sf: str) -> DataFrame:
    """T2 batch form: tumbling 1h window agg via F.window — the same
    expression Structured Streaming uses, so batch and stream share one
    semantic. Window start is emitted as a formatted string (§2.3.0)."""
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_compat(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("h"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("h", "event_type")
    )


@query(
    "q56_sliding_window",
    oracle="""
    WITH slid AS (
      SELECT time_bucket(INTERVAL 15 MINUTE, e.ts)
               - k.k * INTERVAL 15 MINUTE AS w_start,
             e.value
      FROM events e
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
    )
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM slid GROUP BY 1 ORDER BY 1
    """,
)
def q56(spark: SparkSession, sf: str) -> DataFrame:
    """T3 batch form: sliding 1h window every 15min via F.window(ts, 1h,
    15m). Each event lands in 4 windows; the DuckDB oracle materializes the
    same assignment with an explicit offset cross join (15-min buckets are
    epoch-aligned in both engines)."""
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_compat(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w"),
            "n",
            "sum_value",
        )
        .orderBy("w")
    )


@query(
    "q57_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    """T4 batch form: 30-min-gap sessionization via F.session_window —
    cross-checked against the classic gaps-and-islands SQL in DuckDB.
    Session end is excluded (Spark defines end = last_ts + gap)."""
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
