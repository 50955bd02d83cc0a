"""Scalar-function corpus (SURVEY §2.2 B-VIII, §2.3 Q45-Q52).

All built-in pyspark.sql.functions — JVM-side, inside whole-stage codegen.
One canonical query per family; the DuckDB oracle mirrors each expression
in its own dialect (dialect shims noted inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_init_spark.functions.compat import round_compat
from cdc_init_spark.plans import query
from cdc_init_spark.tables import load_table


@query(
    "q45_string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lname,
           upper(p_brand) AS ubrand,
           substr(p_name, 1, 5) AS prefix5,
           length(p_name) AS name_len,
           concat(p_brand, '#', p_type) AS brand_type,
           trim(concat('  ', p_name, '  ')) AS trimmed,
           replace(p_name, ' ', '_') AS snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size
    FROM part ORDER BY p_partkey
    """,
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    """F1: string family (reference A19 lower-casing seed_store.clj:70,
    A26 identifier algebra sql/util.clj:8-46)."""
    p = load_table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.substring("p_name", 1, 5).alias("prefix5"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
    )


@query(
    "q46_regex_funcs",
    oracle="""
    SELECT p_partkey,
           coalesce(regexp_extract(p_name, '([a-z]+)$', 1), '') AS last_word,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
           regexp_matches(p_type, '^ECO') AS is_eco
    FROM part ORDER BY p_partkey
    """,
)
def q46(spark: SparkSession, sf: str) -> DataFrame:
    """F2: regex family (reference A26, sql/util.clj:8-15). DuckDB shims:
    regexp_replace needs the 'g' flag to match Spark's replace-all;
    RLIKE maps to regexp_matches."""
    p = load_table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        F.col("p_type").rlike("^ECO").alias("is_eco"),
    )


@query(
    "q47_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_date
    FROM orders ORDER BY o_orderkey
    """,
)
def q47(spark: SparkSession, sf: str) -> DataFrame:
    """F3: date/time family (reference A24 timestamping core.clj:20;
    ISO-8601 wire format seed_store_test.clj:62). Timestamps exit as
    formatted strings per the §2.3.0 normalization rules."""
    o = load_table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").alias(
            "month_start"
        ),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).cast("bigint").alias(
            "days_since"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
    )


@query(
    "q48_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS rounded,
           CAST(floor(l_extendedprice) AS BIGINT) AS floored,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ceiled,
           abs(l_discount - 0.05) AS abs_disc,
           round(power(l_quantity, 2), 4) AS qty_sq,
           l_orderkey % 7 AS mod7,
           CAST(sign(l_discount - 0.05) AS BIGINT) AS sgn,
           round(sqrt(l_quantity), 4) AS qty_sqrt
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def q48(spark: SparkSession, sf: str) -> DataFrame:
    """F4: math family (reference A15 backoff math topic_store.clj:21-27,
    A22 threshold arithmetic core.clj:164)."""
    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round_compat(F.col("l_extendedprice"), 1).alias("rounded"),
        F.floor("l_extendedprice").alias("floored"),
        F.ceil("l_extendedprice").alias("ceiled"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        round_compat(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("sgn"),
        round_compat(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
    )


@query(
    "q49_array_funcs",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_words,
           array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_words,
           list_contains(string_split(p_name, ' '), 'red') AS has_red,
           string_split(p_name, ' ')[1] AS first_word
    FROM part ORDER BY p_partkey
    """,
)
def q49(spark: SparkSession, sf: str) -> DataFrame:
    """F5: array family (reference A20 flatten+sort, seed_store.clj:54).
    DuckDB lists are 1-indexed; Spark element_at(…, 1) matches."""
    p = load_table(spark, sf, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(words).cast("bigint").alias("n_words"),
        F.array_join(F.sort_array(words), ",").alias("sorted_words"),
        F.array_contains(words, "red").alias("has_red"),
        F.element_at(words, 1).alias("first_word"),
    )


@query(
    "q49_explode",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
    FROM part ORDER BY p_partkey, word
    """,
)
def q49_explode(spark: SparkSession, sf: str) -> DataFrame:
    """F5 twin: explode (UDTF-shaped row expansion, X4 surface)."""
    p = load_table(spark, sf, "part")
    return p.select(
        "p_partkey", F.explode(F.split(F.col("p_name"), " ")).alias("word")
    )


@query(
    "q50_map_funcs",
    oracle="""
    SELECT p_partkey,
           p_brand AS brand_val,
           p_type AS type_val,
           'brand,type' AS keys_joined
    FROM part ORDER BY p_partkey
    """,
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    """F6: map family (reference A19 row-as-map, seed_store.clj:42-47).
    Builds a map from arrays and reads it back; the oracle verifies the
    round-trip reproduces the source values."""
    p = load_table(spark, sf, "part")
    m = F.map_from_arrays(
        F.array(F.lit("brand"), F.lit("type")), F.array(F.col("p_brand"), F.col("p_type"))
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_val"),
        F.element_at(m, "type").alias("type_val"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_joined"),
    )


@query(
    "q51_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(o.event_id AS VARCHAR) AS id_str
    FROM events o ORDER BY event_id
    """,
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    """F7: JSON family (reference A5/A20 Cheshire encode/decode,
    seed_store.clj:50-55). get_json_object extracts from the props blob;
    to_json round-trips are covered by the snapshot golden tests."""
    e = load_table(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.col("event_id").cast("string").alias("id_str"),
    )


@query(
    "q52_null_funcs",
    oracle="""
    SELECT event_id,
           coalesce(nullif(props, ''), '<empty>') AS props_or_default,
           greatest(value, 0.5) AS g,
           least(value, 0.5) AS l,
           (props IS NOT DISTINCT FROM NULL) AS props_null_safe
    FROM events ORDER BY event_id
    """,
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    """F8: conditional/null family + null-safe equality (P5 surface)."""
    e = load_table(spark, sf, "events")
    return e.select(
        "event_id",
        F.coalesce(F.nullif(F.col("props"), F.lit("")), F.lit("<empty>")).alias(
            "props_or_default"
        ),
        F.greatest(F.col("value"), F.lit(0.5)).alias("g"),
        F.least(F.col("value"), F.lit(0.5)).alias("l"),
        F.col("props").eqNullSafe(F.lit(None).cast("string")).alias("props_null_safe"),
    )


@query(
    "q136_variant_extract",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events WHERE props IS NOT NULL AND props <> ''
    GROUP BY event_type ORDER BY event_type
    """,
)
def q136(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 VARIANT path (the successor to get_json_object for
    semi-structured columns): parse_json → a binary-encoded VARIANT that
    is parsed ONCE at scan time, then variant_get extracts typed fields
    without re-parsing per expression — at 100 TB the difference between
    one parse and one-per-extraction. Aggregated per event type; the
    oracle replays the same extraction with DuckDB's JSON path."""
    e = load_table(spark, sf, "events")
    v = e.filter(F.col("props").isNotNull() & (F.col("props") != "")).select(
        "event_type", F.parse_json("props").alias("_v")
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.variant_get("_v", "$.k", "int")).cast("bigint").alias("sum_k"),
        )
        .orderBy("event_type")
    )
