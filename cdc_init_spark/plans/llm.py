"""LLM-data-pipeline corpus (SURVEY §2.2 B-XI, §2.3 Q60-Q62).

SQL-expressible members of the extension surface: exact dedup, brute-force
cosine top-k, text stats. The non-SQL members (MinHash/LSH, SimHash,
fingerprinting, multimodal) live in cdc_init_spark.operators.* and register
rows-only corpus entries from there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_init_spark.functions.vectors import cosine_similarity
from cdc_init_spark.functions.compat import round_compat
from cdc_init_spark.plans import query
from cdc_init_spark.tables import load_table


@query(
    "q60_exact_dedup_count",
    oracle="""
    SELECT COUNT(*) AS n FROM (SELECT DISTINCT text FROM documents) t
    """,
)
def q60(spark: SparkSession, sf: str) -> DataFrame:
    """L1: exact-dedup cardinality. At 100 TB you dedup on a content hash
    (64-char digest), not the full text, so the shuffle carries ~100 bytes
    per row — the operators.dedup module does exactly that; counting
    DISTINCT hash == DISTINCT text modulo collisions."""
    d = load_table(spark, sf, "documents")
    return d.select("text").distinct().agg(F.count(F.lit(1)).alias("n"))


@query(
    "q60_exact_dedup_keep",
    oracle="""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
    FROM documents GROUP BY text ORDER BY keep_id
    """,
)
def q60_keep(spark: SparkSession, sf: str) -> DataFrame:
    """L1 twin: canonical-representative selection per content group
    (deterministic: min doc_id)."""
    d = load_table(spark, sf, "documents")
    return (
        d.groupBy("text")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("keep_id", "n_dups")
        .orderBy("keep_id")
    )


@query(
    "q61_cosine_topk",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 1
    )
    SELECT e.vec_id,
           ROUND(
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) /
             (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[]))) *
              sqrt(list_dot_product(q.qe, q.qe))), 4) AS score
    FROM embeddings e, q
    WHERE e.vec_id <> 1
    ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) /
             (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[]))) *
              sqrt(list_dot_product(q.qe, q.qe))) DESC,
             e.vec_id
    LIMIT 5
    """,
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    """L3: brute-force cosine top-k for one query vector. The query vector
    joins as a broadcast literal (no shuffle); per-partition top-k merge via
    TakeOrderedAndProject. Double-precision math on both engines, summed in
    array order, so scores are bit-identical. operators.similarity holds the
    many-query and LSH-bucketed variants."""
    e = load_table(spark, sf, "embeddings")
    qvec = F.broadcast(
        e.filter(F.col("vec_id") == 1).select(F.col("embedding").alias("qe"))
    )
    scored = (
        e.filter(F.col("vec_id") != 1)
        .crossJoin(qvec)
        .select(
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("qe")).alias("_raw"),
        )
    )
    return (
        scored.orderBy(F.col("_raw").desc(), "vec_id")
        .limit(5)
        .select("vec_id", round_compat(F.col("_raw"), 4).alias("score"))
    )


@query(
    "q62_text_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 2) AS avg_chars,
           ROUND(AVG(len(string_split(text, ' '))), 2) AS avg_words
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    """L4: per-language corpus stats — whitespace token counts stay
    JVM-side (split+size), no Python in the loop."""
    d = load_table(spark, sf, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            round_compat(F.avg("n_chars"), 2).alias("avg_chars"),
            round_compat(F.avg(F.size(F.split(F.col("text"), " "))), 2).alias("avg_words"),
        )
        .orderBy("lang")
    )
