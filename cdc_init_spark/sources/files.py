"""File + JDBC source readers (SURVEY §2.2 S1-S3).

Schema-explicit by policy: inference is a full extra pass over the data
and non-deterministic under dirty input — at 100 TB neither is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S1: columnar scan; predicate/column pushdown via Catalyst."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    mode: str = "FAILFAST",
    **options: str,
) -> DataFrame:
    """S2: CSV with an explicit schema. FAILFAST by default — corrupt rows
    should stop a pipeline, not silently null out (use PERMISSIVE +
    columnNameOfCorruptRecord for quarantine flows)."""
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), mode=mode, **options)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "FAILFAST",
    **options: str,
) -> DataFrame:
    """S2: JSON-lines with an explicit schema (no inference pass)."""
    return spark.read.schema(schema).options(mode=mode, **options).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """S1 twin: ORC columnar scan — same pushdown/pruning properties as
    parquet via the native vectorized reader."""
    return spark.read.orc(path)


def read_text(
    spark: SparkSession, path: str, whole: bool = False
) -> DataFrame:
    """S2 twin: raw text — one row per line (``value STRING``), or one
    row per file with ``whole=True`` (document-corpus ingestion shape;
    pair with ``input_file_name()`` for provenance)."""
    from pyspark.sql import functions as F

    df = spark.read.option("wholetext", str(whole).lower()).text(path)
    return df.withColumn("source_file", F.input_file_name())


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    fetch_size: int = 10_000,
    **options: str,
) -> DataFrame:
    """S3: partitioned JDBC snapshot scan — the reference's seed-view
    full scan (seed_store.clj:107-110) generalized: ``num_partitions``
    concurrent range queries instead of one cursor, with bounded
    ``fetchsize`` per cursor (the reference streams row-at-a-time for the
    same reason — bounded memory, seed_store.clj:57-81).

    ``partition_column`` should be an indexed, roughly uniform numeric
    column (a synthetic ``ora_hash``/``mod`` expression works too). Skewed
    bounds → skewed tasks; compute real min/max first."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetch_size))
        .options(**options)
        .load()
    )
