"""Storage layout for scale: partitioned + sorted writes, bucketing.

At 100 TB the write layout IS the query optimization:
- partition directories on low-cardinality filter keys → partition pruning
  (the scan never lists irrelevant directories);
- within-file sort on range-filter keys → parquet row-group min/max
  statistics skip pages;
- bucketing on join keys → co-located joins with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_within_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet, optionally sorted within partitions
    (sortWithinPartitions keeps the sort shuffle-free per task)."""
    out = df
    if sort_within_by:
        out = out.repartition(*[df[c] for c in partition_by]).sortWithinPartitions(
            *sort_within_by
        )
    out.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (bucketing requires saveAsTable — the bucket
    metadata lives in the catalog). Two tables bucketed identically on
    their join key join WITHOUT a shuffle on either side."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table_name)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Partition columns come back from directory names; filters on them
    prune at planning time (check PartitionFilters in the scan node)."""
    return spark.read.parquet(path)
