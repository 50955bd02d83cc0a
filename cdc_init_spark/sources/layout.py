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


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    approx: bool = False,
    relative_error: float = 0.001,
):
    """Z-order (Morton) interleave key over ``cols`` as a Column.

    Each column is rank-normalized to ``bits`` bits — rank-based rather
    than min/max-linear so skewed distributions still fill the key space
    evenly — then the bit planes are interleaved with shifts/ORs (pure
    integer expressions, whole-stage codegen; no UDF).

    Two rank forms:
    - exact (default): percent_rank — one global-sort window per column.
      Deterministic; right for tests and moderate inputs.
    - ``approx=True``: the 100 TB path — per-column quantile boundaries
      from a Greenwald-Khanna sketch (``approxQuantile``: one scan, no
      global sort, driver gets 2^bits-1 floats), each value ranked by
      its histogram cell. Use small ``bits`` here (8-10: 256-1024 cells
      per dimension — ample when cells ≫ output files); the interleave
      math is identical."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    mx = (1 << bits) - 1
    ranked = df
    rank_cols = []
    for c in cols:
        rc = f"_zr_{c}"
        if approx:
            probs = [i / (mx + 1) for i in range(1, mx + 1)]
            bounds = df.stat.approxQuantile(c, probs, relative_error)
            barr = F.array(*[F.lit(float(b)) for b in bounds])
            cell = F.size(
                F.filter(barr, lambda b: b <= F.col(c).cast("double"))
            ).cast("bigint")
            ranked = ranked.withColumn(rc, F.least(F.lit(mx), cell))
        else:
            ranked = ranked.withColumn(
                rc,
                F.least(
                    F.lit(mx),
                    (
                        F.percent_rank().over(Window.orderBy(F.col(c)))
                        * F.lit(float(mx))
                    ).cast("bigint"),
                ),
            )
        rank_cols.append(rc)
    n = len(cols)
    z = F.lit(0).cast("bigint")
    for bit in range(bits):
        for i, rc in enumerate(rank_cols):
            plane = F.shiftright(F.col(rc), bit).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(plane.cast("bigint"), bit * n + i)
            )
    return ranked, z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    n_files: int = 32,
    bits: int = 16,
    mode: str = "overwrite",
    approx: bool = False,
) -> None:
    """Parquet clustered on the Z-order curve of ``zorder_by``: range-
    partition + sort by the interleaved key, so each output file covers a
    small hyper-rectangle of the key space and parquet min/max statistics
    skip files/row-groups for range filters on ANY prefix-free subset of
    the columns — the multi-dimensional analog of a single-column sort
    (a plain sort skips only on the leading column). The key is dropped
    before writing; it exists to drive the clustering."""
    ranked, z = zorder_key(df, zorder_by, bits, approx=approx)
    (
        ranked.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_zr_{c}" for c in zorder_by])
        .write.mode(mode)
        .parquet(path)
    )


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 128,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-file compaction — the OPTIMIZE maintenance pass a 100 TB
    lake needs after streaming/incremental writes (thousands of KB-size
    files per partition destroy scan throughput: each file costs a task,
    a footer read, and a seek). Rewrites ``path`` into
    ``ceil(bytes / target_file_mb)`` files at ``out_path`` and returns
    the file count.

    Sizing reads the FILESYSTEM byte size (not a row sample) so the
    target is hit regardless of schema; ``repartition(n)`` round-robins
    rows evenly across output files, an optional within-file sort
    restores min/max skipping. Rewrite-to-new-path + swap is the
    idempotent deployment pattern (never compact in place).

    Byte sizing goes through the Hadoop FileSystem API, so any URI the
    Spark session can read (file://, s3a://, hdfs://, …) sizes correctly
    — an os.walk over the path string would silently report 0 bytes for
    remote URIs and compact everything into one file (ADVICE r2). A path
    with no data bytes raises instead of defaulting to n_files=1."""
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)  # recursive; data files only
    total = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        # skip commit-protocol metadata (_SUCCESS, ._committed, .crc)
        if not name.startswith(("_", ".")):
            total += st.getLen()
    if total == 0:
        raise ValueError(
            f"compact_small_files: no data bytes found under {path!r} — "
            "refusing to guess an output file count"
        )
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(out_path)
    return n_files
