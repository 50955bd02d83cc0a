"""SparkSession factory.

One place to set every engine-level config so local tests and the bench run
with the same semantics. Scale notes (100 TB / 1000-executor design intent):

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic broadcast decisions are the first line of defense at scale.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; AQE
  coalesces down. On a real cluster this would be set to ~2-3x total cores.
- Session timezone pinned to UTC so timestamp rendering is deterministic and
  matches the reference's ISO-8601/UTC wire format
  (reference: components/seed_store.clj:54-55, seed_store_test.clj:62).
- Arrow enabled: every pandas-UDF operator (similarity, multimodal) moves
  batches over Arrow, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cdc-init-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count — at tiny local
    scale factors AQE coalesces most of them away anyway.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Scan split size, env-tunable. Default 16 MB here vs Spark's
        # 128 MB: the local bench profile reads ~100-200 MB tables, and
        # 128 MB splits hand a 3-task scan to every broadcast-join probe
        # side — compute-dense operators (self-join pair generation,
        # shingling, per-row codecs) then run at 3/32 of the machine.
        # AQE coalesces by shuffle SIZE, so it never widens a narrow
        # scan-side stage; the split size is the only lever. On a real
        # 100 TB cluster leave the default (set the env to 134217728):
        # there the scan has thousands of splits regardless and larger
        # files amortize task startup.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Join strategy (guide §3.1/§9): allow shuffled-hash instead of
        # sort-merge when the per-partition build side fits — removes two
        # sorts per join. Production risk is a build-side OOM on a giant
        # partition; bounded here by AQE's local-map threshold (same 64 MB
        # as the broadcast threshold) and revertible via env.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP", str(64 * 1024 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
