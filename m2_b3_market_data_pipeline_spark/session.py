"""SparkSession factory with scale-aware defaults.

The reference runs single-process pandas inside one Glue container
(reference: etl/etl_job.py:8-10, scripts/bootstrap_aws.sh:42-43) so it has
no notion of parallelism, shuffle, or adaptivity. Here every knob is set
for a real cluster and merely *exercised* on local[N]:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy switching all matter at 100 TB.
- Arrow on: any Pandas-UDF path is Arrow-batched, never row-at-a-time.
- shuffle partitions default to the local core count; on a real cluster
  AQE coalesces from a deliberately-high initial number.
- Dynamic partition overwrite: replaces only the partitions a batch
  touches (the reference overwrites one (ativo, data) Hive partition per
  run, etl/etl_job.py:152).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def local_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def get_spark(
    app_name: str = "m2-b3-market-data-pipeline-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with cluster-shaped defaults."""
    cpus = local_cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS); Spark has no nanos type,
        # so read as long and convert in sources (values are µs-aligned).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Stateful streaming ops (dropDuplicates, stream-stream joins,
        # windowed aggs) default to RocksDB state: the in-heap HDFS-backed
        # store keeps EVERY key in executor heap, which a 100 TB
        # deployment's join/dedup state will not fit — RocksDB spills to
        # native memory + local disk and bounds heap by block cache.
        # The custom sinks (streaming/*_sink.py) own their parquet state
        # and are unaffected. NOTE: an existing checkpoint pins the
        # provider it was created with — Spark refuses a provider switch
        # mid-checkpoint; new checkpoints pick this up (SCALE.md §23).
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
