"""SparkSession construction with engine defaults.

The reference needs a Byte Buddy agent to mock a Cassandra node's environment
(CassandraAgent.java:15-199, SURVEY.md §2.1 M5); the Spark analog is just a
well-configured SparkSession. Defaults below are chosen for the 100 TB target:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
Arrow on (vectorized Python interop), UTC session time, and nanos-as-long so
parquet TIMESTAMP(NANOS) sources are readable (Spark's TimestampType is
micros; the scan layer converts, see sources/scan.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Engine configuration applied to every session. Values are strings per
#: SparkConf convention. Sizing notes for scale:
#:  - shuffle.partitions: on a real cluster set ~2-3x total cores or rely on
#:    AQE coalescing from a high initial value; locally the env var
#:    SPARK_GRAFT_CPUS drives it.
#:  - maxPartitionBytes 128m: keeps scan tasks memory-bounded at 100 TB
#:    (~800k tasks — fine for a 1000-executor cluster, and AQE coalesces).
ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # let Python DataSources (sources/sstable.py) receive Catalyst filters
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": "67108864",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
}


def configure_builder(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Apply engine defaults to an existing builder (driver-owned sessions)."""
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    return builder


def get_spark(app_name: str = "cassandra-ttl-remover-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Locally runs on ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``); on a
    cluster, pass ``master=None`` with externally-provided conf and only the
    SQL-level settings here apply.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)
    builder = SparkSession.builder.appName(app_name).master(master)
    builder = configure_builder(builder)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = builder.config("spark.ui.enabled", "false")
    return builder.getOrCreate()
