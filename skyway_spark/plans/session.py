"""SparkSession factory with scale-oriented defaults.

Single place where engine-wide configs live so tests, bench and
spark-submit jobs all run with identical semantics. Designed for a
multi-executor cluster; in this sandbox it runs on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the 100 TB design point, scaled down by the
# caller for local runs:
#  - AQE on: runtime coalescing of shuffle partitions + skew-join
#    splitting is the backstop behind our explicit hot-cell salting.
#  - Arrow on + large batches: every Python-side op is a vectorized
#    pandas UDF; batch size amortizes the Arrow transfer.
#  - shuffle.partitions: callers override per cluster size; the value
#    here targets local[32] on sf0.1.
_BASE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    # Throughput-oriented GC: this engine is a batch pipeline
    # (allocation-heavy string/row churn, no latency SLO); ParallelGC
    # measurably beats G1 here both in wall time and in multi-core
    # scaling (GC work itself parallelizes with the task threads).
    "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
    "spark.executor.extraJavaOptions": "-XX:+UseParallelGC",
}


def spread(df, target: int | None = None):
    """Rebalance a parallelism-starved scan before expression-heavy
    narrow stages.

    At the 100 TB design point a scan yields thousands of splits and
    this is a no-op. Dev/bench inputs are often a single small parquet
    file (1-3 row groups -> 1-3 tasks), which strands the other N-29
    cores through every downstream narrow stage; one cheap round-robin
    shuffle of the (small) input fixes that. Only fires when the scan
    has fewer partitions than the session's parallelism."""
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(
    app_name: str = "skyway_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus=None`` respects an existing session / spark-submit master;
    an explicit value forces ``local[cpus]`` (used by the scaling
    bench to compare local[8] vs local[32]).
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    builder = SparkSession.builder.appName(app_name)
    if cpus is not None:
        builder = builder.master(f"local[{cpus}]")
    conf = dict(_BASE_CONF)
    if shuffle_partitions is None:
        shuffle_partitions = cpus if cpus else 32
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
