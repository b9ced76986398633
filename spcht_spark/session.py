"""SparkSession factory.

Local-mode sandbox (single JVM, N threads), but every config here is
chosen to survive a multi-executor cluster: AQE on (runtime skew-join +
partition coalescing), Arrow on (all Python UDFs are vectorized), shuffle
partitions sized to parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spcht_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores. Shuffle
    partitions default to ``cores`` — on a real cluster this would be
    2-3x total executor cores; AQE coalesces the excess either way.
    """
    # Arrow's default jemalloc pool madvises huge pages, which on this
    # memcg-accounted VM turns first-touch page faults into a kernel-CPU
    # storm (measured 3× slower tokenize). mimalloc avoids it. Must be
    # set before the JVM (and its python workers) start.
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "mimalloc")
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = cores
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # local mode: driver heap IS executor memory; undersizing it
        # turns cached/checkpointed intermediates into GC storms (a 24g
        # heap made a 48k-doc build 3x slower at 8 cores than at 2)
        .config("spark.driver.memory", os.environ.get("SPCHT_SPARK_DRIVER_MEM", "64g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
