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
    # glibc (numpy/pandas buffers) has the same disease, much worse: any
    # allocation over M_MMAP_THRESHOLD is mmap'd fresh and munmap'd on
    # free, so EVERY big numpy temp re-faults its pages — measured
    # ~1 ms/page here, i.e. 38 s to multiply an 18M-element array.
    # Raising the mmap/trim thresholds keeps big buffers on the reused
    # heap: first batch pays the faults once, the rest run at memory
    # speed (0.06 s for the same multiply). Env vars cover the python
    # WORKER processes (they read them at startup); mallopt below covers
    # THIS process, whose glibc already started.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 32))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 32))
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(ctypes.c_int(-3), ctypes.c_int(1 << 30))  # M_MMAP_THRESHOLD
        libc.mallopt(ctypes.c_int(-1), ctypes.c_int(1 << 30))  # M_TRIM_THRESHOLD
    except Exception:  # noqa: BLE001 — non-glibc platforms: tunables are moot
        pass
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
        # 2048, not the 10000 default-ish value used previously: large
        # Arrow batches make every UDF allocation proportionally large,
        # and on this memcg-accounted VM big fresh allocations hit a
        # superlinear page-fault cliff (measured: the SAME tokenize job
        # over 384k docs ran 260 s at batch 10000 vs 52 s at batch 2048
        # on 8 pinned cores, and 2→8-core scaling went from negative to
        # 0.8+). Smaller batches also bound worker memory for wide rows.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # Dense small-corpus parquet (hundreds of MB in a handful of
        # row groups) coalesces to fewer splits than cores at the 128m
        # default, starving every scan-rooted stage of tasks (measured:
        # a 243 MB corpus read as ~4 splits → tokenize ran 4 tasks on 8
        # cores). Finer splits cost nothing at 100 TB — scans there
        # have orders of magnitude more splits than cores either way.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # v2 commit: tasks move outputs to the final dir at task commit;
        # job commit is O(1) instead of a sequential driver-side rename
        # of every part file. Right for local fs/HDFS (this target); an
        # object store would use a cloud committer instead.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
